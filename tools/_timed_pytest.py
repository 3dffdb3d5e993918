"""Run pytest in a child process and record its peak RSS (MB) to a file.

Used by tools/run_suite.sh: this image has no /usr/bin/time, so peak memory
comes from resource.getrusage(RUSAGE_CHILDREN) after the child exits
(ru_maxrss is KB on Linux). Usage:

    python tools/_timed_pytest.py <rss_out_file> <pytest args...>
"""
import resource
import subprocess
import sys

rss_file, args = sys.argv[1], sys.argv[2:]
rc = subprocess.call([sys.executable, "-m", "pytest", *args])
peak_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
with open(rss_file, "w") as f:
    f.write(str(peak_kb // 1024))
sys.exit(rc)
