"""The committed real-data accuracy artifact (EVAL_sacre_coeur.json, produced
by tools/sacre_coeur_gate.py on the bundled 10-image sacre_coeur scene at
native resolution) must stay inside its envelopes. Re-running the full gate
takes ~45 min on CPU, so the suite checks the committed JSON; regenerate with
`python tools/sacre_coeur_gate.py` after pipeline changes that move accuracy.
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_committed_eval_within_envelopes():
    sys.path.insert(0, str(ROOT / "tools"))
    from sacre_coeur_gate import check_envelopes

    result = json.loads((ROOT / "EVAL_sacre_coeur.json").read_text())
    bad = check_envelopes(result)
    assert not bad, bad
