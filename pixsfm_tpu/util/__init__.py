from .misc import (  # noqa: F401
    check_memory, free_memory, resolve_level_indices, to_colmap_coordinates,
    to_hloc_coordinates, total_memory,
)
from .profiling import SolverSummary, Timer, merge_summaries, trace  # noqa: F401
