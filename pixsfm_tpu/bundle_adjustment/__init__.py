from .main import (  # noqa: F401
    BundleAdjuster, CostMapBundleAdjuster, FeatureReferenceBundleAdjuster,
    GeometricBundleAdjuster, PatchWarpBundleAdjuster,
)
from .problem import (  # noqa: F401
    BundleAdjustmentSetup, default_problem_setup, find_problem_labels,
    pack_ba_problem,
)
from .references import Reference, extract_references  # noqa: F401
