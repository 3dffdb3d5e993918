from .main import (  # noqa: F401
    QueryBundleAdjuster, QueryKeypointAdjuster, QueryLocalizer,
    compute_reprojection_errors, find_nearest_references,
    find_unique_inliers, find_unique_min_reproj_inliers,
)
from .pnp import absolute_pose_estimation, pose_refinement  # noqa: F401
