"""ETH3D evaluation configuration (reference: pixsfm/eval/eth3d/config.py).

Scene/method matrices and thresholds match the reference so result tables are
comparable with the README numbers (BASELINE.md)."""

SCENES_INDOOR = ["delivery_area", "kicker", "office", "pipes", "relief",
                 "relief_2", "terrains"]
SCENES_OUTDOOR = ["courtyard", "electro", "facade", "meadow", "playground",
                  "terrace"]
SCENES = SCENES_INDOOR + SCENES_OUTDOOR

# keypoint detectors/matchers; in this environment OpenCV SIFT is built in,
# hloc detectors (superpoint/r2d2) require their checkpoints to be present.
METHODS = ["sift", "superpoint", "r2d2"]

# triangulation tolerances in meters (reference triangulation.py:181-182)
TRIANGULATION_TOLERANCES = [0.01, 0.02, 0.05]

# localization AUC thresholds in meters (reference README.md:383)
LOCALIZATION_THRESHOLDS = [0.001, 0.01, 0.1]

# leave-N-out localization protocol (reference config.py:142-299)
NUM_HOLDOUT_IMAGES = 10

DOWNLOAD_URL = "https://www.eth3d.net/data/"  # zero-egress: must be pre-fetched
