from .featuremaps import (  # noqa: F401
    FeatureManager, FeatureMap, FeaturePatch, FeatureSet, FeatureView,
    PackedFeatures, kDensePatchId,
)
