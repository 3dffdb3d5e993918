from .featuremaps import (  # noqa: F401
    DeviceFeatureMap, FeatureManager, FeatureMap, FeaturePatch, FeatureSet,
    FeatureView, PackedFeatures, kDensePatchId,
)
