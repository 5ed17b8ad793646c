from . import metric_main  # noqa: F401
from .metric_utils import (  # noqa: F401
    FeatureStats,
    MetricOptions,
    register_detector,
)
