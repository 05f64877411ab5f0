from emx.utils.config import Config, config_field, load_overrides, watch_file
from emx.utils.metrics import MetricsLogger, ThroughputMeter
from emx.utils.image import scale0to1, psnr

__all__ = [
    "Config",
    "config_field",
    "load_overrides",
    "watch_file",
    "MetricsLogger",
    "ThroughputMeter",
    "scale0to1",
    "psnr",
]
