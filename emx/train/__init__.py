from emx.train.losses import huberised_mse, ssim, ms_ssim
from emx.train.engine import TrainConfig, Trainer, TrainState
from emx.train.dose_probe import DoseProbe

__all__ = [
    "huberised_mse",
    "ssim",
    "ms_ssim",
    "TrainConfig",
    "Trainer",
    "TrainState",
    "DoseProbe",
]
