from emx.train.losses import huberised_mse, ssim, ms_ssim
from emx.train.engine import TrainConfig, Trainer, TrainState

__all__ = [
    "huberised_mse",
    "ssim",
    "ms_ssim",
    "TrainConfig",
    "Trainer",
    "TrainState",
]
