from emx.data.degrade import (
    sample_dose_scale,
    poisson_dose,
    denoiser_example,
    bernoulli_mask,
    fixed_scan_mask,
    apply_partial_scan,
    infilling_example,
    occlude,
    gaussian_blur,
    box_downsample,
    norm_neg1to1,
)
from emx.data.crops import center_square_crop, box_resize, tile_grid, random_crop
from emx.data.pipeline import DataPipeline, PipelineConfig

__all__ = [
    "sample_dose_scale",
    "poisson_dose",
    "denoiser_example",
    "bernoulli_mask",
    "fixed_scan_mask",
    "apply_partial_scan",
    "infilling_example",
    "occlude",
    "gaussian_blur",
    "box_downsample",
    "norm_neg1to1",
    "center_square_crop",
    "box_resize",
    "tile_grid",
    "random_crop",
    "DataPipeline",
    "PipelineConfig",
]
