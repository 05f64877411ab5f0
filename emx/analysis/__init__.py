from emx.analysis.filters import (
    gaussian_filter,
    median_filter,
    bilateral_filter,
    wiener_filter,
    wavelet_denoise,
    chambolle_tv,
    compare_denoisers,
    save_err_hists,
)
from emx.analysis.stats import shannon_entropy, gram_matrix, gram_histogram
from emx.analysis.pearson import pearson_from_moments, classify_family, moment_redistributor
from emx.analysis.optim_demo import rosenbrock, optimize_rosenbrock, compare_optimizers

__all__ = [
    "gaussian_filter",
    "median_filter",
    "bilateral_filter",
    "wiener_filter",
    "wavelet_denoise",
    "chambolle_tv",
    "compare_denoisers",
    "save_err_hists",
    "shannon_entropy",
    "gram_matrix",
    "gram_histogram",
    "pearson_from_moments",
    "classify_family",
    "moment_redistributor",
    "rosenbrock",
    "optimize_rosenbrock",
    "compare_optimizers",
]
