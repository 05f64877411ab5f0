from emx.analysis.filters import (
    gaussian_filter,
    median_filter,
    bilateral_filter,
    wiener_filter,
    wavelet_denoise,
    chambolle_tv,
    compare_denoisers,
)
from emx.analysis.stats import shannon_entropy, gram_matrix, gram_histogram

__all__ = [
    "gaussian_filter",
    "median_filter",
    "bilateral_filter",
    "wiener_filter",
    "wavelet_denoise",
    "chambolle_tv",
    "compare_denoisers",
    "shannon_entropy",
    "gram_matrix",
    "gram_histogram",
]
