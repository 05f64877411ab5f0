from emx.physics.ctf import (
    energy_to_wavelength,
    spatial_frequencies,
    defocus_ctf,
    aberration_chi,
    full_ctf,
    temporal_envelope,
    spatial_envelope,
    aperture_envelope,
    Aberrations,
)
from emx.physics.propagate import (
    propagate_wave,
    propagate_to_focus,
    propagate_back_to_defocus,
)
from emx.physics.stats import estimate_noise, radial_fft_profile, image_stats, STAT_NAMES

__all__ = [
    "energy_to_wavelength",
    "spatial_frequencies",
    "defocus_ctf",
    "aberration_chi",
    "full_ctf",
    "temporal_envelope",
    "spatial_envelope",
    "aperture_envelope",
    "Aberrations",
    "propagate_wave",
    "propagate_to_focus",
    "propagate_back_to_defocus",
    "estimate_noise",
    "radial_fft_profile",
    "image_stats",
    "STAT_NAMES",
]
