from emx.recon.ewrec import (
    EWRECConfig,
    reconstruct,
    reconstruction_loss,
    weak_phase_residual,
    weak_phase_reconstruct,
    defocus_search,
    ewrec,
)
from emx.recon.align import phase_correlation, align_stack, register_affine, align_stack_affine, affine_warp
from emx.recon.fit import AberrationFitConfig, fit_exit_wave

__all__ = [
    "EWRECConfig",
    "reconstruct",
    "reconstruction_loss",
    "weak_phase_residual",
    "weak_phase_reconstruct",
    "defocus_search",
    "ewrec",
    "phase_correlation",
    "align_stack",
    "register_affine",
    "align_stack_affine",
    "affine_warp",
    "AberrationFitConfig",
    "fit_exit_wave",
]
