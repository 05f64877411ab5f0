from emx.serve.tiling import TiledApplier, tiled_apply
from emx.serve.export import save_artifact, load_artifact, Artifact
from emx.serve.select import auto_denoise, j_invariant_score

__all__ = [
    "TiledApplier",
    "tiled_apply",
    "save_artifact",
    "load_artifact",
    "Artifact",
    "auto_denoise",
    "j_invariant_score",
]
