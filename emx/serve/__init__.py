from emx.serve.tiling import TiledApplier, tiled_apply
from emx.serve.export import save_artifact, load_artifact, Artifact

__all__ = [
    "TiledApplier",
    "tiled_apply",
    "save_artifact",
    "load_artifact",
    "Artifact",
]
