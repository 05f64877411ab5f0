"""Float32 TIFF and .npy stack IO.

The reference exchanges all intermediate data as float32 TIFFs
(DM3stoTIFs-batch/reaper.m:85-92, misc_py scripts passim) and packs
small datasets as (N, 96, 96, 1) .npy stacks
(small_scans/convert_to_numpy.py). PIL mode 'F' handles float32 TIFF.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def read_tiff(path: str, fallback_shape: tuple[int, int] | None = None) -> np.ndarray:
    """Read an image (any PIL-supported format) as float32.

    With `fallback_shape`, a failed read returns a neutral 0.5 image
    instead of raising — the reference trainers' guard behavior
    (misc_py/denoiser-multi-gpu.py:805-809).
    """
    try:
        with Image.open(path) as im:
            arr = np.asarray(im, dtype=np.float32)
        if arr.ndim == 3:  # collapse RGB(A) to grey
            arr = arr[..., :3].mean(axis=-1)
        return arr
    except Exception:
        if fallback_shape is not None:
            return np.full(fallback_shape, 0.5, dtype=np.float32)
        raise


def write_tiff(path: str, img: np.ndarray) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(np.asarray(img, dtype=np.float32), mode="F").save(path)


def write_npy_stack(path: str, imgs: list[np.ndarray]) -> None:
    """Pack images to an (N, H, W, 1) float32 stack
    (small_scans/convert_to_numpy.py:1-21 semantics)."""
    stack = np.stack([np.asarray(i, np.float32) for i in imgs])[..., None]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path, stack)


def read_npy_stack(path: str) -> np.ndarray:
    return np.load(path).astype(np.float32)
