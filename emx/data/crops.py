"""Cropping / resizing / tiling primitives.

Rebuilds the reference's harvest geometry: crop-to-square + box resize to
2048 (DM3stoTIFs-batch/img_params.m:26-31), non-overlapping 512 tiling
(machine_learning/crop_arm_scans.py:1-62), 96x96 small-scan downsampling
(small_scans/create_96x96_stem_crops.py:1-25), and random training crops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def center_square_crop(img: jax.Array) -> jax.Array:
    """Crop the larger dimension so the image is square (top-left anchored,
    as the reference's imcrop([1 1 s-1 s-1]) is)."""
    h, w = img.shape[-2], img.shape[-1]
    s = min(h, w)
    return img[..., :s, :s]


def box_resize(img: jax.Array, size: int) -> jax.Array:
    """Resize a square image to (size, size) with area-average (box)
    semantics: exact reshape-mean when the ratio is integer, otherwise
    antialiased linear resize (the closest XLA-native equivalent)."""
    s = img.shape[-1]
    if s == size:
        return img
    if s > size and s % size == 0:
        f = s // size
        *lead, h, w = img.shape
        return img.reshape(*lead, size, f, size, f).mean(axis=(-3, -1))
    return jax.image.resize(
        img, (*img.shape[:-2], size, size), method="linear", antialias=s > size
    )


def harvest_preprocess(img: jax.Array, size: int = 2048) -> jax.Array:
    """Square-crop + box-resize: the canonical reaper transform
    (img_params.m:26-31) producing census-ready images."""
    return box_resize(center_square_crop(img.astype(jnp.float32)), size)


def tile_grid(img: jax.Array, tile: int = 512) -> jax.Array:
    """Non-overlapping tiles: (ny*nx, tile, tile). Trailing remainder
    pixels are dropped (crop_arm_scans.py tiling semantics)."""
    h, w = img.shape[-2], img.shape[-1]
    ny, nx = h // tile, w // tile
    img = img[..., : ny * tile, : nx * tile]
    t = img.reshape(*img.shape[:-2], ny, tile, nx, tile)
    t = jnp.moveaxis(t, -2, -3)
    return t.reshape(*img.shape[:-2], ny * nx, tile, tile)


def untile_grid(tiles: jax.Array, ny: int, nx: int) -> jax.Array:
    tile = tiles.shape[-1]
    t = tiles.reshape(*tiles.shape[:-3], ny, nx, tile, tile)
    t = jnp.moveaxis(t, -2, -3)
    return t.reshape(*tiles.shape[:-3], ny * tile, nx * tile)


def random_crop(key: jax.Array, img: jax.Array, size: int) -> jax.Array:
    """Random square crop with traced offsets (static output shape)."""
    h, w = img.shape[-2], img.shape[-1]
    ky, kx = jax.random.split(key)
    y = jax.random.randint(ky, (), 0, h - size + 1)
    x = jax.random.randint(kx, (), 0, w - size + 1)
    start = [0] * (img.ndim - 2) + [y, x]
    return jax.lax.dynamic_slice(img, start, [*img.shape[:-2], size, size])
