"""Overlapped-tile inference on arbitrarily large micrographs.

The reference's `Denoiser.denoise` (machine_learning/denoiser.py:653-682)
runs one sess.run per 512-pixel window with 80 px overlap and averages
overlapping contributions on the host. Here the whole pass is ONE jitted
XLA program per image geometry: windows are gathered with dynamic slices
inside a scan, the model runs on the full window batch (MXU-efficient),
and contributions scatter-add into the canvas on-device.

This is also the single-chip fallback of the "long context" analog: for
multi-chip spatial parallelism over one huge image see emx.parallel.halo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _origins(extent: int, tile: int, stride: int) -> np.ndarray:
    """Window origins covering [0, extent) with the final window clamped
    flush to the edge (reference denoise():659-668 semantics)."""
    if extent <= tile:
        return np.asarray([0])
    xs = list(range(0, extent - tile + 1, stride))
    if xs[-1] != extent - tile:
        xs.append(extent - tile)
    return np.asarray(xs)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _tiled_apply(apply_fn, img: jax.Array, tile: int, overlap: int,
                 batch: int) -> jax.Array:
    h, w = img.shape
    stride = tile - overlap
    ys = _origins(h, tile, stride)
    xs = _origins(w, tile, stride)
    coords = jnp.asarray([(y, x) for y in ys for x in xs], jnp.int32)
    n = coords.shape[0]
    pad = (-n) % batch
    coords = jnp.pad(coords, ((0, pad), (0, 0)))  # duplicates of window 0
    weights = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)])
    coords = coords.reshape(-1, batch, 2)
    weights = weights.reshape(-1, batch)

    def gather(c):
        return jax.vmap(
            lambda yx: jax.lax.dynamic_slice(img, (yx[0], yx[1]), (tile, tile))
        )(c)

    def body(carry, inp):
        canvas, counts = carry
        c, wgt = inp
        out = apply_fn(gather(c))  # (batch, tile, tile)
        out = out * wgt[:, None, None]

        def scatter(carry2, j):
            cv, ct = carry2
            y, x = c[j, 0], c[j, 1]
            patch = jax.lax.dynamic_slice(cv, (y, x), (tile, tile))
            cv = jax.lax.dynamic_update_slice(cv, patch + out[j], (y, x))
            cpatch = jax.lax.dynamic_slice(ct, (y, x), (tile, tile))
            ct = jax.lax.dynamic_update_slice(
                ct, cpatch + wgt[j] * jnp.ones((tile, tile)), (y, x)
            )
            return (cv, ct), None

        (canvas, counts), _ = jax.lax.scan(
            scatter, (canvas, counts), jnp.arange(batch)
        )
        return (canvas, counts), None

    canvas = jnp.zeros((h, w), jnp.float32)
    counts = jnp.zeros((h, w), jnp.float32)
    (canvas, counts), _ = jax.lax.scan(body, (canvas, counts), (coords, weights))
    return canvas / jnp.maximum(counts, 1.0)


def tiled_apply(apply_fn, img, tile: int = 512, overlap: int = 80,
                batch: int = 4) -> jax.Array:
    """Apply `apply_fn((B, tile, tile)) -> (B, tile, tile)` over an
    arbitrary-size image with overlap averaging."""
    img = jnp.asarray(img, jnp.float32)
    if img.shape[-1] < tile or img.shape[-2] < tile:
        # Pad small images up to one tile, crop back after. Reflect
        # padding caps each step at dim-1, so images much smaller than
        # the tile (e.g. a 64^2 crop served by a 512-tile model) are
        # grown by repeated reflection.
        h, w = img.shape[-2], img.shape[-1]
        padded = img
        while padded.shape[-2] < tile or padded.shape[-1] < tile:
            ph = min(max(0, tile - padded.shape[-2]),
                     padded.shape[-2] - 1)
            pw = min(max(0, tile - padded.shape[-1]),
                     padded.shape[-1] - 1)
            if ph == 0 and pw == 0:
                # Degenerate 1-pixel extent: reflect cannot grow it.
                padded = jnp.pad(
                    padded, ((0, tile - padded.shape[-2]),
                             (0, tile - padded.shape[-1])), mode="edge")
                break
            padded = jnp.pad(padded, ((0, ph), (0, pw)), mode="reflect")
        out = _tiled_apply(apply_fn, padded, tile, overlap, batch)
        return out[:h, :w]
    return _tiled_apply(apply_fn, img, tile, overlap, batch)


class TiledApplier:
    """Reusable tiled applier bound to a model + params (the `Denoiser`
    class shape of the reference, machine_learning/denoiser.py:584-682)."""

    def __init__(self, model, variables, tile: int = 512, overlap: int = 80,
                 batch: int = 4, preprocess: bool = True):
        self.model = model
        self.variables = variables
        self.tile, self.overlap, self.batch = tile, overlap, batch
        self.preprocess = preprocess

        def apply_fn(crops):
            return model.apply(variables, crops, train=False)

        self._apply_fn = apply_fn

    def _pre(self, img):
        """Whole-image sanitize + rescale to [0,1] (reference
        Denoiser.preprocess:632-642, applied once per image)."""
        from emx.utils.image import sanitize, scale0to1

        return scale0to1(sanitize(jnp.asarray(img, jnp.float32)))

    def apply_crop(self, crop, preprocess: bool | None = None):
        """Single-window inference (reference denoise_crop:645-651)."""
        crop = jnp.asarray(crop)
        if preprocess if preprocess is not None else self.preprocess:
            crop = self._pre(crop)
        out = self._apply_fn(crop[None])
        return out[0]

    def __call__(self, img, preprocess: bool | None = None):
        img = jnp.asarray(img, jnp.float32)
        if preprocess if preprocess is not None else self.preprocess:
            img = self._pre(img)
        return tiled_apply(self._apply_fn, img, self.tile, self.overlap,
                           self.batch)
