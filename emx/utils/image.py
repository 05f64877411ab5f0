"""Small shared image utilities (pure JAX, jit-safe)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale0to1(img: jax.Array, axis=None) -> jax.Array:
    """Rescale to [0, 1]; constant images map to 0.5.

    Matches the semantics of the reference's per-example `scale0to1`
    (misc_py/denoiser-multi-gpu.py:816-828) but vectorised: pass
    axis=(-2,-1) (keeping batch dims) to normalise each image in a batch.
    """
    lo = jnp.min(img, axis=axis, keepdims=True)
    hi = jnp.max(img, axis=axis, keepdims=True)
    span = hi - lo
    safe = jnp.where(span > 0, span, 1.0)
    out = (img - lo) / safe
    return jnp.where(span > 0, out, jnp.full_like(img, 0.5))


def psnr(pred: jax.Array, truth: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - truth) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def flip_rotate(img: jax.Array, choice: jax.Array) -> jax.Array:
    """Apply one of the 8 D4-group transforms, selected by `choice` in [0,8).

    jit-safe equivalent of the reference's random flip/rotation augmentation
    (misc_py/denoiser-multi-gpu.py:831-851). Requires a square image.
    """
    branches = [
        lambda x: x,
        lambda x: jnp.rot90(x, 1),
        lambda x: jnp.rot90(x, 2),
        lambda x: jnp.rot90(x, 3),
        lambda x: jnp.flip(x, 0),
        lambda x: jnp.flip(x, 1),
        lambda x: jnp.flip(jnp.rot90(x, 1), 0),
        lambda x: jnp.flip(jnp.rot90(x, 1), 1),
    ]
    return jax.lax.switch(choice, branches, img)


def sanitize(img: jax.Array, fill: float = 0.5) -> jax.Array:
    """Replace NaN/Inf with `fill` (reference `preprocess`,
    denoiser-multi-gpu.py:853-858)."""
    return jnp.where(jnp.isfinite(img), img, jnp.full_like(img, fill))
