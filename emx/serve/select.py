"""Serving-time denoiser selection without ground truth (J-invariant).

The flagship decision gate measures per-family margins over the best
classical filter with CLEAN references — available offline, never at
the microscope. This module ranks denoisers on nothing but the noisy
frame itself, via the Noise2Self J-invariant risk (Batson & Royer,
ICML 2019): mask a random pixel subset, replace each masked pixel with
a local average of its UNMASKED neighbours, denoise the masked frame,
and score the prediction against the original noisy values on the
masked set only. Because the per-pixel noise is independent (Poisson
shot noise — the reference's acquisition model,
misc_py/denoiser-multi-gpu.py:816-828), the noisy pixel is an unbiased
target for any function that never saw it, so the masked-set MSE ranks
denoisers by true MSE up to a constant (the noise variance) — an
unbiased model-vs-classical selector at serve time.

`auto_denoise` runs every candidate once on the masked frame (scores)
plus the winner's normal pass, picking per image. The selector is the
structural answer to out-of-family inputs: a family where the NN loses
to a gaussian filter gets the gaussian, per image, with no clean data
and no family oracle.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _masked_replace(noisy: jax.Array, mask: jax.Array) -> jax.Array:
    """Replace masked pixels with the mean of their unmasked 3x3
    neighbours (J-invariant input: the masked pixel's own value never
    reaches the denoiser)."""
    keep = (~mask).astype(noisy.dtype)
    kept = noisy * keep
    k = jnp.ones((3, 3), noisy.dtype)
    # Exclude the center: a masked pixel must not see itself, and an
    # unmasked neighbour mean is what the theory wants.
    k = k.at[1, 1].set(0.0)

    def conv(img):
        return jax.scipy.signal.convolve2d(img, k, mode="same")

    num = conv(kept)
    den = jnp.maximum(conv(keep), 1.0)
    fill = num / den
    return jnp.where(mask, fill, noisy)


def j_invariant_score(
    denoise_fn: Callable[[jax.Array], jax.Array],
    noisy: jax.Array,
    key: jax.Array,
    n_masks: int = 4,
    frac: float = 0.02,
) -> jax.Array:
    """Mean masked-pixel MSE of `denoise_fn` on a (B, H, W) batch.

    Averages over `n_masks` independent random masks of `frac` of the
    pixels. Returns (B,) scores; lower is better. The ranking is
    unbiased for pixel-independent noise; the absolute value includes
    the irreducible noise variance (identical for every candidate)."""
    def one_mask(k):
        mask = jax.random.bernoulli(k, frac, noisy.shape)
        masked = jax.vmap(_masked_replace)(noisy, mask)
        pred = denoise_fn(masked).astype(jnp.float32)
        m = mask.astype(jnp.float32)
        err = (pred - noisy.astype(jnp.float32)) ** 2 * m
        return (jnp.sum(err, axis=(-2, -1))
                / jnp.maximum(jnp.sum(m, axis=(-2, -1)), 1.0))

    keys = jax.random.split(key, n_masks)
    return jnp.mean(jax.vmap(one_mask)(keys), axis=0)


def auto_denoise(
    noisy: jax.Array,
    candidates: Sequence[Callable[[jax.Array], jax.Array]],
    key: jax.Array,
    n_masks: int = 4,
    frac: float = 0.02,
) -> tuple[jax.Array, jax.Array]:
    """Denoise (B, H, W) with the per-image J-invariant winner among
    `candidates`. Returns (output, chosen) where chosen is the (B,)
    winning candidate index."""
    scores = jnp.stack([
        j_invariant_score(fn, noisy, jax.random.fold_in(key, i),
                          n_masks=n_masks, frac=frac)
        for i, fn in enumerate(candidates)])        # (n_cand, B)
    chosen = jnp.argmin(scores, axis=0)             # (B,)
    outs = jnp.stack([fn(noisy).astype(jnp.float32)
                      for fn in candidates])        # (n_cand, B, H, W)
    out = jnp.take_along_axis(
        outs, chosen[None, :, None, None], axis=0)[0]
    return out.astype(noisy.dtype), chosen
