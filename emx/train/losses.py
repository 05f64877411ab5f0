"""Loss functions of the model zoo.

  * huberised_mse — the denoiser's capped loss: 1000*mse below 1e-3,
    sqrt(1000*mse) above (reference misc_py/denoiser-multi-gpu.py:772-773)
  * ssim / ms_ssim — structural similarity as used by the encoder-decoder
    experiments (reference misc_py/encoder-decoder.py:88-143)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huberised_mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    mse = jnp.mean((pred - target) ** 2)
    return jnp.where(mse < 1e-3, 1000.0 * mse, jnp.sqrt(1000.0 * mse))


def _gaussian_window(size: int, sigma: float) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    w = jnp.outer(g, g)
    return w / jnp.sum(w)


def _filter2(img: jax.Array, window: jax.Array) -> jax.Array:
    # img: (N, H, W, C=1); valid conv as the reference tf_ssim does.
    k = window[None, None, :, :]
    x = jnp.moveaxis(img, -1, 1)
    out = jax.lax.conv_general_dilated(x, k, (1, 1), padding="VALID")
    return jnp.moveaxis(out, 1, -1)


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    return_map: bool = False,
):
    """SSIM over (N, H, W, 1) batches, Gaussian 11x11 window, valid padding
    (semantics of reference misc_py/encoder-decoder.py tf_ssim:88-115)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    w = _gaussian_window(window_size, sigma)
    mu1, mu2 = _filter2(img1, w), _filter2(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = _filter2(img1 * img1, w) - mu1_sq
    s2 = _filter2(img2 * img2, w) - mu2_sq
    s12 = _filter2(img1 * img2, w) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return ssim_map if return_map else jnp.mean(ssim_map)


def ms_ssim(
    img1: jax.Array,
    img2: jax.Array,
    max_val: float = 1.0,
    weights: tuple[float, ...] = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
) -> jax.Array:
    """Multi-scale SSIM with the standard 5-level weights
    (reference misc_py/encoder-decoder.py tf_ms_ssim:116-143)."""
    levels = len(weights)
    w = jnp.asarray(weights)
    mssim, mcs = [], []
    a, b = img1, img2
    for lvl in range(levels):
        c1 = (0.01 * max_val) ** 2
        c2 = (0.03 * max_val) ** 2
        win = _gaussian_window(11, 1.5)
        mu1, mu2 = _filter2(a, win), _filter2(b, win)
        s1 = _filter2(a * a, win) - mu1**2
        s2 = _filter2(b * b, win) - mu2**2
        s12 = _filter2(a * b, win) - mu1 * mu2
        cs = jnp.mean((2 * s12 + c2) / (s1 + s2 + c2))
        sm = jnp.mean(
            ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
        )
        mssim.append(sm)
        mcs.append(cs)
        if lvl < levels - 1:
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
            ) / 4.0
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
            ) / 4.0
    mssim_arr = jnp.stack(mssim)
    mcs_arr = jnp.stack(mcs)
    return jnp.prod(
        jnp.clip(mcs_arr[:-1], 1e-6) ** w[:-1]
    ) * jnp.clip(mssim_arr[-1], 1e-6) ** w[-1]
