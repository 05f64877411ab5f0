"""Classical partial-scan infilling baselines + masked-region scoring.

The denoiser has its classical-filter ladder (emx.analysis.filters, the
reference's err_hist_maker.py workload); this is the same anchor for the
infilling GAN (reference gan-infilling-100.py: 1/64-coverage spiral/grid
scans): interpolate the unscanned pixels classically, then score the
masked region only. All baselines are pure JAX (one XLA program each):

  * `normconv_fill`  — Gaussian normalized convolution (the classic
    Knutsson–Westin interpolator): conv(mask*img) / conv(mask).
  * `nearest_fill`   — iterative dilation fill (nearest-ish neighbour).
  * `harmonic_fill`  — Jacobi relaxation of the Laplace equation on the
    unknown region with known pixels clamped (bilinear/biharmonic-lite
    fill; the strongest classical baseline at low coverage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gauss_kernel(sigma: float, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _sep_conv2(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable 2-D convolution with SAME zero padding; img (h, w)."""
    pad = (k.shape[0] - 1) // 2
    x = img[None, None]
    kr = k[None, None, :, None]
    kc = k[None, None, None, :]
    x = jax.lax.conv_general_dilated(x, kr, (1, 1),
                                     padding=((pad, pad), (0, 0)))
    x = jax.lax.conv_general_dilated(x, kc, (1, 1),
                                     padding=((0, 0), (pad, pad)))
    return x[0, 0]


def normconv_fill(img: jax.Array, mask: jax.Array,
                  sigma: float = 4.0) -> jax.Array:
    """Gaussian normalized-convolution interpolation of unscanned pixels.
    `img` has arbitrary values outside `mask`; they are ignored."""
    m = mask.astype(jnp.float32)
    radius = max(3, int(3 * sigma))
    k = _gauss_kernel(sigma, radius)
    num = _sep_conv2(img * m, k)
    den = _sep_conv2(m, k)
    filled = num / jnp.maximum(den, 1e-12)
    return jnp.where(mask, img, filled)


def nearest_fill(img: jax.Array, mask: jax.Array,
                 iters: int = 32) -> jax.Array:
    """Iterative 3x3 dilation fill: each unknown pixel takes the mean of
    already-known neighbours; repeated until the mask floods the image."""
    k = jnp.ones((3,), jnp.float32)

    def body(_, carry):
        val, m = carry
        num = _sep_conv2(val * m, k)
        den = _sep_conv2(m, k)
        new = num / jnp.maximum(den, 1e-12)
        grown = den > 0
        val = jnp.where(m > 0, val, new)
        return val, jnp.maximum(m, grown.astype(jnp.float32))

    m0 = mask.astype(jnp.float32)
    val, _ = jax.lax.fori_loop(0, iters, body, (img * m0, m0))
    return jnp.where(mask, img, val)


def harmonic_fill(img: jax.Array, mask: jax.Array,
                  iters: int = 400) -> jax.Array:
    """Laplace-equation (harmonic) inpainting by Jacobi relaxation with
    known pixels clamped; initialised from the normalized-convolution
    fill so convergence at 1/64 coverage is fast."""
    init = normconv_fill(img, mask, sigma=4.0)
    known = mask

    def body(_, u):
        avg = 0.25 * (jnp.roll(u, 1, 0) + jnp.roll(u, -1, 0)
                      + jnp.roll(u, 1, 1) + jnp.roll(u, -1, 1))
        return jnp.where(known, u, avg)

    return jax.lax.fori_loop(0, iters, body, init)


def masked_psnr(pred: jax.Array, truth: jax.Array, mask: jax.Array,
                max_val: float = 1.0) -> jax.Array:
    """PSNR over the UNSCANNED region only (the infilled pixels — scanned
    pixels are copied through and would inflate the score)."""
    w = 1.0 - mask.astype(jnp.float32)
    mse = jnp.sum(w * (pred - truth) ** 2) / jnp.maximum(jnp.sum(w), 1.0)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def compare_infills(
    masked: jax.Array,
    clean: jax.Array,
    mask: jax.Array,
    nn_fn=None,
    max_val: float = 1.0,
) -> dict[str, dict[str, float]]:
    """Score classical fills (and optionally the NN) on a batch of
    partial scans. `masked`/`clean`: (n, h, w) in the same value range;
    `mask`: (h, w) bool. Returns {name: {"psnr_masked": ...}}."""
    fills = {
        "normconv_s2": lambda x: normconv_fill(x, mask, 2.0),
        "normconv_s4": lambda x: normconv_fill(x, mask, 4.0),
        "normconv_s8": lambda x: normconv_fill(x, mask, 8.0),
        "nearest": lambda x: nearest_fill(x, mask),
        "harmonic": lambda x: harmonic_fill(x, mask),
    }
    out: dict[str, dict[str, float]] = {}
    for name, fn in fills.items():
        pred = jax.jit(jax.vmap(fn))(masked)
        score = jax.vmap(lambda p, t: masked_psnr(p, t, mask, max_val))(
            pred, clean)
        out[name] = {"psnr_masked": float(jnp.mean(score))}
    if nn_fn is not None:
        pred = nn_fn(masked)
        score = jax.vmap(lambda p, t: masked_psnr(p, t, mask, max_val))(
            pred, clean)
        out["nn"] = {"psnr_masked": float(jnp.mean(score))}
    return out
