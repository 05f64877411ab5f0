"""Classical denoising filters + NN-vs-classical comparison harness.

The reference benchmarks its networks against Gaussian, bilateral,
median, Wiener, wavelet and Chambolle-TV filters with scipy/skimage on
host (misc_py/err_hist_maker.py:1-175). Here each filter is pure JAX —
jit/vmap-able, so the whole comparison grid runs on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emx.data.degrade import gaussian_blur


def gaussian_filter(img: jax.Array, sigma: float = 1.0) -> jax.Array:
    return gaussian_blur(img, sigma)


def _neighborhood_stack(img: jax.Array, radius: int) -> jax.Array:
    """(H, W, k*k) stack of shifted copies (edge-clamped)."""
    k = 2 * radius + 1
    pad = jnp.pad(img, radius, mode="edge")
    h, w = img.shape
    views = [
        jax.lax.dynamic_slice(pad, (dy, dx), (h, w))
        for dy in range(k)
        for dx in range(k)
    ]
    return jnp.stack(views, axis=-1)


def median_filter(img: jax.Array, radius: int = 1) -> jax.Array:
    stack = _neighborhood_stack(img, radius)
    return jnp.median(stack, axis=-1)


def bilateral_filter(
    img: jax.Array, radius: int = 2, sigma_space: float = 1.5,
    sigma_value: float = 0.1,
) -> jax.Array:
    k = 2 * radius + 1
    stack = _neighborhood_stack(img, radius)
    dy = jnp.arange(k) - radius
    sp = jnp.exp(-0.5 * (dy[:, None] ** 2 + dy[None, :] ** 2) / sigma_space**2)
    sp = sp.reshape(-1)
    val = jnp.exp(-0.5 * ((stack - img[..., None]) / sigma_value) ** 2)
    w = sp * val
    return jnp.sum(w * stack, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1e-12)


def wiener_filter(img: jax.Array, radius: int = 1,
                  noise_var: float | None = None) -> jax.Array:
    """Local adaptive (Lee) Wiener filter, scipy.signal.wiener semantics."""
    stack = _neighborhood_stack(img, radius)
    mean = jnp.mean(stack, axis=-1)
    var = jnp.mean(stack**2, axis=-1) - mean**2
    nv = jnp.mean(var) if noise_var is None else noise_var
    gain = jnp.maximum(var - nv, 0.0) / jnp.maximum(var, 1e-12)
    return mean + gain * (img - mean)


def _haar2(img: jax.Array):
    a = (img[0::2, 0::2] + img[0::2, 1::2] + img[1::2, 0::2] + img[1::2, 1::2]) / 2
    h = (img[0::2, 0::2] - img[0::2, 1::2] + img[1::2, 0::2] - img[1::2, 1::2]) / 2
    v = (img[0::2, 0::2] + img[0::2, 1::2] - img[1::2, 0::2] - img[1::2, 1::2]) / 2
    d = (img[0::2, 0::2] - img[0::2, 1::2] - img[1::2, 0::2] + img[1::2, 1::2]) / 2
    return a, (h, v, d)


def _ihaar2(a, hvd):
    h, v, d = hvd
    out = jnp.zeros((2 * a.shape[0], 2 * a.shape[1]), a.dtype)
    out = out.at[0::2, 0::2].set((a + h + v + d) / 2)
    out = out.at[0::2, 1::2].set((a - h + v - d) / 2)
    out = out.at[1::2, 0::2].set((a + h - v - d) / 2)
    out = out.at[1::2, 1::2].set((a - h - v + d) / 2)
    return out


def wavelet_denoise(img: jax.Array, threshold: float | None = None,
                    levels: int = 3) -> jax.Array:
    """Haar soft-threshold denoising (VisuShrink threshold by default)."""
    coeffs = []
    a = img
    for _ in range(levels):
        a, hvd = _haar2(a)
        coeffs.append(hvd)
    if threshold is None:
        # sigma from the finest diagonal band (median absolute deviation).
        sigma = jnp.median(jnp.abs(coeffs[0][2])) / 0.6745
        threshold = sigma * jnp.sqrt(2 * jnp.log(img.size))

    def soft(x):
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - threshold, 0.0)

    for hvd in reversed(coeffs):
        a = _ihaar2(a, tuple(soft(c) for c in hvd))
    return a


def chambolle_tv(img: jax.Array, weight: float = 0.1,
                 num_iter: int = 50) -> jax.Array:
    """Chambolle's projection algorithm for TV denoising
    (skimage.restoration.denoise_tv_chambolle semantics), as lax.fori_loop."""
    tau = 0.125  # convergence requires tau <= 1/8 in 2D

    def grad(u):
        gy = jnp.diff(u, axis=0, append=u[-1:])
        gx = jnp.diff(u, axis=1, append=u[:, -1:])
        return gy, gx

    def div(py, px):
        dy = jnp.concatenate([py[:1], py[1:-1] - py[:-2], -py[-2:-1]], axis=0)
        dx = jnp.concatenate([px[:, :1], px[:, 1:-1] - px[:, :-2],
                              -px[:, -2:-1]], axis=1)
        return dy + dx

    def body(_, p):
        py, px = p
        # Chambolle 2004: p <- (p + tau grad(div p - f/lambda)) /
        #                      (1 + tau |grad(div p - f/lambda)|)
        gy, gx = grad(div(py, px) - img / weight)
        norm = jnp.sqrt(gy**2 + gx**2)
        denom = 1.0 + tau * norm
        py = (py + tau * gy) / denom
        px = (px + tau * gx) / denom
        return py, px

    p0 = (jnp.zeros_like(img), jnp.zeros_like(img))
    py, px = jax.lax.fori_loop(0, num_iter, body, p0)
    return img - weight * div(py, px)


DEFAULT_FILTERS = {
    "gaussian": lambda x: gaussian_filter(x, 1.0),
    "median": lambda x: median_filter(x, 1),
    "bilateral": lambda x: bilateral_filter(x),
    "wiener": lambda x: wiener_filter(x, 1),
    "wavelet": lambda x: wavelet_denoise(x),
    "tv_chambolle": lambda x: chambolle_tv(x, 0.1, 30),
}


def compare_denoisers(
    noisy: jax.Array,
    clean: jax.Array,
    nn_fn=None,
    filters: dict | None = None,
    per_image: bool = False,
) -> dict[str, dict]:
    """Per-method MSE/PSNR over a batch — the err_hist_maker workload.
    `noisy`, `clean`: (B, H, W). With `per_image=True` each entry also
    carries `mses`/`psnrs` arrays (the reference's saved loss arrays,
    err_hist_maker.py:1-40 loads exactly these)."""
    from emx.utils.image import psnr

    filters = dict(filters or DEFAULT_FILTERS)
    results: dict[str, dict] = {}

    def evaluate(outs):
        per_mse = jnp.mean((outs - clean) ** 2, axis=(-2, -1))
        per_psnr = jax.vmap(psnr)(outs, clean)
        out = {"mse": float(jnp.mean(per_mse)),
               "psnr": float(jnp.mean(per_psnr))}
        if per_image:
            import numpy as np

            out["mses"] = np.asarray(per_mse)
            out["psnrs"] = np.asarray(per_psnr)
        return out

    for name, fn in filters.items():
        outs = jax.jit(jax.vmap(fn))(noisy)
        results[name] = evaluate(outs)
    if nn_fn is not None:
        results["nn"] = evaluate(nn_fn(noisy))
    results["identity"] = evaluate(noisy)
    return results


def save_err_hists(results: dict, out_dir: str, bins: int = 50) -> dict:
    """Persist per-method loss arrays + histogram tables (the reference
    saves `*-losses.npy` per method and plots histograms from them,
    misc_py/err_hist_maker.py). Requires compare_denoisers(...,
    per_image=True) output. Returns {method: hist_counts}."""
    import os

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    hists = {}
    all_mses = np.concatenate(
        [v["mses"] for v in results.values() if "mses" in v])
    edges = np.histogram_bin_edges(all_mses, bins=bins)
    for name, v in results.items():
        if "mses" not in v:
            continue
        np.save(os.path.join(out_dir, f"{name}-losses.npy"), v["mses"])
        counts, _ = np.histogram(v["mses"], bins=edges)
        hists[name] = counts
    np.savez(os.path.join(out_dir, "err_hist.npz"), edges=edges, **hists)
    return hists
