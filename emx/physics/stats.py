"""Micrograph statistics suite as one jit/vmap-able function.

TPU-native rebuild of the reference's MATLAB census tooling:
  * `estimate_noise` — Laplacian-convolution noise sigma
    (reference DM3stoTIFs-batch/estimate_noise.m:1-12),
  * `radial_fft_profile` — radially-binned FFT magnitude profile
    (reference DM3stoTIFs-batch/img_params.m:53-70),
  * `image_stats` — the ~37-statistic "compendium" record per image
    (reference DM3stoTIFs-batch/img_params.m:1-119).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def estimate_noise(img: jax.Array) -> jax.Array:
    """Noise sigma via sum(|img * Laplacian-of-Laplacian|), scaled.

    Uses 'valid' convolution interior scaling to match the MATLAB
    conv2 normalisation on large images.
    """
    img = img.astype(jnp.float32)
    h, w = img.shape[-2], img.shape[-1]
    kernel = jnp.array(
        [[1.0, -2.0, 1.0], [-2.0, 4.0, -2.0], [1.0, -2.0, 1.0]], jnp.float32
    )
    x = img[None, None] if img.ndim == 2 else img[:, None]
    # 'full' convolution, as MATLAB conv2 default.
    out = jax.lax.conv_general_dilated(
        x, kernel[None, None], (1, 1), padding=((2, 2), (2, 2))
    )
    sigma = jnp.sum(jnp.abs(out), axis=(-3, -2, -1))
    sigma = sigma * math.sqrt(0.5 * math.pi) / (6.0 * (w - 2) * (h - 2))
    return sigma[0] if img.ndim == 2 else sigma


def _moments(x: jax.Array):
    """mean, std (ddof=0), skewness, kurtosis (non-excess) of flattened x."""
    x = x.reshape(-1)
    mean = jnp.mean(x)
    c = x - mean
    var = jnp.mean(c**2)
    std = jnp.sqrt(var)
    safe = jnp.maximum(std, 1e-20)
    skew = jnp.mean(c**3) / safe**3
    kurt = jnp.mean(c**4) / jnp.maximum(var, 1e-30) ** 2
    return mean, std, skew, kurt


def radial_fft_profile(img: jax.Array, num_bins: int | None = None):
    """Radially-binned |fftshift(fft2(img))| profile, normalised to sum 1
    then weighted by bin frequency (img_params.m:53-70). Returns
    (profile, freqs). Bin = ceil(radius), fully vectorised with a
    segment-sum instead of the reference's double pixel loop.
    """
    n = img.shape[-1]
    mid = n // 2
    max_radius = int(math.ceil(math.sqrt(2) * (mid + 1)))
    num_bins = num_bins or max_radius
    mag = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(img)))
    yy = jnp.arange(n, dtype=jnp.float32) - mid
    r = jnp.sqrt(yy[:, None] ** 2 + yy[None, :] ** 2)
    idx = jnp.ceil(r).astype(jnp.int32).reshape(-1)
    profile = jax.ops.segment_sum(mag.reshape(-1), idx, num_segments=num_bins)
    freqs = jax.ops.segment_max(
        (r / max_radius).reshape(-1), idx, num_segments=num_bins
    )
    # Bins beyond the corner radius are empty: segment_max yields -inf
    # there; zero them so downstream moments stay finite.
    freqs = jnp.where(jnp.isfinite(freqs), freqs, 0.0)
    profile = profile / jnp.sum(profile)
    return profile * freqs, freqs


STAT_NAMES = (
    # Raw-image stats (img_params.m:7-21 — computed BEFORE the resize):
    "smallest_dim", "height", "width", "num_px",
    "min", "max", "num_nonzero", "proportion_zero", "num_negative",
    "proportion_negative",
    # Resized (2048) stats (img_params.m:34-51):
    "noise", "mean", "stddev", "skewness", "kurtosis",
    "min_resized", "max_resized",
    "median", "coeff_variation", "rms",
    "mean_freq", "stddev_freq", "skewness_freq", "kurtosis_freq",
    "mean_noise_gauss", "stddev_noise_gauss", "skewness_noise_gauss",
    "kurtosis_noise_gauss", "ratio_mean_noise_to_mean",
    "noise_0to1", "mean_0to1", "stddev_0to1", "median_0to1",
    "coeff_variation_0to1", "rms_0to1",
    "mean_noise_gauss_0to1", "stddev_noise_gauss_0to1",
    "skewness_noise_gauss_0to1", "kurtosis_noise_gauss_0to1",
    "ratio_mean_noise_to_mean_0to1",
)


def image_stats(
    img: jax.Array, raw: jax.Array | None = None
) -> dict[str, jax.Array]:
    """Compute the reference's full per-image statistics compendium
    (all 40 img_params.m fields) on a square, already-resized image (the
    resize-to-2048 step lives in emx.data.crops).

    `raw` is the pre-resize image the dimension/extrema/zero-count stats
    are computed from (img_params.m:7-21 runs them before the resize);
    when omitted, `img` stands in for both (raw == resized).

    Fully jit-able; vmap over a batch for the census workload
    (DM3stoTIFs-batch/harvester.m / reaper.m). Note: passing `raw`
    retraces per distinct raw shape — for heterogeneous corpora compute
    the five raw stats on host (emx.data.harvest.raw_stats) instead.
    """
    img = img.astype(jnp.float32)
    ref = img if raw is None else raw.astype(jnp.float32)
    n_px = ref.size
    out: dict[str, jax.Array] = {}
    out["smallest_dim"] = jnp.float32(min(ref.shape[-2:]))
    out["height"] = jnp.float32(ref.shape[-2])
    out["width"] = jnp.float32(ref.shape[-1])
    out["num_px"] = jnp.float32(n_px)
    out["min"] = jnp.min(ref)
    out["max"] = jnp.max(ref)
    out["num_nonzero"] = jnp.sum(ref != 0).astype(jnp.float32)
    out["proportion_zero"] = out["num_nonzero"] / n_px
    out["num_negative"] = jnp.sum(ref < 0).astype(jnp.float32)
    out["proportion_negative"] = out["num_negative"] / n_px

    out["noise"] = estimate_noise(img)
    mean, std, skew, kurt = _moments(img)
    out["mean"], out["stddev"], out["skewness"], out["kurtosis"] = mean, std, skew, kurt
    out["min_resized"] = jnp.min(img)
    out["max_resized"] = jnp.max(img)
    out["median"] = jnp.median(img)
    out["coeff_variation"] = 100.0 * std / mean
    out["rms"] = jnp.sqrt(jnp.mean(img**2))

    profile, _ = radial_fft_profile(img)
    fmean, fstd, fskew, fkurt = _moments(profile)
    out["mean_freq"] = jnp.sum(profile)
    out["stddev_freq"], out["skewness_freq"], out["kurtosis_freq"] = fstd, fskew, fkurt

    # sqrt-image "noise from Gauss" moments (Poisson -> approx Gaussian).
    sq = jnp.sqrt(jnp.maximum(img, 0.0))
    gmean, gstd, gskew, gkurt = _moments(sq)
    out["mean_noise_gauss"] = gmean
    out["stddev_noise_gauss"] = gstd
    out["skewness_noise_gauss"] = gskew
    out["kurtosis_noise_gauss"] = gkurt
    out["ratio_mean_noise_to_mean"] = gmean / mean

    # Repeat for the 0-1 rescaled copy (rescale uses the RESIZED
    # extrema — img_params.m:80).
    span = jnp.maximum(out["max_resized"] - out["min_resized"], 1e-20)
    img01 = (img - out["min_resized"]) / span
    out["noise_0to1"] = estimate_noise(img01)
    m1, s1, _, _ = _moments(img01)
    out["mean_0to1"], out["stddev_0to1"] = m1, s1
    out["median_0to1"] = jnp.median(img01)
    out["coeff_variation_0to1"] = 100.0 * s1 / m1
    out["rms_0to1"] = jnp.sqrt(jnp.mean(img01**2))
    sq1 = jnp.sqrt(jnp.maximum(img01, 0.0))
    g1mean, g1std, g1skew, g1kurt = _moments(sq1)
    out["mean_noise_gauss_0to1"] = g1mean
    out["stddev_noise_gauss_0to1"] = g1std
    out["skewness_noise_gauss_0to1"] = g1skew
    out["kurtosis_noise_gauss_0to1"] = g1kurt
    out["ratio_mean_noise_to_mean_0to1"] = g1mean / m1
    return out
