"""Degradation synthesis — all on-device, jit/vmap-safe.

The reference runs these per-example on host CPU inside tf.py_func
(the loader bottleneck SURVEY.md §7 hard part 5 calls out); here every
degradation is a pure JAX function executed on-chip inside the train
step, keyed by `jax.random` so the pipeline is deterministic and
checkpoint-resumable.

Models reproduced:
  * Poisson low-dose with scale ~ 25 + Exponential(75) counts
    (reference misc_py/denoiser-multi-gpu.py:785-799, misc_py/lq_img_gen.py:6-20)
  * fixed Bernoulli partial-scan masks at 1/64 and 1/100 coverage with
    -1 fill (reference misc_py/gan-infilling-100.py:1173-1182,
    misc_py/stem_infilling-100.py:1326-1334, misc_py/mask_gen.py:1-10)
  * large-occlusion corruption: centered rectangle / side / corner
    (reference misc_py/adversarial_micrograph_gen.py:956-990)
  * Gaussian blur and box downsampling (misc_py/blur_images.py,
    misc_py/downsample.py)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emx.utils.image import flip_rotate, sanitize, scale0to1


def sample_dose_scale(key: jax.Array, base: float = 25.0, mean: float = 75.0):
    """scale = base + Exponential(mean) mean counts per pixel."""
    return base + mean * jax.random.exponential(key)


def poisson_dose(key: jax.Array, img: jax.Array, scale: jax.Array) -> jax.Array:
    """Low-dose image: rescale to [0,1] after Poisson(img * scale) shot noise."""
    counts = jax.random.poisson(key, img * scale).astype(jnp.float32)
    return scale0to1(counts, axis=(-2, -1))


def denoiser_example(key: jax.Array, img: jax.Array):
    """One (noisy, target) training pair with the reference's exact recipe
    (denoiser-multi-gpu.py record_parser:861-876): sanitize -> random D4
    -> scale0to1 -> Poisson at sampled dose; the regression target is the
    clean image rescaled to the noisy image's mean.
    """
    k_aug, k_scale, k_noise = jax.random.split(key, 3)
    img = scale0to1(sanitize(img))
    img = flip_rotate(img, jax.random.randint(k_aug, (), 0, 8))
    scale = sample_dose_scale(k_scale)
    lq = poisson_dose(k_noise, img, scale)
    target = img * (jnp.mean(lq) / jnp.maximum(jnp.mean(img), 1e-12))
    return lq, target


def bernoulli_mask(key: jax.Array, shape: tuple[int, int], coverage: float):
    """Boolean scan mask with `coverage` fraction of pixels selected."""
    return jax.random.uniform(key, shape) < coverage


def fixed_scan_mask(shape: tuple[int, int] = (512, 512), coverage: float = 1 / 64,
                    seed: int = 1):
    """The reference's *fixed* training mask (np.random.seed(1) then
    uniform<frac — gan-infilling-100.py:1173-1175). Reproduced bit-exactly
    with NumPy's legacy RNG so checkpoints/datasets interoperate."""
    import numpy as np

    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.random_sample(shape) < coverage)


def apply_partial_scan(img: jax.Array, mask: jax.Array, fill: float = -1.0):
    """Partial scan: unscanned pixels take `fill` (-1 in the reference,
    distinguishable from data normalised to [-1, 1])."""
    return jnp.where(mask, img, jnp.full_like(img, fill))


def norm_neg1to1(img: jax.Array, axis=(-2, -1)) -> jax.Array:
    """Rescale to [-1, 1]; constant images map to 0
    (reference gan-infilling-100.py norm_img:1147-1160)."""
    lo = jnp.min(img, axis=axis, keepdims=True)
    hi = jnp.max(img, axis=axis, keepdims=True)
    a = 0.5 * (lo + hi)
    b = 0.5 * (hi - lo)
    safe = jnp.where(b > 5e-7, b, 1.0)
    return jnp.where(b > 5e-7, (img - a) / safe, jnp.zeros_like(img))


def infilling_example(key: jax.Array, img: jax.Array, mask: jax.Array):
    """One (partial-scan, full) GAN-infilling pair
    (gan-infilling-100.py record_parser:1184-1192)."""
    k_aug = jax.random.fold_in(key, 0)
    img = norm_neg1to1(sanitize(img, 0.0))
    img = flip_rotate(img, jax.random.randint(k_aug, (), 0, 8))
    return apply_partial_scan(img, mask), img


def occlude(key: jax.Array, img: jax.Array, mark: float = 0.5) -> jax.Array:
    """Random large occlusion: centered rectangle, axis-aligned side block,
    or corner block, each followed by a random D4 transform
    (adversarial_micrograph_gen.py gen_lq:956-990)."""
    n = img.shape[-1]
    k_choice, k_a, k_b, k_flip = jax.random.split(key, 4)
    choice = jax.random.randint(k_choice, (), 0, 3)
    half1 = jax.random.randint(k_a, (), 0, n // 2 + 1) // 2
    half2 = jax.random.randint(k_b, (), 0, n // 2 + 1) // 2
    side = jax.random.randint(k_a, (), 0, n + 1)
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]

    center = (rows >= half1) & (rows < n - half1) & (cols >= half2) & (cols < n - half2)
    side_block = (rows < side) & (cols < side)
    corner = (rows < half1) & (cols < half2)
    mask = jax.lax.switch(
        choice, [lambda: center, lambda: side_block, lambda: corner]
    )
    out = jnp.where(mask, jnp.full_like(img, mark), img)
    return flip_rotate(out, jax.random.randint(k_flip, (), 0, 8))


def gaussian_blur(img: jax.Array, sigma: float, radius: int | None = None):
    """Separable Gaussian blur (SAME padding)."""
    radius = radius or max(1, int(3 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    x4 = img[:, None]  # N,1,H,W
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    pad = ((radius, radius), (0, 0))
    out = jax.lax.conv_general_dilated(x4, kh, (1, 1), padding=pad)
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), padding=(pad[1], pad[0]))
    out = out[:, 0]
    return out[0] if squeeze else out


def box_downsample(img: jax.Array, factor: int) -> jax.Array:
    """Box (area-average) downsampling by an integer factor — MATLAB
    imresize 'box' semantics used throughout the reference harvest
    (img_params.m:31, small_scans/*)."""
    *lead, h, w = img.shape
    assert h % factor == 0 and w % factor == 0, "size must divide factor"
    r = img.reshape(*lead, h // factor, factor, w // factor, factor)
    return r.mean(axis=(-3, -1))
