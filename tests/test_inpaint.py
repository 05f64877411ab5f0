"""Classical infilling baselines: each fill must reconstruct a smooth
image far better than the -1-filled identity, and masked_psnr must only
score unscanned pixels."""

import jax
import jax.numpy as jnp
import numpy as np

from emx.analysis.inpaint import (
    compare_infills,
    harmonic_fill,
    masked_psnr,
    nearest_fill,
    normconv_fill,
)
from emx.data.degrade import apply_partial_scan, fixed_scan_mask


def _smooth_batch(n=2, size=64):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.stack([
        np.sin(2 * np.pi * (i + 1) * xx) * np.cos(2 * np.pi * yy)
        for i in range(n)
    ])
    return jnp.asarray(imgs)


def test_fills_beat_identity_on_smooth_images():
    size = 64
    clean = _smooth_batch(2, size)
    mask = fixed_scan_mask((size, size), coverage=1 / 16)
    masked = jax.vmap(lambda x: apply_partial_scan(x, mask))(clean)
    ident = float(jnp.mean(jax.vmap(
        lambda p, t: masked_psnr(p, t, mask, 2.0))(masked, clean)))
    for fn in (lambda x: normconv_fill(x, mask, 2.0),
               lambda x: nearest_fill(x, mask),
               lambda x: harmonic_fill(x, mask, iters=100)):
        pred = jax.vmap(fn)(masked)
        got = float(jnp.mean(jax.vmap(
            lambda p, t: masked_psnr(p, t, mask, 2.0))(pred, clean)))
        assert got > ident + 10.0
        # Scanned pixels must be passed through untouched.
        m = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(pred)[:, m],
                                   np.asarray(clean)[:, m], atol=1e-5)


def test_masked_psnr_ignores_scanned_pixels():
    size = 32
    clean = _smooth_batch(1, size)[0]
    mask = fixed_scan_mask((size, size), coverage=0.25)
    # Corrupt ONLY scanned pixels: masked score must stay infinite-ish.
    corrupted = jnp.where(mask, clean + 1.0, clean)
    assert float(masked_psnr(corrupted, clean, mask, 2.0)) > 100.0
    # Corrupt only unscanned pixels: score must drop.
    corrupted2 = jnp.where(mask, clean, clean + 1.0)
    assert float(masked_psnr(corrupted2, clean, mask, 2.0)) < 10.0


def test_compare_infills_ranks_harmonic_on_smooth():
    size = 64
    clean = _smooth_batch(2, size)
    mask = fixed_scan_mask((size, size), coverage=1 / 16)
    masked = jax.vmap(lambda x: apply_partial_scan(x, mask))(clean)
    res = compare_infills(masked, clean, mask, max_val=2.0)
    assert set(res) >= {"normconv_s4", "nearest", "harmonic"}
    for v in res.values():
        assert np.isfinite(v["psnr_masked"])
