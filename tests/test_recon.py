"""EWREC / alignment / aberration-fit tests on synthetic focal series with
known ground-truth exit waves (SURVEY.md §4: golden-parity strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.physics.propagate import propagate_back_to_defocus
from emx.recon import (
    EWRECConfig,
    align_stack,
    defocus_search,
    ewrec,
    phase_correlation,
    reconstruct,
    reconstruction_loss,
)
from emx.recon.align import common_crop_slices, fourier_shift


def make_wave(n=64, seed=0):
    """Smooth complex exit wave: amplitude ~1 with bumps, phase object."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32) / n
    amp = 1.0 + 0.1 * np.sin(2 * np.pi * (2 * xx + yy))
    phase = np.zeros((n, n), np.float32)
    for _ in range(4):
        cy, cx = rng.uniform(0.2, 0.8, 2)
        s = rng.uniform(0.05, 0.15)
        phase += rng.uniform(0.2, 0.8) * np.exp(
            -(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2))
        )
    return jnp.asarray(amp * np.exp(1j * phase), jnp.complex64)


def make_focal_series(wave, defocuses, wl=0.025):
    imgs = [
        jnp.abs(propagate_back_to_defocus(wave, df, wl)) ** 2 for df in defocuses
    ]
    return jnp.stack(imgs)


CFG = EWRECConfig(wavelength=0.025, px_dim=1.0, num_iter=30)


def test_reconstruct_recovers_known_wave():
    wave = make_wave()
    defocuses = jnp.asarray([-300.0, -150.0, 0.0, 150.0, 300.0])
    stack = make_focal_series(wave, defocuses)
    amps = jnp.sqrt(stack)
    rec = reconstruct(amps, defocuses, CFG)
    # Compare intensity + phase structure up to global phase.
    corr = jnp.vdot(rec, wave) / (jnp.linalg.norm(rec) * jnp.linalg.norm(wave))
    assert float(jnp.abs(corr)) > 0.98


def test_weak_phase_residual_minimal_at_true_defocus():
    from emx.recon import weak_phase_residual

    wave = make_wave(seed=1)
    true_inc = 120.0
    ramp = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0])
    stack = make_focal_series(wave, true_inc * ramp)
    losses = {
        inc: float(weak_phase_residual(stack, inc * ramp, CFG))
        for inc in (30.0, 120.0, 480.0, 960.0)
    }
    assert losses[120.0] < 0.05
    assert all(losses[120.0] < v for k, v in losses.items() if k != 120.0)


def test_weak_phase_reconstruct_recovers_phase():
    from emx.recon import weak_phase_reconstruct

    wave = make_wave(seed=6)
    ramp = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0])
    stack = make_focal_series(wave, 150.0 * ramp)
    obj = weak_phase_reconstruct(stack, 150.0 * ramp, CFG)
    true_phase = jnp.angle(wave)
    est_phase = jnp.imag(obj)  # linearised: Im(1 - a + i*phi) = phi
    tc = true_phase - jnp.mean(true_phase)
    ec = est_phase - jnp.mean(est_phase)
    corr = jnp.sum(tc * ec) / jnp.sqrt(jnp.sum(tc**2) * jnp.sum(ec**2))
    assert float(corr) > 0.8


def test_defocus_search_finds_increment():
    wave = make_wave(seed=2)
    true_inc = 100.0
    ramp = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0])
    stack = make_focal_series(wave, true_inc * ramp)
    amps = jnp.sqrt(stack)
    cfg = EWRECConfig(wavelength=0.025, num_iter=10)
    best, dfs = defocus_search(amps, cfg, num_candidates=12,
                               min_incr=25.0, max_incr=400.0, refine_rounds=2)
    assert float(best) == pytest.approx(true_inc, rel=0.1)


def test_ewrec_end_to_end_with_given_defocuses():
    wave = make_wave(seed=3)
    defocuses = jnp.asarray([-200.0, 0.0, 200.0])
    stack = make_focal_series(wave, defocuses)
    out = ewrec(stack, CFG, defocuses=defocuses)
    assert out["exit_wave"].shape == wave.shape
    assert float(out["loss"]) < 1e-3


def test_phase_correlation_integer_and_subpixel():
    img = jnp.asarray(
        np.random.default_rng(0).random((64, 64)).astype(np.float32)
    )
    shifted = jnp.roll(img, (5, -3), axis=(0, 1))
    d = phase_correlation(img, shifted)
    # Convention check: shifting back by -d must recover img.
    rec = fourier_shift(shifted, -d)
    err_direct = float(jnp.mean((rec - img) ** 2))
    rec2 = fourier_shift(shifted, d)
    err_flipped = float(jnp.mean((rec2 - img) ** 2))
    assert min(err_direct, err_flipped) < 1e-3
    # Subpixel: shift by 2.5 px via Fourier, expect ~2.5 recovered.
    sub = fourier_shift(img, jnp.asarray([2.5, 0.0]))
    d2 = phase_correlation(img, sub)
    assert abs(abs(float(d2[0])) - 2.5) < 0.2


def test_align_stack_recovers_translations():
    base = jnp.asarray(
        np.random.default_rng(1).random((48, 48)).astype(np.float32)
    )
    shifts = [(-4.0, 2.0), (-2.0, 1.0), (0.0, 0.0), (2.0, -1.0), (4.0, -2.0)]
    stack = jnp.stack([fourier_shift(base, jnp.asarray(s)) for s in shifts])
    aligned, est = align_stack(stack)
    mid = aligned[2]
    for i in range(5):
        assert float(jnp.mean((aligned[i] - mid) ** 2)) < 1e-2


def test_common_crop_slices():
    shifts = np.asarray([[-2.0, 1.0], [0.0, 0.0], [2.0, -1.0]])
    sy, sx = common_crop_slices(shifts, (32, 32))
    assert sy.start >= 2 and sy.stop <= 30
    assert sx.start >= 1 and sx.stop <= 31


@pytest.mark.slow
def test_fit_exit_wave_reduces_loss():
    from emx.recon.fit import AberrationFitConfig, fit_exit_wave

    wave = make_wave(32, seed=4)
    defocuses = jnp.asarray([-150.0, 0.0, 150.0])
    stack = make_focal_series(wave, defocuses)
    cfg = AberrationFitConfig(steps=60, learning_rate=0.05,
                              fit_aberrations=("a20",), fit_shifts=False)
    out = fit_exit_wave(stack, defocuses, cfg)
    assert out["losses"][-1] < 0.5 * out["losses"][0]


def test_register_affine_recovers_transform():
    from emx.recon.align import affine_warp, register_affine

    base = jnp.asarray(
        np.random.default_rng(5).random((64, 64)).astype(np.float32)
    )
    base = jax.vmap(lambda r: jnp.convolve(r, jnp.ones(5) / 5, mode="same"))(base)
    # Apply a known small affine: slight rotation + shift.
    th = 0.05
    A_true = jnp.asarray([[np.cos(th), -np.sin(th)],
                          [np.sin(th), np.cos(th)]], jnp.float32)
    t_true = jnp.asarray([2.0, -1.5])
    moving = affine_warp(base, A_true, t_true)
    # register moving onto... moving was sampled FROM base, so aligning
    # `base` onto `moving` should recover (A_true, t_true).
    A, t, warped = register_affine(moving, base, steps=250,
                                   learning_rate=5e-3)
    interior = (slice(8, -8), slice(8, -8))
    err = float(jnp.mean((warped[interior] - moving[interior]) ** 2))
    base_err = float(jnp.mean((base[interior] - moving[interior]) ** 2))
    assert err < 0.25 * base_err
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_true), atol=0.05)


def test_align_stack_affine_chains_to_middle():
    from emx.recon.align import affine_warp, align_stack_affine

    rng = np.random.default_rng(6)
    base = jnp.asarray(rng.random((48, 48)).astype(np.float32))
    base = jax.vmap(lambda r: jnp.convolve(r, jnp.ones(5) / 5, mode="same"))(base)
    shifts = [(-2.0, 1.0), (0.0, 0.0), (2.0, -1.0)]
    stack = jnp.stack([
        affine_warp(base, jnp.eye(2), jnp.asarray(s)) for s in shifts
    ])
    aligned, transforms = align_stack_affine(stack, steps=150)
    interior = (slice(6, -6), slice(6, -6))
    for i in range(3):
        err = float(jnp.mean(
            (aligned[i][interior] - aligned[1][interior]) ** 2))
        assert err < 5e-3


def test_reconstruct_robust_to_poisson_noise():
    # Reconstruction from a shot-noise-corrupted focal series still
    # recovers the wave (the reference's experimental regime).
    wave = make_wave(seed=8)
    defocuses = jnp.asarray([-250.0, -125.0, 0.0, 125.0, 250.0])
    stack = make_focal_series(wave, defocuses)
    dose = 500.0
    counts = jax.random.poisson(jax.random.key(0), stack * dose) / dose
    amps = jnp.sqrt(jnp.maximum(counts, 0.0))
    rec = reconstruct(amps, defocuses, CFG)
    corr = jnp.vdot(rec, wave) / (jnp.linalg.norm(rec) * jnp.linalg.norm(wave))
    assert float(jnp.abs(corr)) > 0.95
