"""Physics layer tests: CTF closed-form values, propagation invariants,
noise estimation, statistics suite (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx import physics


def test_wavelength_known_values():
    # 300 keV electrons: lambda ~ 0.01969 A; 200 keV: ~0.02508 A.
    assert physics.energy_to_wavelength(300.0) == pytest.approx(0.019687, rel=1e-3)
    assert physics.energy_to_wavelength(200.0) == pytest.approx(0.025079, rel=1e-3)


def test_defocus_ctf_closed_form():
    side, wl, df, px = 16, 0.02, 100.0, 1.0
    ctf = physics.defocus_ctf(side, wl, df, px_dim=px)
    # DC term: phase 0 -> 1+0j.
    assert ctf[0, 0] == pytest.approx(1.0 + 0j)
    # k = (1/16, 0): phase = pi * wl * df * k^2.
    expect = np.exp(1j * np.pi * wl * df * (1 / 16) ** 2)
    assert complex(ctf[1, 0]) == pytest.approx(complex(expect), rel=1e-5)
    # Unit modulus everywhere (pure phase plate).
    np.testing.assert_allclose(np.abs(np.asarray(ctf)), 1.0, atol=1e-5)


def test_spherical_aberration_term():
    side, wl, cs = 8, 0.02, 1e7
    ctf = physics.defocus_ctf(side, wl, 0.0, spher_aber_coeff=cs)
    k2 = (1 / 8) ** 2
    expect = np.exp(1j * 0.5 * np.pi * wl**3 * cs * k2**2)
    assert complex(ctf[1, 0]) == pytest.approx(complex(expect), rel=1e-4)


def test_propagate_roundtrip_inverts():
    rng = np.random.default_rng(0)
    wave = (rng.random((32, 32)) + 1j * rng.random((32, 32))).astype(np.complex64)
    wl, df = 0.025, 200.0
    out = physics.propagate_back_to_defocus(
        physics.propagate_to_focus(jnp.asarray(wave), df, wl), df, wl
    )
    np.testing.assert_allclose(np.asarray(out), wave, atol=1e-4)


def test_propagation_preserves_energy():
    rng = np.random.default_rng(1)
    wave = jnp.asarray(rng.random((64, 64)).astype(np.complex64))
    out = physics.propagate_to_focus(wave, 500.0, 0.02)
    # Unitary evolution: total intensity conserved (Parseval).
    assert float(jnp.sum(jnp.abs(out) ** 2)) == pytest.approx(
        float(jnp.sum(jnp.abs(wave) ** 2)), rel=1e-4
    )


def test_chi_reduces_to_defocus():
    # With only a20 set, chi = (pi/wl) * a20 * theta^2 = pi * wl * a20 * k^2:
    # full_ctf must agree with defocus_ctf (opposite sign convention:
    # exp(-i chi) vs exp(+i pi wl df k^2) -> a20 = -df).
    side, wl, df = 16, 0.02, 300.0
    ab = physics.Aberrations(a20=-df)
    full = physics.full_ctf((side, side), (1.0, 1.0), wl, ab)
    simple = physics.defocus_ctf(side, wl, df)
    np.testing.assert_allclose(np.asarray(full), np.asarray(simple), atol=1e-4)


def test_envelopes_damp_high_frequencies():
    side, wl = 32, 0.02
    ab = physics.Aberrations(a20=100.0)
    ctf = physics.full_ctf((side, side), (1.0, 1.0), wl, ab, focal_spread=200.0)
    mags = np.abs(np.asarray(ctf))
    assert mags[0, 0] == pytest.approx(1.0, abs=1e-5)
    assert mags[side // 2, side // 2] < mags[0, 0]


def test_aperture_envelope_shapes():
    theta = jnp.linspace(0, 0.1, 64)
    ap = physics.aperture_envelope(theta, 0.05, aperture_edge=0.02)
    ap = np.asarray(ap)
    assert ap[0] == 1.0
    assert ap[-1] == 0.0
    assert ((ap >= 0) & (ap <= 1)).all()


def test_estimate_noise_gaussian():
    rng = np.random.default_rng(2)
    for sigma in (0.05, 0.2):
        img = rng.normal(0.5, sigma, (256, 256)).astype(np.float32)
        est = float(physics.estimate_noise(jnp.asarray(img)))
        assert est == pytest.approx(sigma, rel=0.08)


def test_image_stats_fields_and_values():
    rng = np.random.default_rng(3)
    img = rng.random((128, 128)).astype(np.float32)
    stats = jax.jit(physics.image_stats)(jnp.asarray(img))
    assert set(stats) == set(physics.STAT_NAMES)
    assert float(stats["mean"]) == pytest.approx(img.mean(), rel=1e-4)
    assert float(stats["stddev"]) == pytest.approx(img.std(), rel=1e-3)
    assert float(stats["rms"]) == pytest.approx(np.sqrt((img**2).mean()), rel=1e-4)
    assert float(stats["min"]) == pytest.approx(img.min())
    assert float(stats["max"]) == pytest.approx(img.max())
    # Uniform dist: kurtosis ~ 1.8, skewness ~ 0.
    assert float(stats["kurtosis"]) == pytest.approx(1.8, abs=0.1)
    assert abs(float(stats["skewness"])) < 0.1


def test_image_stats_vmappable_and_finite():
    imgs = jnp.asarray(np.random.default_rng(4).random((3, 64, 64)), jnp.float32)
    stats = jax.vmap(physics.image_stats)(imgs)
    assert stats["mean"].shape == (3,)
    for name, v in stats.items():
        assert np.isfinite(np.asarray(v)).all(), name


def test_radial_profile_peak_matches_frequency():
    # A pure sinusoid concentrates FFT magnitude at its frequency radius.
    n = 128
    x = np.arange(n)
    img = np.sin(2 * np.pi * 16 * x / n)[None, :].repeat(n, 0).astype(np.float32)
    profile, freqs = physics.radial_fft_profile(jnp.asarray(img))
    profile = np.asarray(profile)
    # Ignore the DC bin; the peak must sit at radius 16.
    assert abs(int(np.argmax(profile[1:])) + 1 - 16) <= 1


def _matlab_stats_fixture(raw, img):
    """Expected values computed straight from the img_params.m formulas
    (MATLAB-derived fixture in numpy; std/skew/kurt population-normalised
    — the N vs N-1 difference is < 1e-5 at these sizes and covered by
    the tolerances)."""
    def moments(x):
        x = x.ravel().astype(np.float64)
        m, s = x.mean(), x.std()
        c = x - m
        return m, s, (c**3).mean() / max(s, 1e-20) ** 3, \
            (c**4).mean() / max(s**2, 1e-30) ** 2

    e = {}
    e["smallest_dim"] = min(raw.shape)
    e["height"], e["width"] = raw.shape
    e["num_px"] = raw.size
    e["min"], e["max"] = raw.min(), raw.max()
    e["num_nonzero"] = np.count_nonzero(raw)
    e["proportion_zero"] = e["num_nonzero"] / raw.size
    e["num_negative"] = (raw < 0).sum()
    e["proportion_negative"] = e["num_negative"] / raw.size
    m, s, sk, ku = moments(img)
    e["mean"], e["stddev"], e["skewness"], e["kurtosis"] = m, s, sk, ku
    e["min_resized"], e["max_resized"] = img.min(), img.max()
    e["median"] = np.median(img)
    e["coeff_variation"] = 100.0 * s / m
    e["rms"] = np.sqrt((img.astype(np.float64) ** 2).mean())
    sq = np.sqrt(np.maximum(img, 0.0))
    gm, gs, gsk, gku = moments(sq)
    e["mean_noise_gauss"], e["stddev_noise_gauss"] = gm, gs
    e["skewness_noise_gauss"], e["kurtosis_noise_gauss"] = gsk, gku
    e["ratio_mean_noise_to_mean"] = gm / m
    img01 = (img - img.min()) / (img.max() - img.min())
    m1, s1, _, _ = moments(img01)
    e["mean_0to1"], e["stddev_0to1"] = m1, s1
    e["median_0to1"] = np.median(img01)
    e["coeff_variation_0to1"] = 100.0 * s1 / m1
    e["rms_0to1"] = np.sqrt((img01.astype(np.float64) ** 2).mean())
    sq1 = np.sqrt(np.maximum(img01, 0.0))
    g1 = moments(sq1)
    e["mean_noise_gauss_0to1"], e["stddev_noise_gauss_0to1"] = g1[0], g1[1]
    e["skewness_noise_gauss_0to1"], e["kurtosis_noise_gauss_0to1"] = \
        g1[2], g1[3]
    e["ratio_mean_noise_to_mean_0to1"] = g1[0] / m1
    return e


@pytest.mark.parametrize("name", physics.STAT_NAMES)
def test_full_compendium_stat(name):
    """Every img_params.m compendium field is present and (where the
    formula is closed-form) matches the MATLAB-derived fixture."""
    rng = np.random.default_rng(11)
    raw = rng.random((160, 144)).astype(np.float32) * 2.0 - 0.2
    img = np.asarray(
        jax.image.resize(jnp.asarray(raw[:144, :144]), (128, 128),
                         "linear"))
    stats = jax.jit(physics.image_stats)(jnp.asarray(img),
                                         jnp.asarray(raw))
    assert set(stats) == set(physics.STAT_NAMES)
    assert len(physics.STAT_NAMES) == 40
    expect = _matlab_stats_fixture(raw, img)
    got = float(stats[name])
    assert np.isfinite(got)
    if name in expect:
        assert got == pytest.approx(float(expect[name]), rel=2e-3,
                                    abs=2e-3), name
    # noise / radial-frequency stats have dedicated tests above.
