"""Classical filter / entropy / Pearson / harvest tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.analysis import (
    bilateral_filter,
    chambolle_tv,
    compare_denoisers,
    gaussian_filter,
    gram_matrix,
    median_filter,
    shannon_entropy,
    wavelet_denoise,
    wiener_filter,
)
from emx.data.pipeline import synthetic_micrographs


@pytest.fixture(scope="module")
def noisy_clean():
    clean = jnp.asarray(synthetic_micrographs(2, 64, seed=5))
    noise = 0.15 * jax.random.normal(jax.random.key(0), clean.shape)
    return jnp.clip(clean + noise, 0, 1), clean


@pytest.mark.parametrize("filt", [
    lambda x: gaussian_filter(x, 1.0),
    lambda x: median_filter(x, 1),
    lambda x: bilateral_filter(x),
    lambda x: wiener_filter(x, 1),
    lambda x: wavelet_denoise(x),
    lambda x: chambolle_tv(x, 0.1, 20),
], ids=["gaussian", "median", "bilateral", "wiener", "wavelet", "tv"])
def test_filters_reduce_noise(noisy_clean, filt):
    noisy, clean = noisy_clean
    out = jax.vmap(filt)(noisy)
    assert out.shape == noisy.shape
    mse_in = float(jnp.mean((noisy - clean) ** 2))
    mse_out = float(jnp.mean((out - clean) ** 2))
    assert mse_out < mse_in


def test_median_filter_exact():
    img = jnp.asarray([[0.0, 0, 0], [0, 9, 0], [0, 0, 0]])
    out = median_filter(img, 1)
    assert float(out[1, 1]) == 0.0  # spike removed


def test_compare_denoisers_table(noisy_clean):
    noisy, clean = noisy_clean
    table = compare_denoisers(noisy, clean, nn_fn=lambda x: x * 0.9 + 0.05)
    assert "identity" in table and "gaussian" in table and "nn" in table
    for row in table.values():
        assert np.isfinite(row["mse"]) and np.isfinite(row["psnr"])
    assert table["gaussian"]["mse"] < table["identity"]["mse"]


def test_shannon_entropy_bounds():
    const = jnp.full((64, 64), 0.5)
    assert float(shannon_entropy(const)) == pytest.approx(0.0, abs=1e-5)
    uniform = jax.random.uniform(jax.random.key(0), (256, 256))
    h = float(shannon_entropy(uniform, num_bins=256))
    assert 7.5 < h <= 8.0


def test_gram_matrix_properties():
    f = jax.random.normal(jax.random.key(1), (16, 16, 8))
    g = gram_matrix(f)
    assert g.shape == (8, 8)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g.T), atol=1e-6)


def test_pearson_families():
    from scipy import stats as sps

    from emx.analysis.pearson import classify_family, pearson_from_moments

    # Normal.
    d = pearson_from_moments(2.0, 4.0, 0.0, 3.0)
    assert d.family == "normal"
    assert d.cdf(2.0) == pytest.approx(0.5, abs=1e-9)

    # Gamma (type III): shape k=4 -> skew=1, kurt=4.5.
    g = sps.gamma(4.0, scale=2.0)
    d3 = pearson_from_moments(float(g.mean()), float(g.var()), 1.0, 4.5)
    xs = np.linspace(1.0, 20.0, 7)
    np.testing.assert_allclose(d3.cdf(xs), g.cdf(xs), atol=0.02)

    # Student-t (type VII): nu=10 -> kurt = 3 + 6/6 = 4.
    t = sps.t(10.0)
    d7 = pearson_from_moments(0.0, float(t.var()), 0.0, 4.0)
    np.testing.assert_allclose(d7.cdf([-2.0, 0.0, 2.0]),
                               t.cdf([-2.0, 0.0, 2.0]), atol=0.02)

    # Beta (type I): a=2,b=5.
    b = sps.beta(2.0, 5.0)
    skew = float(b.stats("s"))
    kurt = float(b.stats("k")) + 3
    d1 = pearson_from_moments(float(b.mean()), float(b.var()), skew, kurt)
    assert classify_family(skew, kurt) == "I"
    xs = np.linspace(0.05, 0.8, 6)
    np.testing.assert_allclose(d1.cdf(xs), b.cdf(xs), atol=0.05)


def test_moment_redistributor():
    from emx.analysis.pearson import moment_redistributor

    vals = np.random.default_rng(0).exponential(2.0, 5000)
    red = moment_redistributor(vals)
    out = red["transform"](vals)
    # Equalized values ~ Uniform(0,1).
    assert abs(out.mean() - 0.5) < 0.02
    hist, _ = np.histogram(out, bins=10, range=(0, 1))
    assert hist.min() > 300


def test_harvest_reap_and_census(tmp_path):
    from emx.data.harvest import census, crop_dataset, reap, stats_to_csv
    from emx.io.dm import write_dm

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = (1000 * rng.random((600, 700))).astype(np.float32)
        p = str(tmp_path / f"f{i}.dm3")
        write_dm(p, img)
        paths.append(p)
    # One non-imaging file and one tiny file.
    write_dm(str(tmp_path / "diff.dm3"), np.ones((600, 600), np.float32),
             operation_mode="DIFFRACTION")
    write_dm(str(tmp_path / "small.dm3"), np.ones((64, 64), np.float32))
    all_paths = paths + [str(tmp_path / "diff.dm3"), str(tmp_path / "small.dm3")]

    c = census(all_paths, min_side=512)
    assert c["usable"] == 4 and c["not_imaging"] == 1 and c["too_small"] == 1

    m = reap(paths, str(tmp_path / "out"), size=128)
    assert len(m) == 4
    assert all("stats" in r for r in m.records)

    counts = crop_dataset(m, str(tmp_path / "crops"), tile=64)
    assert counts["train"] > 0 and counts["test"] > 0

    stats_to_csv([m], str(tmp_path / "stats.csv"))
    import csv as _csv

    with open(tmp_path / "stats.csv") as f:
        rows = list(_csv.reader(f))
    assert len(rows) == 5  # header + 4


def test_extract_stacks(tmp_path):
    from emx.data.harvest import extract_stacks
    from emx.io.dm import write_dm

    stack = np.random.default_rng(1).random((3, 64, 64)).astype(np.float32)
    p = str(tmp_path / "s.dm4")
    write_dm(p, stack, with_thumbnail=False)
    dirs = extract_stacks([p], str(tmp_path / "stacks"))
    assert len(dirs) == 1
    import glob

    assert len(glob.glob(dirs[0] + "/img*.tif")) == 3


def test_compare_denoisers_per_image_and_err_hists(tmp_path):
    import jax
    import jax.numpy as jnp

    from emx.analysis.filters import compare_denoisers, save_err_hists

    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.random((4, 32, 32)), jnp.float32)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=(4, 32, 32)),
                                      jnp.float32)
    res = compare_denoisers(noisy, clean, per_image=True)
    assert res["gaussian"]["mses"].shape == (4,)
    assert res["identity"]["psnrs"].shape == (4,)
    hists = save_err_hists(res, str(tmp_path))
    assert (tmp_path / "gaussian-losses.npy").exists()
    assert (tmp_path / "err_hist.npz").exists()
    assert all(h.sum() == 4 for h in hists.values())
