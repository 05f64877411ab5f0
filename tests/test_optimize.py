"""BatchNorm folding: folded norm='none' model must match the BatchNorm
model's eval-mode outputs on every architecture that uses the blocks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.serve.optimize import fold_batchnorm, fold_denoiser


def _trained_ish_variables(model, x, key, steps=3):
    """Init then run a few train-mode passes so batch_stats are nontrivial."""
    variables = model.init(key, x, train=False)
    bs = variables.get("batch_stats")
    for i in range(steps):
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape)
        _, upd = model.apply(
            {"params": variables["params"], "batch_stats": bs},
            x + 0.1 * noise, train=True, mutable=["batch_stats"],
        )
        bs = upd["batch_stats"]
    return {"params": variables["params"], "batch_stats": bs}


def test_fold_denoiser_matches_batchnorm_eval():
    from emx.nn import Denoiser, DenoiserConfig

    cfg = DenoiserConfig(features=(8, 8, 8, 8, 8), num_middle_blocks=1,
                         aspp_filters=8, aspp_out=8, norm="batch")
    model = Denoiser(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32)), jnp.float32)
    variables = _trained_ish_variables(model, x, jax.random.key(1))
    expect = model.apply(variables, x, train=False)

    folded_cfg, folded_vars = fold_denoiser(cfg, variables)
    folded = Denoiser(folded_cfg)
    got = folded.apply(folded_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5)


def test_fold_small_autoencoder():
    from emx.nn import SmallAEConfig, SmallAutoencoder

    cfg = SmallAEConfig(features=(8, 8, 8), bottleneck=4, norm="batch")
    model = SmallAutoencoder(cfg)
    x = jnp.asarray(np.random.default_rng(1).random((2, 32, 32)), jnp.float32)
    variables = _trained_ish_variables(model, x, jax.random.key(2))
    expect = model.apply(variables, x, train=False)

    folded_vars = fold_batchnorm(variables)
    folded = SmallAutoencoder(dataclasses.replace(cfg, norm="none"))
    got = folded.apply(folded_vars, x, train=False)
    # Output instance-norm stays (not a BatchNorm); interior BNs fold.
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)


def test_fold_rejects_groupnorm():
    from emx.nn import Denoiser, DenoiserConfig

    cfg = DenoiserConfig(features=(8, 8, 8, 8, 8), num_middle_blocks=0,
                         aspp_filters=8, aspp_out=8, norm="group")
    with pytest.raises(ValueError):
        fold_denoiser(cfg, {"params": {}})


def test_artifact_roundtrip(tmp_path):
    """save/load of the deployment bundle preserves config + outputs,
    including the round-3 mid-res/full-res head variants."""
    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.artifact import load_denoiser_artifact, \
        save_denoiser_artifact

    cfg = DenoiserConfig(features=(8, 8, 8, 8, 8), num_middle_blocks=1,
                         aspp_filters=8, aspp_out=8, norm="batch",
                         space_to_depth=4, mid_res_head=8)
    model = Denoiser(cfg)
    x = jnp.asarray(np.random.default_rng(3).random((1, 64, 64)),
                    jnp.float32)
    variables = _trained_ish_variables(model, x, jax.random.key(4))
    folded_cfg, folded_vars = fold_denoiser(cfg, variables)
    expect = Denoiser(folded_cfg).apply(folded_vars, x, train=False)

    p = str(tmp_path / "artifact.npz")
    save_denoiser_artifact(p, folded_cfg, folded_vars)
    cfg2, vars2 = load_denoiser_artifact(p)
    assert cfg2 == folded_cfg
    got = Denoiser(cfg2).apply(vars2, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-6)


def test_artifact_rejects_unfolded(tmp_path):
    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.artifact import save_denoiser_artifact

    cfg = DenoiserConfig(features=(8, 8, 8, 8, 8), num_middle_blocks=1,
                         aspp_filters=8, aspp_out=8, norm="batch")
    model = Denoiser(cfg)
    x = jnp.zeros((1, 32, 32), jnp.float32)
    variables = _trained_ish_variables(model, x, jax.random.key(5))
    with pytest.raises(ValueError):
        save_denoiser_artifact(str(tmp_path / "a.npz"), cfg, variables)


def test_pytree_bundle_roundtrip_preserves_structure(tmp_path):
    """save_pytree_npz / load_pytree_like: values come from the file,
    containers and leaf dtypes from the reference tree — so a loaded
    bundle drops into an existing TrainState without changing the
    optimizer's treedef (the cross-session warm-start path of
    emx.bench.quality_run / gan_quality)."""
    from flax.core import FrozenDict

    from emx.serve.artifact import load_pytree_like, save_pytree_npz

    rng = np.random.default_rng(0)
    saved = {
        "params": {"Conv_0": {"kernel": jnp.asarray(
                       rng.random((3, 3, 2, 4)), jnp.bfloat16)},
                   "BN_0": {"scale": rng.random((4,))}},
        "batch_stats": {"BN_0": {"mean": rng.random((4,))}},
    }
    p = str(tmp_path / "state.npz")
    save_pytree_npz(p, saved, meta={"step": 42})

    # Reference tree with different containers, dtypes, and values.
    ref = {
        "params": FrozenDict(
            {"Conv_0": {"kernel": jnp.zeros((3, 3, 2, 4), jnp.bfloat16)},
             "BN_0": {"scale": jnp.zeros((4,), jnp.float32)}}),
        "batch_stats": {"BN_0": {"mean": jnp.zeros((4,), jnp.float32)}},
    }
    tree, meta = load_pytree_like(p, ref)
    assert meta["step"] == 42
    assert isinstance(tree["params"], FrozenDict)
    assert tree["params"]["Conv_0"]["kernel"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(tree["batch_stats"]["BN_0"]["mean"]),
        saved["batch_stats"]["BN_0"]["mean"], atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(tree["params"]["BN_0"]["scale"]),
        saved["params"]["BN_0"]["scale"], atol=1e-7)
    # Missing paths in the file must raise, not silently zero-fill.
    import pytest as _pytest

    ref_extra = {"params": {"Conv_9": {"kernel": jnp.zeros((1,))}}}
    with _pytest.raises(KeyError):
        load_pytree_like(p, ref_extra)
