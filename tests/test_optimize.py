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
