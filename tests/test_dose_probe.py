"""Per-dose-bin adaptive loss probing (reference
misc_py/encoder-decoder.py:939-959,1042-1052)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.train.dose_probe import (
    DoseProbe,
    moving_average,
    probed_denoiser_example,
    sample_dose,
    training_probs,
)


def test_training_probs_reference_formula():
    prev = np.asarray([1.0, 1.0, 1.0, 1.0], np.float32)
    new = np.asarray([1.0, 0.5, 1.0, 1.0], np.float32)  # bin 1 improved
    probs = training_probs(prev, new, smoothing=1, floor=0.05)
    assert probs.shape == (4,)
    assert probs[-1] == pytest.approx(1.0)
    assert np.all(np.diff(probs) >= 0)
    # The improved bin gets the bulk of the mass.
    pmf = np.diff(np.concatenate([[0.0], probs]))
    assert pmf[1] == max(pmf)
    assert pmf[1] / pmf[0] == pytest.approx((0.5 + 0.025) / 0.025, rel=1e-4)


def test_training_probs_no_improvement_uniform():
    prev = np.ones(5, np.float32)
    new = np.ones(5, np.float32) * 2  # got worse everywhere
    probs = training_probs(prev, new, smoothing=1)
    pmf = np.diff(np.concatenate([[0.0], probs]))
    np.testing.assert_allclose(pmf, 0.2, rtol=1e-5)


def test_moving_average_same_length():
    x = np.arange(10, dtype=np.float32)
    assert moving_average(x, 3).shape == (10,)
    assert moving_average(x, 1).shape == (10,)


def test_sample_dose_follows_cdf():
    dose_means = jnp.asarray([10.0, 100.0, 1000.0])
    # All mass on the middle bin.
    cum = jnp.asarray([0.0, 1.0, 1.0])
    keys = jax.random.split(jax.random.key(0), 64)
    doses = jax.vmap(lambda k: sample_dose(k, cum, dose_means))(keys)
    assert np.all(np.asarray(doses) == 100.0)


def test_probed_example_shapes():
    img = jnp.asarray(np.random.default_rng(0).random((32, 32)), jnp.float32)
    probe = DoseProbe(num_bins=8)
    lq, tgt = probed_denoiser_example(
        jax.random.key(1), img, probe.device_probs(),
        jnp.asarray(probe.dose_means))
    assert lq.shape == img.shape and tgt.shape == img.shape
    assert np.isfinite(np.asarray(lq)).all()


def test_probe_trainer_integration_no_recompile():
    from emx.data.pipeline import DeviceDataset, PipelineConfig, \
        synthetic_micrographs
    from emx.nn import Denoiser, DenoiserConfig
    from emx.train import TrainConfig, Trainer

    probe = DoseProbe(num_bins=6, dose_min=25, dose_max=200)
    model = Denoiser(DenoiserConfig(features=(8, 8, 8, 8, 8),
                                    num_middle_blocks=0, aspp_filters=8,
                                    aspp_out=8, norm="group"))
    trainer = Trainer(model, TrainConfig(optimizer="adam", log_every=0),
                      example_fn=probe.example_fn, probe=probe)
    data = synthetic_micrographs(16, 32)
    pipe = DeviceDataset(data, PipelineConfig(batch_size=8, crop_size=32))
    state = trainer.init(jnp.zeros((8, 32, 32)))

    hook = probe.make_eval_hook(trainer, data[:4])
    state = trainer.fit(state, pipe, num_steps=2, eval_fn=hook, eval_every=1)
    assert probe.prev_losses is not None and probe.prev_losses.shape == (6,)
    first_cdf = probe.cum_probs.copy()
    # Second probe updates the CDF; continuing to fit with the new CDF
    # must not recompile (traced argument).
    n_compiles_before = trainer.step_fn._cache_size()
    state = trainer.fit(state, pipe, num_steps=4, eval_fn=hook, eval_every=1)
    assert trainer.step_fn._cache_size() == n_compiles_before
    assert probe.cum_probs.shape == first_cdf.shape
