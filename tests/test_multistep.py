"""Fused multi-step training launches (steps_per_launch)."""

import jax
import jax.numpy as jnp
import numpy as np

from emx.data.degrade import denoiser_example
from emx.data.pipeline import DataPipeline, PipelineConfig, synthetic_micrographs
from emx.nn import Denoiser, DenoiserConfig
from emx.train import TrainConfig, Trainer

TINY = DenoiserConfig(features=(8, 8, 8, 8, 8), num_middle_blocks=0,
                      aspp_filters=8, aspp_out=8, norm="group")


def test_multi_step_matches_sequential():
    data = synthetic_micrographs(16, 32, seed=5)
    batches = np.stack([data[:8], data[8:]])

    def make(spl):
        # SGD: update magnitude scales with the gradient, so XLA fusion
        # reordering stays at float-rounding level. (Adam normalizes tiny
        # gradients to O(lr) updates, amplifying bitwise differences in
        # near-zero coordinates — observed 0.03 drift with identical loss.)
        cfg = TrainConfig(learning_rate=0.01, optimizer="nesterov",
                          log_every=0, seed=3, steps_per_launch=spl)
        return Trainer(Denoiser(TINY), cfg, example_fn=denoiser_example)

    t1 = make(1)
    s1 = t1.init(jnp.zeros((8, 32, 32)))
    for b in batches:
        s1, m1 = t1.step_fn(s1, jnp.asarray(b))

    t2 = make(2)
    s2 = t2.init(jnp.zeros((8, 32, 32)))
    s2, m2 = t2.multi_step_fn(s2, jnp.asarray(batches))

    assert int(s1.step) == int(s2.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)


def test_fit_with_steps_per_launch():
    cfg = TrainConfig(learning_rate=0.01, optimizer="adam", log_every=2,
                      steps_per_launch=3)
    trainer = Trainer(Denoiser(TINY), cfg, example_fn=denoiser_example)
    pipe = DataPipeline(synthetic_micrographs(16, 32, seed=6),
                        PipelineConfig(batch_size=8, crop_size=32))
    state = trainer.init(jnp.zeros((8, 32, 32)))
    state = trainer.fit(state, pipe, num_steps=5)
    # Overshoots to the next multiple of steps_per_launch.
    assert int(state.step) == 6
