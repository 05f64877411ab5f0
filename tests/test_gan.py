"""Infilling GAN tests: architecture shapes, multiscale crops, fused GAN
step, adaptive scheduling dynamics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.data.degrade import bernoulli_mask, infilling_example
from emx.data.pipeline import DataPipeline, PipelineConfig, synthetic_micrographs
from emx.nn.infilling import (
    InfillingConfig,
    InfillingGenerator,
    MultiscaleDiscriminator,
    multiscale_crops,
)
from emx.parallel import make_mesh
from emx.train.gan import GANConfig, GANTrainer, _adapt_rate, _flip_prob

TINY = InfillingConfig.tiny()
SIZE = 32


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_generator_output_range_and_shape():
    gen = InfillingGenerator(TINY)
    x = jnp.zeros((2, SIZE, SIZE))
    variables = gen.init(jax.random.key(0), x, train=False)
    out = gen.apply(variables, x, train=False)
    assert out.shape == (2, SIZE, SIZE)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


def test_multiscale_crops_shapes():
    img = jnp.zeros((2, SIZE, SIZE))
    small, medium, large = multiscale_crops(jax.random.key(0), img)
    assert small.shape == (2, SIZE // 4, SIZE // 4, 1)
    assert medium.shape == (2, SIZE // 2, SIZE // 2, 1)
    assert large.shape == (2, SIZE // 4, SIZE // 4, 1)


def test_discriminator_prob_and_features():
    disc = MultiscaleDiscriminator(TINY)
    crops = multiscale_crops(jax.random.key(0), jnp.zeros((2, SIZE, SIZE)))
    variables = disc.init(jax.random.key(1), crops, train=False)
    prob, feats = disc.apply(variables, crops, train=False)
    assert prob.shape == (2,)
    assert (np.asarray(prob) >= 0).all() and (np.asarray(prob) <= 1).all()
    assert len(feats) == 3 * len(TINY.disc_features)


def test_flip_and_adapt_formulas():
    # Reference formulas at gan-infilling-100.py:1726-1734.
    assert float(_flip_prob(jnp.asarray(0.0))) == pytest.approx(0.01)
    assert float(_flip_prob(jnp.asarray(1.0))) == pytest.approx(0.0)
    assert float(_adapt_rate(jnp.asarray(0.5))) == pytest.approx(
        10 * np.exp(-0.5) * (1 - np.exp(-0.25)), rel=1e-5
    )


@pytest.fixture(scope="module")
def gan_setup(mesh):
    mask = bernoulli_mask(jax.random.key(1), (SIZE, SIZE), 1 / 16)
    example_fn = functools.partial(infilling_example, mask=mask)
    cfg = GANConfig(gen_lr=1e-3, disc_lr=1e-3, log_every=0)
    trainer = GANTrainer(
        InfillingGenerator(TINY), MultiscaleDiscriminator(TINY), cfg,
        mesh=mesh, example_fn=example_fn,
    )
    data = synthetic_micrographs(8, SIZE, seed=21)
    state = trainer.init(jnp.asarray(data))
    return trainer, state, data


def _copy_state(state):
    # step_fn donates its input; tests sharing the fixture state must pass
    # a copy so the original buffers survive.
    return jax.tree_util.tree_map(jnp.copy, state)


def test_gan_fused_step_runs_and_gates(gan_setup):
    trainer, state, data = gan_setup
    state = _copy_state(state)
    batch = jnp.asarray(data)

    # step_fn donates its state argument: materialize anything compared
    # across steps to numpy *before* the next call.
    disc_before = np.asarray(jax.tree_util.tree_leaves(state.disc_params)[0])
    state1, m1 = trainer.step_fn(state, batch, jnp.asarray(True),
                                 jnp.asarray(False))
    # Generator gated ON -> gen params moved; disc gated OFF -> unchanged.
    disc_after = np.asarray(jax.tree_util.tree_leaves(state1.disc_params)[0])
    np.testing.assert_array_equal(disc_before, disc_after)
    assert np.isfinite(float(m1["gen_loss"]))
    assert np.isfinite(float(m1["disc_loss"]))
    assert 0.0 <= float(m1["d_fake"]) <= 1.0

    gen_before = np.asarray(jax.tree_util.tree_leaves(state1.gen_params)[0])
    state2, m2 = trainer.step_fn(state1, batch, jnp.asarray(False),
                                 jnp.asarray(True))
    gen_after = np.asarray(jax.tree_util.tree_leaves(state2.gen_params)[0])
    np.testing.assert_array_equal(gen_before, gen_after)
    assert int(state2.step) == 2
    # EMA stays a valid probability (at init D outputs exactly 0.5, so the
    # EMA may legitimately still be 0.5 after two steps).
    assert 0.0 <= float(state2.pred_avg) <= 1.0


def test_gan_fit_switches_trainee(gan_setup, tmp_path):
    trainer, state, data = gan_setup
    state = _copy_state(state)
    trainer.cfg.log_every = 1
    trainer.logger = type(trainer.logger)(str(tmp_path))
    pipe = DataPipeline(data, PipelineConfig(batch_size=8, crop_size=SIZE))
    state = trainer.fit(state, pipe, num_steps=6)
    assert int(state.step) >= 6
    from emx.utils.metrics import read_jsonl

    recs = read_jsonl(str(tmp_path / "metrics.jsonl"))
    assert len(recs) >= 4
    # Both parties trained at some point (middle band alternates).
    assert {r["train_gen"] for r in recs} <= {0.0, 1.0}


def test_lr_staircase():
    cfg = GANConfig(gen_lr=2e-4, lr_decay_start=100, lr_decay_every=10,
                    lr_decay_frac=0.125)
    tr = GANTrainer.__new__(GANTrainer)
    tr.cfg = cfg
    assert tr.lr_at(50) == 2e-4
    assert tr.lr_at(100) == pytest.approx(2e-4 * 0.875)
    assert tr.lr_at(170) == pytest.approx(2e-4 * 0.0)
    assert tr.lr_at(1000) == 0.0


def test_collapse_rollback_invoked(gan_setup, tmp_path):
    # When D outputs exactly 0.5 on both real and fake past step 10, fit()
    # must restore the last checkpoint (reference collapse recovery,
    # gan-infilling-100.py:1827-1831). Drive the host loop with a stubbed
    # step_fn and a recording checkpointer.
    trainer, state, data = gan_setup
    state = _copy_state(state)

    calls = {"rollback": 0}

    class StubCkpt:
        def rollback(self, s):
            calls["rollback"] += 1
            return s, None

        def save(self, *a, **k):
            pass

    collapse_metrics = {
        "gen_loss": jnp.asarray(1.0), "disc_loss": jnp.asarray(1.0),
        "d_fake": jnp.asarray(0.5), "d_fake_after": jnp.asarray(0.5),
        "d_real": jnp.asarray(0.5), "mse": jnp.asarray(0.1),
    }

    def stub_step(s, batch, do_gen, do_disc):
        return s.replace(step=s.step + 1), collapse_metrics

    trainer._step_fn = stub_step
    state = state.replace(step=jnp.asarray(11, jnp.int32))
    pipe = DataPipeline(data, PipelineConfig(batch_size=8, crop_size=SIZE))
    trainer.cfg.log_every = 0
    trainer.fit(state, pipe, num_steps=14, checkpointer=StubCkpt())
    assert calls["rollback"] >= 1


def _sched_stub(trainer, d_fake_seq):
    """Stub step_fn feeding a scripted d_fake sequence to the host loop."""
    def stub_step(s, batch, do_gen, do_disc):
        i = min(int(s.step), len(d_fake_seq) - 1)
        m = {
            "gen_loss": jnp.asarray(1.0), "disc_loss": jnp.asarray(1.0),
            "d_fake": jnp.asarray(d_fake_seq[i]),
            "d_fake_after": jnp.asarray(d_fake_seq[i]),
            "d_real": jnp.asarray(0.9), "mse": jnp.asarray(0.1),
        }
        return s.replace(step=s.step + 1), m

    trainer._step_fn = stub_step
    return trainer


def _trainees_from_log(tmp_path):
    from emx.utils.metrics import read_jsonl

    recs = read_jsonl(str(tmp_path / "metrics.jsonl"))
    return [r["train_gen"] for r in sorted(recs, key=lambda r: r["step"])]


def test_forced_trainee_switch_fires(gan_setup, tmp_path):
    # d_fake pinned below switch_low would keep the generator training
    # forever; max_num_since_change must force a discriminator round
    # (reference gan-infilling-100.py:1922-1925).
    trainer, state, data = gan_setup
    state = _copy_state(state)
    trainer = _sched_stub(trainer, [0.1] * 10)
    trainer.cfg.log_every = 1
    trainer.cfg.max_num_since_change = 3
    trainer.logger = type(trainer.logger)(str(tmp_path))
    pipe = DataPipeline(data, PipelineConfig(batch_size=8, crop_size=SIZE))
    trainer.fit(state, pipe, num_steps=8)
    trainees = _trainees_from_log(tmp_path)
    trainer.cfg.max_num_since_change = 0  # restore shared fixture cfg
    trainer._step_fn = None
    assert 0.0 in trainees, trainees  # the forced flip to the discriminator
    assert trainees[:3] == [1.0, 1.0, 1.0]  # band decision until forced


def test_no_forced_switch_when_disabled(gan_setup, tmp_path):
    trainer, state, data = gan_setup
    state = _copy_state(state)
    trainer = _sched_stub(trainer, [0.1] * 10)
    trainer.cfg.log_every = 1
    trainer.cfg.max_num_since_change = 0
    trainer.logger = type(trainer.logger)(str(tmp_path))
    pipe = DataPipeline(data, PipelineConfig(batch_size=8, crop_size=SIZE))
    trainer.fit(state, pipe, num_steps=8)
    trainees = _trainees_from_log(tmp_path)
    trainer._step_fn = None
    assert set(trainees) == {1.0}  # generator starves the discriminator


def test_windowed_trainee_decision(gan_setup, tmp_path):
    # With trainee_switch_skip_n=4 the decision uses the 4-step window
    # average (reference :1903-1906): no flip before the window closes.
    trainer, state, data = gan_setup
    state = _copy_state(state)
    trainer = _sched_stub(trainer, [0.9] * 8)
    trainer.cfg.log_every = 1
    trainer.cfg.trainee_switch_skip_n = 4
    trainer.logger = type(trainer.logger)(str(tmp_path))
    pipe = DataPipeline(data, PipelineConfig(batch_size=8, crop_size=SIZE))
    trainer.fit(state, pipe, num_steps=6)
    trainees = _trainees_from_log(tmp_path)
    trainer.cfg.trainee_switch_skip_n = 1
    trainer._step_fn = None
    # Steps 1-3: window still open, initial trainee (gen) unchanged.
    # Step 4: window avg 0.9 > 0.7 -> discriminator.
    assert trainees[:4] == [1.0, 1.0, 1.0, 0.0], trainees
