"""VecFresnelEnv: batched jitted twin of the serial FresnelEnv stack.

Checks the three contracts dqn_vec relies on: physics parity with
SimulatedMicroscope.acquire, episode semantics (shaped reward,
auto-reset), and the agent's batched replay path.
"""

import numpy as np
import pytest

from emx.scope.vec_env import VecFresnelConfig, VecFresnelEnv


def make_vec(**kw):
    base = dict(batch=4, image_size=32, num_specimens=8, max_z_dist=3.0,
                proximity=0.15, max_episode_steps=5, dose=2000.0,
                specimen_seed=3)
    base.update(kw)
    return VecFresnelEnv(VecFresnelConfig(**base))


def test_acquire_matches_serial_sim_noiseless():
    """Same specimen, same z -> the batched acquire reproduces the serial
    SimulatedMicroscope frame exactly (dose=0 removes the RNG)."""
    from emx.scope.sim import SimulatedMicroscope

    env = make_vec(dose=0.0)
    spec = np.asarray(env._pool[2])
    scope = SimulatedMicroscope(image_size=32, dose=0.0, specimen=spec,
                                optimal_z=0.0)
    for z in (0.0, 1.3, -2.0):
        scope.z = z
        ref = scope.acquire()
        import jax.numpy as jnp

        got = np.asarray(env._acquire(
            __import__("jax").random.key(0),
            jnp.asarray(spec)[None], jnp.asarray([z])))[0]
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_contrast_increases_with_defocus():
    from emx.scope.env import fresnel_quantifier

    env = make_vec(dose=2000.0, batch=8)
    import jax
    import jax.numpy as jnp

    spec = env._pool[:8]
    near = env._acquire(jax.random.key(1), spec, jnp.full((8,), 0.05))
    far = env._acquire(jax.random.key(2), spec, jnp.full((8,), 2.5))
    k_near = np.mean([fresnel_quantifier(np.asarray(f)) for f in near])
    k_far = np.mean([fresnel_quantifier(np.asarray(f)) for f in far])
    assert k_far > k_near


def test_step_semantics_and_autoreset():
    env = make_vec()
    state, obs = env.reset(seed=0)
    assert obs.shape == (4, 32, 32, 3)
    # Reset obs: prev == cur, zero action plane (StackedFresnelEnv reset).
    np.testing.assert_array_equal(np.asarray(obs[..., 0]),
                                  np.asarray(obs[..., 1]))
    assert np.all(np.asarray(obs[..., 2]) == 0.0)

    z0 = np.asarray(state["z"])
    shift = np.full((4,), 0.5, np.float32)
    state, obs, shaped, done, info = env.step(state, shift)
    # Shaped reward telescopes the distance closed.
    live = ~np.asarray(done)
    np.testing.assert_allclose(np.asarray(shaped)[live],
                               (np.abs(z0) - np.abs(z0 + 0.5))[live],
                               atol=1e-5)
    # Action plane carries shift/max_shift for live lanes.
    assert np.allclose(np.asarray(obs[..., 2])[live], 0.5)

    # Max-step truncation always auto-resets: run past the horizon and
    # check steps never exceed it and every lane saw >= 1 reset.
    seen_done = np.zeros(4, bool)
    for _ in range(12):
        state, obs, shaped, done, info = env.step(state, shift)
        seen_done |= np.asarray(done)
        assert np.asarray(state["steps"]).max() <= 5
    assert seen_done.all()
    # Post-reset lanes restart within the sampled-start band.
    assert np.all(np.abs(np.asarray(state["z"])) <= 3.0 + 5 * 1.0)


def test_solved_flag_and_proximity_reset():
    env = make_vec()
    state, obs = env.reset(seed=1)
    # Teleport two lanes next to the optimum, step tiny shift -> solved.
    z = np.asarray(state["z"]).copy()
    z[:2] = 0.16
    state = dict(state, z=__import__("jax").numpy.asarray(z))
    state, obs, shaped, done, info = env.step(
        state, np.array([-0.05, -0.05, 0.0, 0.0], np.float32))
    assert np.asarray(info["solved"])[:2].all()
    assert np.asarray(done)[:2].all()
    assert np.asarray(state["steps"])[:2].max() == 0  # auto-reset


def test_agent_batched_path_trains():
    from emx.scope.dqn import DQNAgent, DQNConfig

    env = make_vec()
    cfg = DQNConfig(num_actions=5, features=(8,), max_shift=1.0,
                    warmup=8, batch_size=8, buffer_size=64,
                    target_update_every=2, double=True, seed=0)
    agent = DQNAgent((32, 32, 3), cfg)
    state, obs = env.reset(seed=0)
    obs = np.asarray(obs)
    for _ in range(4):
        a = agent.act_batch(obs)
        assert a.shape == (4,) and a.dtype == np.int32
        state, next_obs, shaped, done, info = env.step(
            state, agent.shifts[a])
        next_obs = np.asarray(next_obs)
        loss = agent.observe_batch(obs, a, np.asarray(shaped), next_obs,
                                   np.asarray(done), train_steps=2)
        obs = next_obs
    assert agent.step_count == 16
    assert agent.train_count > 0 and loss is not None and np.isfinite(loss)


def test_buffer_add_batch_wraparound():
    from emx.scope.dqn import ReplayBuffer

    buf = ReplayBuffer(10, (2,))
    for start in range(0, 24, 4):
        obs = np.full((4, 2), start, np.float32)
        buf.add_batch(obs, np.arange(start, start + 4, dtype=np.int32),
                      np.zeros(4, np.float32), obs, np.zeros(4, np.float32))
    assert len(buf) == 10
    # Latest 10 actions survive, in ring order.
    assert sorted(buf.actions.tolist()) == list(range(14, 24))
