"""Batched, fully-jitted twin of FresnelEnv for large-scale DQN training.

The reference trains its keras-rl autofocus agent for 1.75M serial
hardware steps (em_env/fresnel_remover.py:93-118). The serial simulator
path here (emx.scope.sim -> FresnelEnv) runs ~13 env-steps/s on one CPU
core, so reference-scale training is unreachable serially. This module
re-states the same episode semantics as a batched pure function of a
device state pytree — B episodes advance per jitted call (one batched
FFT propagation + Poisson draw), which is also exactly the shape a TPU
wants (large batched FFTs/convs instead of per-episode scalar work).

Contracts kept identical to the serial stack so the trained policy
evaluates on the raw FresnelEnv unchanged:
  * physics: pure phase object -> defocus CTF propagation -> Poisson
    dose -> per-frame min-max normalisation (emx/scope/sim.py acquire);
  * observation: (prev, cur, action/max_shift) planes
    (emx.scope.env.StackedFresnelEnv);
  * raw reward: +-1 on improvement (em_env/fresnel_env.py:114-124),
    with the same potential-based shaping option used by
    emx.bench.dqn_run for training.

One deliberate training-time privilege: episodes place the optimum at
z=0 exactly (the physics depends only on z - z_opt, and the network
never observes z), where FresnelEnv estimates it with a focal scan.
Evaluation always goes through the scan-estimating serial env.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VecFresnelConfig:
    batch: int = 128
    image_size: int = 48
    num_specimens: int = 512
    max_shift: float = 1.0
    max_z_dist: float = 3.0
    proximity: float = 0.15
    max_episode_steps: int = 16
    defocus_per_z: float = 200.0
    wavelength: float = 0.025
    phase_strength: float = 1.0
    dose: float = 2000.0
    specimen_seed: int = 0
    # Build the pool from windows panned over large globally-normalised
    # specimen maps — the exact observation distribution of the serial
    # SimulatedMicroscope (sim.py _window pans a 4x map): window phase
    # values span less than [0,1], backgrounds are near-flat within a
    # window, discs get clipped at window edges. Training on per-crop
    # normalised independent specimens instead leaves the policy
    # saturating on ~25% of serial eval episodes (out-of-distribution
    # contrast statistics).
    windowed_pool: bool = True


class VecFresnelEnv:
    """B independent autofocus episodes stepped by one jitted call.

    step() auto-resets finished episodes; the returned transition carries
    done=True so a Q-learning target masks the bootstrap, making the
    post-reset observation safe to store as next_obs.
    """

    def __init__(self, cfg: VecFresnelConfig = VecFresnelConfig()):
        from emx.scope.sim import disc_specimen

        self.cfg = cfg
        if cfg.windowed_pool:
            rng = np.random.default_rng(cfg.specimen_seed)
            big_n = max(1, cfg.num_specimens // 32)
            big_side = 4 * cfg.image_size
            big = disc_specimen(big_n, big_side, seed=cfg.specimen_seed)
            hi = big_side - cfg.image_size
            pool = np.empty(
                (cfg.num_specimens, cfg.image_size, cfg.image_size),
                np.float32)
            for i in range(cfg.num_specimens):
                b = big[rng.integers(0, big_n)]
                cy, cx = rng.integers(0, hi, 2)
                pool[i] = b[cy:cy + cfg.image_size, cx:cx + cfg.image_size]
        else:
            pool = disc_specimen(cfg.num_specimens, cfg.image_size,
                                 seed=cfg.specimen_seed)
        self._pool = jnp.asarray(pool, jnp.float32)
        self._step = jax.jit(self._step_impl)
        self._reset = jax.jit(self._reset_impl)

    # -- batched physics (emx/scope/sim.py acquire) -------------------------
    def _acquire(self, key: jax.Array, spec: jax.Array,
                 z: jax.Array) -> jax.Array:
        from emx.physics.ctf import defocus_ctf

        cfg = self.cfg
        wave = jnp.exp(1j * cfg.phase_strength * spec).astype(jnp.complex64)
        defocus = (z * cfg.defocus_per_z)[:, None, None]
        ctf = defocus_ctf(cfg.image_size, cfg.wavelength, defocus)
        intensity = jnp.abs(jnp.fft.ifft2(jnp.fft.fft2(wave) * ctf)) ** 2
        if cfg.dose <= 0:  # noiseless camera (sim.py acquire semantics)
            counts = intensity
        else:
            mean = jnp.mean(intensity, axis=(-2, -1), keepdims=True)
            lam = intensity * (cfg.dose / jnp.maximum(mean, 1e-9))
            counts = jax.random.poisson(key, lam).astype(jnp.float32)
        lo = jnp.min(counts, axis=(-2, -1), keepdims=True)
        hi = jnp.max(counts, axis=(-2, -1), keepdims=True)
        return jnp.where(hi > lo, (counts - lo) / jnp.maximum(hi - lo, 1e-9),
                         jnp.full_like(counts, 0.5))

    def _sample_start(self, key: jax.Array, n: int):
        """Start offsets match FresnelEnv.reset: |z| ~ U(0.3, 1.0) *
        max_z_dist with random sign; random specimen per episode."""
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        mag = jax.random.uniform(k1, (n,), minval=0.3, maxval=1.0)
        sign = jnp.where(jax.random.bernoulli(k2, 0.5, (n,)), 1.0, -1.0)
        spec_idx = jax.random.randint(k3, (n,), 0, self._pool.shape[0])
        return mag * cfg.max_z_dist * sign, spec_idx

    def _obs(self, prev: jax.Array, cur: jax.Array,
             shift: jax.Array) -> jax.Array:
        plane = jnp.broadcast_to(
            (shift / max(self.cfg.max_shift, 1e-9))[:, None, None], cur.shape)
        return jnp.stack([prev, cur, plane], axis=-1)

    # -- jitted reset / step -------------------------------------------------
    def _reset_impl(self, key: jax.Array):
        cfg = self.cfg
        kz, kimg, knext = jax.random.split(key, 3)
        z, spec_idx = self._sample_start(kz, cfg.batch)
        frame = self._acquire(kimg, self._pool[spec_idx], z)
        state = {"key": knext, "z": z, "spec_idx": spec_idx, "prev": frame,
                 "steps": jnp.zeros((cfg.batch,), jnp.int32)}
        return state, self._obs(frame, frame, jnp.zeros((cfg.batch,)))

    def _step_impl(self, state: dict[str, Any], shift: jax.Array):
        cfg = self.cfg
        shift = jnp.clip(shift, -cfg.max_shift, cfg.max_shift)
        key, kimg, kz, kreset = jax.random.split(state["key"], 4)
        prev_dist = jnp.abs(state["z"])
        z = state["z"] + shift
        dist = jnp.abs(z)
        frame = self._acquire(kimg, self._pool[state["spec_idx"]], z)
        steps = state["steps"] + 1
        raw = jnp.where(dist <= prev_dist, 1.0, -1.0)
        shaped = prev_dist - dist
        solved = dist < cfg.proximity
        done = solved | (steps >= cfg.max_episode_steps)
        obs = self._obs(state["prev"], frame, shift)

        # Auto-reset the finished lanes.
        z0, spec0 = self._sample_start(kz, cfg.batch)
        frame0 = self._acquire(kreset, self._pool[spec0], z0)
        new_state = {
            "key": key,
            "z": jnp.where(done, z0, z),
            "spec_idx": jnp.where(done, spec0, state["spec_idx"]),
            "prev": jnp.where(done[:, None, None], frame0, frame),
            "steps": jnp.where(done, 0, steps),
        }
        obs_next = jnp.where(
            done[:, None, None, None],
            self._obs(frame0, frame0, jnp.zeros((cfg.batch,))), obs)
        info = {"distance": dist, "solved": solved, "raw_reward": raw}
        return new_state, obs_next, shaped, done, info

    # -- public API ----------------------------------------------------------
    def reset(self, seed: int = 0):
        return self._reset(jax.random.key(seed))

    def step(self, state, shift):
        return self._step(state, jnp.asarray(shift, jnp.float32))
