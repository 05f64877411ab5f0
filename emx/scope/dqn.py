"""DQN autofocus agent — flax/optax replacement for the reference's
keras-rl training script (em_env/fresnel_remover.py:93-118): a small CNN
Q-network over discretised z-shifts, epsilon-greedy exploration, replay
buffer, target network.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class QNetwork(nn.Module):
    num_actions: int
    features: tuple = (16, 32)

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:
            x = x[..., None]
        for f in self.features:
            x = nn.Conv(f, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128)(x))
        return nn.Dense(self.num_actions)(x)


@dataclasses.dataclass
class DQNConfig:
    num_actions: int = 7  # symmetric z-shift bins
    features: tuple = (16, 32)  # Q-network conv widths
    max_shift: float = 1.0
    gamma: float = 0.95
    learning_rate: float = 1e-3
    buffer_size: int = 10_000
    batch_size: int = 32
    eps_start: float = 1.0
    eps_end: float = 0.05
    eps_decay_steps: int = 2_000
    target_update_every: int = 200
    train_every: int = 1
    warmup: int = 200
    seed: int = 0
    # Double-DQN targets (argmax by the online net, value by the target
    # net) — reduces the max-operator over-estimation that makes plain
    # DQN's greedy policy drift; off by default to keep the serial
    # trainer's semantics.
    double: bool = False


class ReplayBuffer:
    def __init__(self, capacity: int, obs_shape):
        self.capacity = capacity
        self.obs = np.zeros((capacity, *obs_shape), np.float32)
        self.next_obs = np.zeros((capacity, *obs_shape), np.float32)
        self.actions = np.zeros(capacity, np.int32)
        self.rewards = np.zeros(capacity, np.float32)
        self.dones = np.zeros(capacity, np.float32)
        self.idx = 0
        self.full = False

    def add(self, obs, action, reward, next_obs, done):
        i = self.idx
        self.obs[i] = obs
        self.actions[i] = action
        self.rewards[i] = reward
        self.next_obs[i] = next_obs
        self.dones[i] = done
        self.idx = (i + 1) % self.capacity
        self.full = self.full or self.idx == 0

    def add_batch(self, obs, actions, rewards, next_obs, dones):
        n = len(actions)
        idxs = (self.idx + np.arange(n)) % self.capacity
        self.obs[idxs] = obs
        self.actions[idxs] = actions
        self.rewards[idxs] = rewards
        self.next_obs[idxs] = next_obs
        self.dones[idxs] = dones
        self.full = self.full or self.idx + n >= self.capacity
        self.idx = int((self.idx + n) % self.capacity)

    def __len__(self):
        return self.capacity if self.full else self.idx

    def sample(self, rng: np.random.Generator, n: int):
        idxs = rng.integers(0, len(self), n)
        return (self.obs[idxs], self.actions[idxs], self.rewards[idxs],
                self.next_obs[idxs], self.dones[idxs])


class DQNAgent:
    def __init__(self, obs_shape, cfg: DQNConfig = DQNConfig()):
        self.cfg = cfg
        self.net = QNetwork(cfg.num_actions, features=tuple(cfg.features))
        key = jax.random.key(cfg.seed)
        dummy = jnp.zeros((1, *obs_shape))
        self.params = self.net.init(key, dummy)
        self.target_params = self.params
        self.opt = optax.adam(cfg.learning_rate)
        self.opt_state = self.opt.init(self.params)
        self.buffer = ReplayBuffer(cfg.buffer_size, obs_shape)
        self.rng = np.random.default_rng(cfg.seed)
        self.step_count = 0
        self.train_count = 0  # gradient steps (batched path's clock)
        # Discrete action -> z shift.
        self.shifts = np.linspace(-cfg.max_shift, cfg.max_shift, cfg.num_actions)

        @jax.jit
        def q_values(params, obs):
            return self.net.apply(params, obs)

        @jax.jit
        def train_step(params, target_params, opt_state, batch):
            obs, actions, rewards, next_obs, dones = batch

            def loss_fn(p):
                q = self.net.apply(p, obs)
                q_sel = jnp.take_along_axis(q, actions[:, None], axis=1)[:, 0]
                q_tgt = self.net.apply(target_params, next_obs)
                if self.cfg.double:
                    sel = jnp.argmax(self.net.apply(p, next_obs), axis=1)
                    q_next = jnp.take_along_axis(
                        q_tgt, sel[:, None], axis=1)[:, 0]
                else:
                    q_next = jnp.max(q_tgt, axis=1)
                target = rewards + self.cfg.gamma * (1.0 - dones) * q_next
                return jnp.mean((q_sel - jax.lax.stop_gradient(target)) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        self._q_values = q_values
        self._train_step = train_step

    def epsilon(self) -> float:
        c = self.cfg
        frac = min(1.0, self.step_count / c.eps_decay_steps)
        return c.eps_start + frac * (c.eps_end - c.eps_start)

    def act(self, obs: np.ndarray, greedy: bool = False) -> int:
        if not greedy and self.rng.random() < self.epsilon():
            return int(self.rng.integers(self.cfg.num_actions))
        q = self._q_values(self.params, jnp.asarray(obs)[None])
        return int(jnp.argmax(q[0]))

    def act_batch(self, obs, greedy: bool = False) -> np.ndarray:
        """Epsilon-greedy actions for a batch of observations (one jitted
        Q evaluation for all B lanes — the VecFresnelEnv fast path)."""
        q = np.asarray(self._q_values(self.params, jnp.asarray(obs)))
        a = np.argmax(q, axis=1).astype(np.int32)
        if not greedy:
            explore = self.rng.random(len(a)) < self.epsilon()
            a = np.where(explore,
                         self.rng.integers(0, self.cfg.num_actions, len(a)),
                         a).astype(np.int32)
        return a

    def observe_batch(self, obs, actions, rewards, next_obs, dones,
                      train_steps: int = 1) -> float | None:
        """Store B transitions, advance the step count by B, and run
        `train_steps` gradient steps (each on a fresh replay sample)."""
        c = self.cfg
        self.buffer.add_batch(np.asarray(obs), np.asarray(actions),
                              np.asarray(rewards), np.asarray(next_obs),
                              np.asarray(dones, np.float32))
        self.step_count += len(actions)
        loss = None
        if len(self.buffer) >= c.warmup:
            for _ in range(train_steps):
                batch = self.buffer.sample(self.rng, c.batch_size)
                self.params, self.opt_state, loss_arr = self._train_step(
                    self.params, self.target_params, self.opt_state,
                    tuple(jnp.asarray(b) for b in batch))
                # Batched path clocks the target net in gradient steps
                # (env steps arrive B at a time, too coarse a unit).
                self.train_count += 1
                if self.train_count % c.target_update_every == 0:
                    self.target_params = self.params
            loss = float(loss_arr)
        return loss

    def observe(self, obs, action, reward, next_obs, done) -> float | None:
        c = self.cfg
        self.buffer.add(obs, action, reward, next_obs, done)
        self.step_count += 1
        loss = None
        if len(self.buffer) >= c.warmup and self.step_count % c.train_every == 0:
            batch = self.buffer.sample(self.rng, c.batch_size)
            self.params, self.opt_state, loss_arr = self._train_step(
                self.params, self.target_params, self.opt_state,
                tuple(jnp.asarray(b) for b in batch),
            )
            loss = float(loss_arr)
        if self.step_count % c.target_update_every == 0:
            self.target_params = self.params
        return loss

    def action_to_shift(self, action: int) -> float:
        return float(self.shifts[action])


def train_autofocus(env, agent: DQNAgent, episodes: int = 20) -> list[float]:
    """Run the training loop (reference fresnel_remover.py:93-106 shape).
    Returns per-episode total rewards."""
    returns = []
    for _ in range(episodes):
        obs = env.reset()
        total = 0.0
        done = False
        while not done:
            action = agent.act(obs)
            next_obs, reward, done, _ = env.step([agent.action_to_shift(action)])
            agent.observe(obs, action, reward, next_obs, done)
            obs = next_obs
            total += reward
        returns.append(total)
    return returns
