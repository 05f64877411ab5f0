"""Fresnel-fringe presence classifier.

Capability rebuild of reference em_env/fresnel_transfer_cnn.py (a VGG19
transfer-learned binary classifier for fringe presence). No pretrained
VGG exists in a zero-egress environment; instead a compact flax CNN
trains directly on simulator-labelled data (in-focus vs defocused frames
from emx.scope.sim) — the simulator is the source of truth for the
protocol anyway (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class FringeClassifier(nn.Module):
    features: tuple[int, ...] = (16, 32, 64)

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:
            x = x[..., None]
        h = x
        for f in self.features:
            h = nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME")(h)
            h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))
        h = nn.relu(nn.Dense(64)(h))
        return nn.Dense(1)(h)[..., 0]  # logit: fringes present


@dataclasses.dataclass
class FringeTrainResult:
    params: dict
    losses: list
    accuracy: float


def collect_fringe_dataset(scope, n_per_class: int = 64,
                           defocus_range=(1.5, 3.0), seed: int = 0):
    """Label frames from the simulator: z at optimum -> 0, defocused -> 1."""
    rng = np.random.default_rng(seed)
    imgs, labels = [], []
    for _ in range(n_per_class):
        scope.x = float(rng.uniform(0, 128))
        scope.y = float(rng.uniform(0, 128))
        scope.z = scope.optimal_z + rng.uniform(-0.05, 0.05)
        imgs.append(scope.acquire())
        labels.append(0.0)
        sign = 1 if rng.random() > 0.5 else -1
        scope.z = scope.optimal_z + sign * rng.uniform(*defocus_range)
        imgs.append(scope.acquire())
        labels.append(1.0)
    return np.stack(imgs).astype(np.float32), np.asarray(labels, np.float32)


def train_fringe_classifier(
    imgs: np.ndarray, labels: np.ndarray, steps: int = 200,
    learning_rate: float = 1e-3, batch_size: int = 32, seed: int = 0,
) -> FringeTrainResult:
    model = FringeClassifier()
    key = jax.random.key(seed)
    params = model.init(key, jnp.asarray(imgs[:1]))["params"]
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)
    x_all = jnp.asarray(imgs)
    y_all = jnp.asarray(labels)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    for _ in range(steps):
        idx = rng.integers(0, len(imgs), batch_size)
        params, opt_state, loss = step(params, opt_state, x_all[idx], y_all[idx])
        losses.append(float(loss))

    logits = model.apply({"params": params}, x_all)
    acc = float(jnp.mean((logits > 0) == (y_all > 0.5)))
    return FringeTrainResult(params=params, losses=losses, accuracy=acc)
