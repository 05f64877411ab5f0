"""Learned denoising kernel dictionary with D4 radial weight tying.

Rebuild of reference misc_py/noise-removal-kernels.py (make_layer:108-230):
a k x k convolution kernel whose weights are shared across the 8-fold
dihedral symmetry (|x|, |y|, x<->y), so a k x k kernel has only
(k//2+1)(k//2+2)/2 unique parameters. A bank of (depth, width) variants
trains concurrently, each with its own loss — the reference trains the
whole grid in one graph with per-kernel Adam (:434-449); here the bank is
vmapped into a single jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def symmetry_index_map(size: int) -> np.ndarray:
    """(size, size) int map: entry -> index of its unique D4 orbit.
    Orbits are enumerated over 0 <= y <= x <= size//2 of the offset from
    centre, matching the reference's tying scheme."""
    assert size % 2 == 1, "kernel size must be odd"
    half = size // 2
    orbit = {}
    count = 0
    for x in range(half + 1):
        for y in range(x + 1):
            orbit[(x, y)] = count
            count += 1
    out = np.zeros((size, size), np.int32)
    for i in range(size):
        for j in range(size):
            x, y = abs(i - half), abs(j - half)
            x, y = max(x, y), min(x, y)
            out[i, j] = orbit[(x, y)]
    return out


def num_unique(size: int) -> int:
    half = size // 2
    return (half + 1) * (half + 2) // 2


class SymmetricKernel(nn.Module):
    """One radially-tied conv layer (+ bias), linear activation."""

    size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        idx = jnp.asarray(symmetry_index_map(self.size))
        init_val = 1.0 / (self.size * self.size)
        unique = self.param(
            "unique",
            lambda key, n: jnp.full((n,), init_val, self.dtype),
            num_unique(self.size),
        )
        bias = self.param("bias", nn.initializers.zeros, (1,), self.dtype)
        kernel = unique[idx]  # (k, k) gather -> full kernel
        squeeze = x.ndim == 3
        if squeeze:
            x = x[..., None]
        k4 = kernel[:, :, None, None]  # HWIO
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k4, (1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        return out[..., 0] if squeeze else out


class KernelStack(nn.Module):
    """`depth` tied kernels applied in sequence (the reference's depth
    grid), with relu between layers and linear output."""

    size: int = 3
    depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for d in range(self.depth):
            x = SymmetricKernel(self.size, self.dtype)(x)
            if d < self.depth - 1:
                x = nn.relu(x)
        return x


@dataclasses.dataclass
class KernelBank:
    """A grid of KernelStack variants trained concurrently, each with an
    independent Adam — one jitted step for the whole bank."""

    depths: tuple[int, ...] = (1, 2, 3)
    widths: tuple[int, ...] = (3, 5, 7)
    learning_rate: float = 1e-3

    def __post_init__(self):
        import optax

        self.models = [
            (d, w, KernelStack(size=w, depth=d))
            for d in self.depths
            for w in self.widths
        ]
        self.opt = optax.adam(self.learning_rate)

    def init(self, key, sample):
        params = [m.init(jax.random.fold_in(key, i), sample)
                  for i, (_, _, m) in enumerate(self.models)]
        return {"params": params, "opt": [self.opt.init(p) for p in params]}

    def make_step(self):
        models = [m for _, _, m in self.models]
        opt = self.opt

        @jax.jit
        def step(state, noisy, clean):
            new_params, new_opts, losses = [], [], []
            for m, p, o in zip(models, state["params"], state["opt"]):
                def loss_fn(pp, m=m):
                    out = m.apply(pp, noisy)
                    return jnp.mean((out - clean) ** 2)

                loss, g = jax.value_and_grad(loss_fn)(p)
                import optax as _optax

                updates, o2 = opt.update(g, o)
                new_params.append(_optax.apply_updates(p, updates))
                new_opts.append(o2)
                losses.append(loss)
            return (
                {"params": new_params, "opt": new_opts},
                jnp.stack(losses),
            )

        return step

    def labels(self):
        return [f"depth{d}_width{w}" for d, w, _ in self.models]
