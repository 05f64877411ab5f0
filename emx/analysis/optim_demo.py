"""Optimizer sanity checks on the Rosenbrock function
(reference misc_py/rosenbrock.py:1-113 compared TF optimizers; here any
optax optimizer races to the known minimum at (1, 1))."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def rosenbrock(xy: jax.Array, a: float = 1.0, b: float = 100.0) -> jax.Array:
    x, y = xy[0], xy[1]
    return (a - x) ** 2 + b * (y - x**2) ** 2


def optimize_rosenbrock(
    optimizer: optax.GradientTransformation | None = None,
    steps: int = 2000,
    x0=(-1.5, 2.0),
):
    """Returns (trajectory, final_loss). Default optimizer: adam(2e-2)."""
    opt = optimizer or optax.adam(2e-2)
    params = jnp.asarray(x0, jnp.float32)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(rosenbrock)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    traj = [params]
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        traj.append(params)
    return jnp.stack(traj), float(rosenbrock(params))


def compare_optimizers(steps: int = 2000) -> dict[str, float]:
    """Final Rosenbrock loss per optimizer family (the reference's demo)."""
    candidates = {
        "adam": optax.adam(2e-2),
        "nesterov": optax.sgd(2e-4, momentum=0.9, nesterov=True),
        "rmsprop": optax.rmsprop(5e-3),
        "adagrad": optax.adagrad(5e-1),
    }
    return {
        name: optimize_rosenbrock(opt, steps)[1]
        for name, opt in candidates.items()
    }
