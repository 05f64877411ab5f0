"""Differentiable exit-wave + aberration fitting ("psi-art").

Gradient-descent fit of a trainable exit wave (per-pixel amplitude and
phase), axial aberration coefficients to 6th order, per-slice defocus
offsets, and per-slice translations against a measured focal series —
the workload of reference machine_learning/psi-art.py (architecture:49-86,
experiment:246-445), rebuilt as one optax loop over a single jitted,
fully-batched forward model (no per-slice Python graph assembly).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from emx.physics.ctf import Aberrations, full_ctf
from emx.recon.align import fourier_shift


@dataclasses.dataclass(frozen=True)
class AberrationFitConfig:
    wavelength: float = 0.025
    px_dim: float = 1.0
    focal_spread: float = 0.0
    convergence_angle: float = 0.0
    steps: int = 400
    learning_rate: float = 0.02
    fit_aberrations: tuple[str, ...] = ("a20", "a22", "phi22", "a40")
    fit_shifts: bool = True


def _forward(params: dict[str, Any], cfg: AberrationFitConfig, shape) -> jax.Array:
    """Predicted per-slice amplitudes |propagate(psi, CTF_i)|."""
    psi = params["amplitude"] * jnp.exp(1j * params["phase"])
    n = params["defocus"].shape[0]
    ab = Aberrations(**{k: params["aberrations"][k]
                        for k in params["aberrations"]})

    def slice_amp(df, shift):
        ab_i = ab.replace(a20=ab.a20 + df)
        ctf = full_ctf(shape, (cfg.px_dim, cfg.px_dim), cfg.wavelength, ab_i,
                       focal_spread=cfg.focal_spread,
                       convergence_angle=cfg.convergence_angle)
        out = jnp.fft.ifft2(jnp.fft.fft2(psi) * ctf)
        if cfg.fit_shifts:
            out = fourier_shift(out, shift)
        return jnp.abs(out)

    return jax.vmap(slice_amp)(params["defocus"], params["shift"])


def fit_exit_wave(
    intensities: jax.Array,
    defocus_guess: jax.Array,
    cfg: AberrationFitConfig = AberrationFitConfig(),
) -> dict[str, Any]:
    """Fit psi + aberrations to a focal series of intensities (N, H, W).

    Returns {exit_wave, params, losses}.
    """
    n, h, w = intensities.shape
    target = jnp.sqrt(jnp.maximum(intensities.astype(jnp.float32), 0.0))
    mean_amp = jnp.mean(target)
    params = {
        "amplitude": jnp.full((h, w), mean_amp, jnp.float32),
        "phase": jnp.zeros((h, w), jnp.float32),
        "defocus": defocus_guess.astype(jnp.float32),
        "shift": jnp.zeros((n, 2), jnp.float32),
        "aberrations": {k: jnp.zeros((), jnp.float32)
                        for k in cfg.fit_aberrations},
    }

    def loss_fn(p):
        pred = _forward(p, cfg, (h, w))
        return jnp.mean((pred - target) ** 2)

    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(cfg.steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))

    psi = params["amplitude"] * jnp.exp(1j * params["phase"])
    return {"exit_wave": psi, "params": params, "losses": losses}
