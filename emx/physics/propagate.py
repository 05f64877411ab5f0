"""Fresnel propagation of electron waves by CTF multiplication in Fourier
space, with optional zero-padding to suppress wrap-around.

TPU-native version of the reference's propagate helpers
(misc_py/ewrec_class.py:108-119,450-479): operates on fft-layout kernels
(no fftshift round trips), is batched over whole focal stacks, and is
differentiable through defocus/aberrations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emx.physics.ctf import defocus_ctf


def _pad2(img: jax.Array, pad: int, value: complex = 0.0) -> jax.Array:
    if pad == 0:
        return img
    return jnp.pad(img, ((0, pad), (0, pad)), constant_values=value)


def propagate_wave(img: jax.Array, ctf: jax.Array, pad_periods: float = 0.0,
                   pad_value: complex = 0.0) -> jax.Array:
    """ifft2(fft2(pad(img)) * ctf)[:h, :w].

    `ctf` must be sized for the padded grid and in fft layout.
    """
    h, w = img.shape[-2:]
    pad = int(round(pad_periods * h))
    padded = _pad2(img.astype(jnp.complex64), pad, pad_value)
    out = jnp.fft.ifft2(jnp.fft.fft2(padded) * ctf)
    return out[..., :h, :w]


def propagate_to_focus(
    img: jax.Array,
    defocus: jax.Array | float,
    wavelength: float,
    pad_periods: float = 0.0,
    px_dim: float = 1.0,
    spher_aber_coeff: float | None = None,
) -> jax.Array:
    """Propagate a defocused wave back to the focal plane (defocus change
    is -defocus; reference misc_py/ewrec_class.py:462-470)."""
    h = img.shape[-1]
    side = int(round((1.0 + pad_periods) * h))
    ctf = defocus_ctf(side, wavelength, -jnp.asarray(defocus),
                      px_dim=(1.0 + pad_periods) * px_dim,
                      spher_aber_coeff=spher_aber_coeff)
    return propagate_wave(img, ctf, pad_periods)


def propagate_back_to_defocus(
    exit_wave: jax.Array,
    defocus: jax.Array | float,
    wavelength: float,
    pad_periods: float = 0.0,
    px_dim: float = 1.0,
    spher_aber_coeff: float | None = None,
) -> jax.Array:
    """Propagate the focal-plane exit wave out to a defocused plane
    (reference misc_py/ewrec_class.py:472-479)."""
    h = exit_wave.shape[-1]
    side = int(round((1.0 + pad_periods) * h))
    ctf = defocus_ctf(side, wavelength, jnp.asarray(defocus),
                      px_dim=(1.0 + pad_periods) * px_dim,
                      spher_aber_coeff=spher_aber_coeff)
    return propagate_wave(exit_wave, ctf, pad_periods)


def propagate_stack_to_focus(
    stack: jax.Array,
    defocuses: jax.Array,
    wavelength: float,
    pad_periods: float = 0.0,
    px_dim: float = 1.0,
) -> jax.Array:
    """vmap of propagate_to_focus over a whole focal series (N, H, W) —
    one batched FFT instead of the reference's per-image Python loop."""
    return jax.vmap(
        lambda im, df: propagate_to_focus(im, df, wavelength, pad_periods, px_dim)
    )(stack, defocuses)
