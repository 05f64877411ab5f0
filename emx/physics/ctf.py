"""Contrast-transfer-function physics as pure JAX.

Covers both CTF models used by the reference:
  * the simple defocus(+Cs) kernel of the EWREC reconstructor
    (reference misc_py/ewrec_class.py:423-448), and
  * the full 6th-order aberration polynomial chi with spatial/temporal
    envelopes of the differentiable exit-wave fitter
    (reference machine_learning/psi-art.py:88-223).

Everything is jit/vmap/grad-safe and returns fft-layout (unshifted)
kernels so they can be applied directly after `jnp.fft.fft2`.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

# Aberration polynomial symbols: magnitude a_nm and azimuth phi_nm.
ABERRATION_MAGNITUDES = (
    "a20", "a22", "a31", "a33", "a40", "a42", "a44",
    "a51", "a53", "a55", "a60", "a62", "a64", "a66",
)
ABERRATION_ANGLES = (
    "phi22", "phi31", "phi33", "phi42", "phi44",
    "phi51", "phi53", "phi55", "phi62", "phi64", "phi66",
)


def energy_to_wavelength(v0_kev: float) -> float:
    """Relativistic electron wavelength in Angstroms for energy in keV
    (reference machine_learning/psi-art.py:88-95)."""
    m0 = 0.5109989461e3  # keV / c^2
    h = 4.135667662e-18  # keV * s
    c = 2.99792458e8  # m / s
    return h * c / math.sqrt(v0_kev * (2 * m0 + v0_kev)) * 1e10


def spatial_frequencies(shape: tuple[int, int], sampling: tuple[float, float]):
    """Return (kx, ky, k2) in fft layout for a real-space grid of
    `shape` pixels with `sampling` (px size) in the same length unit
    as the wavelength (typically Angstroms)."""
    kx = jnp.fft.fftfreq(shape[0], d=sampling[0])
    ky = jnp.fft.fftfreq(shape[1], d=sampling[1])
    kx, ky = jnp.meshgrid(kx, ky, indexing="ij")
    return kx, ky, kx**2 + ky**2


def defocus_ctf(
    side: int,
    wavelength: float,
    defocus_change: jax.Array | float,
    px_dim: float = 1.0,
    spher_aber_coeff: float | None = None,
    aperture_mask: jax.Array | None = None,
) -> jax.Array:
    """Simple defocus CTF: exp(i * (pi*lambda*df*|k|^2 [+ 0.5*pi*lambda^3*Cs*|k|^4])).

    Same kernel as the EWREC reconstructor's transfer function
    (reference misc_py/ewrec_class.py:423-448), but returned in fft
    layout (no fftshift round-trip needed). Differentiable in
    `defocus_change` so defocus can be fitted by gradient descent.
    """
    _, _, k2 = spatial_frequencies((side, side), (px_dim, px_dim))
    phase = (jnp.pi * wavelength * defocus_change) * k2
    if spher_aber_coeff is not None:
        phase = phase + 0.5 * jnp.pi * wavelength**3 * spher_aber_coeff * k2**2
    ctf = jnp.exp(1j * phase).astype(jnp.complex64)
    if aperture_mask is not None:
        ctf = ctf * aperture_mask
    return ctf


@dataclasses.dataclass
class Aberrations:
    """Axial aberration coefficients up to 6th order (lengths in the same
    unit as wavelength; angles in radians). a20 is defocus, a40 ~ Cs.

    A pytree — register so coefficients can be optimised directly.
    """

    a20: jax.Array | float = 0.0
    a22: jax.Array | float = 0.0
    a31: jax.Array | float = 0.0
    a33: jax.Array | float = 0.0
    a40: jax.Array | float = 0.0
    a42: jax.Array | float = 0.0
    a44: jax.Array | float = 0.0
    a51: jax.Array | float = 0.0
    a53: jax.Array | float = 0.0
    a55: jax.Array | float = 0.0
    a60: jax.Array | float = 0.0
    a62: jax.Array | float = 0.0
    a64: jax.Array | float = 0.0
    a66: jax.Array | float = 0.0
    phi22: jax.Array | float = 0.0
    phi31: jax.Array | float = 0.0
    phi33: jax.Array | float = 0.0
    phi42: jax.Array | float = 0.0
    phi44: jax.Array | float = 0.0
    phi51: jax.Array | float = 0.0
    phi53: jax.Array | float = 0.0
    phi55: jax.Array | float = 0.0
    phi62: jax.Array | float = 0.0
    phi64: jax.Array | float = 0.0
    phi66: jax.Array | float = 0.0

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


jax.tree_util.register_dataclass(
    Aberrations,
    data_fields=list(ABERRATION_MAGNITUDES) + list(ABERRATION_ANGLES),
    meta_fields=[],
)


def aberration_chi(theta, phi, wavelength, ab: Aberrations):
    """Aberration phase chi(theta, phi): the 6th-order polynomial of
    reference machine_learning/psi-art.py:189-205."""
    cos = jnp.cos
    chi = (
        (1 / 2.0) * (ab.a22 * cos(2 * (phi - ab.phi22)) + ab.a20) * theta**2
        + (1 / 3.0)
        * (ab.a33 * cos(3 * (phi - ab.phi33)) + ab.a31 * cos(phi - ab.phi31))
        * theta**3
        + (1 / 4.0)
        * (
            ab.a44 * cos(4 * (phi - ab.phi44))
            + ab.a42 * cos(2 * (phi - ab.phi42))
            + ab.a40
        )
        * theta**4
        + (1 / 5.0)
        * (
            ab.a55 * cos(5 * (phi - ab.phi55))
            + ab.a53 * cos(3 * (phi - ab.phi53))
            + ab.a51 * cos(phi - ab.phi51)
        )
        * theta**5
        + (1 / 6.0)
        * (
            ab.a66 * cos(6 * (phi - ab.phi66))
            + ab.a64 * cos(4 * (phi - ab.phi64))
            + ab.a62 * cos(2 * (phi - ab.phi62))
            + ab.a60
        )
        * theta**6
    )
    return chi * (2.0 * jnp.pi / wavelength)


def temporal_envelope(theta, wavelength, focal_spread):
    """Partial temporal coherence envelope
    (reference machine_learning/psi-art.py:171-176)."""
    return jnp.exp(
        -jnp.sign(focal_spread)
        * (0.5 * jnp.pi / wavelength * focal_spread * theta**2) ** 2
    )


def spatial_envelope(theta, phi, wavelength, ab: Aberrations, convergence_angle):
    """Partial spatial coherence envelope from the chi gradient
    (reference machine_learning/psi-art.py:132-169)."""
    sin, cos = jnp.sin, jnp.cos
    dchi_dq = (2 * jnp.pi / wavelength) * (
        (ab.a22 * cos(2 * (phi - ab.phi22)) + ab.a20) * theta
        + (ab.a33 * cos(3 * (phi - ab.phi33)) + ab.a31 * cos(phi - ab.phi31))
        * theta**2
        + (
            ab.a44 * cos(4 * (phi - ab.phi44))
            + ab.a42 * cos(2 * (phi - ab.phi42))
            + ab.a40
        )
        * theta**3
        + (
            ab.a55 * cos(5 * (phi - ab.phi55))
            + ab.a53 * cos(3 * (phi - ab.phi53))
            + ab.a51 * cos(phi - ab.phi51)
        )
        * theta**4
        + (
            ab.a66 * cos(6 * (phi - ab.phi66))
            + ab.a64 * cos(4 * (phi - ab.phi64))
            + ab.a62 * cos(2 * (phi - ab.phi62))
            + ab.a60
        )
        * theta**5
    )
    dchi_dphi = (-2 * jnp.pi / wavelength) * (
        (1 / 2.0) * (2 * ab.a22 * sin(2 * (phi - ab.phi22))) * theta
        + (1 / 3.0)
        * (3 * ab.a33 * sin(3 * (phi - ab.phi33)) + ab.a31 * sin(phi - ab.phi31))
        * theta**2
        + (1 / 4.0)
        * (4 * ab.a44 * sin(4 * (phi - ab.phi44)) + 2 * ab.a42 * sin(2 * (phi - ab.phi42)))
        * theta**3
        + (1 / 5.0)
        * (
            5 * ab.a55 * sin(5 * (phi - ab.phi55))
            + 3 * ab.a53 * sin(3 * (phi - ab.phi53))
            + ab.a51 * sin(phi - ab.phi51)
        )
        * theta**4
        + (1 / 6.0)
        * (
            6 * ab.a66 * sin(6 * (phi - ab.phi66))
            + 4 * ab.a64 * sin(4 * (phi - ab.phi64))
            + 2 * ab.a62 * sin(2 * (phi - ab.phi62))
        )
        * theta**5
    )
    return jnp.exp(
        -jnp.sign(convergence_angle)
        * (convergence_angle / 2.0) ** 2
        * (dchi_dq**2 + dchi_dphi**2)
    )


def aperture_envelope(theta, aperture, aperture_edge=0.0):
    """Objective-aperture mask with an optional smooth (raised-cosine) edge
    (reference machine_learning/psi-art.py:178-187)."""
    inside = (theta <= aperture).astype(jnp.float32)
    if aperture_edge > 0.0:
        in_edge = (theta > aperture) & (theta < aperture + aperture_edge)
        edge_val = 0.5 * (1 + jnp.cos(jnp.pi * (theta - aperture) / aperture_edge))
        return jnp.where(in_edge, edge_val, inside)
    return inside


def full_ctf(
    shape: tuple[int, int],
    sampling: tuple[float, float],
    wavelength: float,
    ab: Aberrations,
    focal_spread: float | jax.Array = 0.0,
    convergence_angle: float | jax.Array = 0.0,
    aperture: float | None = None,
    aperture_edge: float = 0.0,
) -> jax.Array:
    """CTF = exp(-i chi) * temporal * spatial * aperture, in fft layout
    (reference machine_learning/psi-art.py:207-223)."""
    kx, ky, k2 = spatial_frequencies(shape, sampling)
    theta = jnp.sqrt(k2) * wavelength
    phi = jnp.arctan2(ky, kx)
    ctf = jnp.exp(-1j * aberration_chi(theta, phi, wavelength, ab))
    ctf = ctf * temporal_envelope(theta, wavelength, focal_spread)
    ctf = ctf * spatial_envelope(theta, phi, wavelength, ab, convergence_angle)
    if aperture is not None:
        ctf = ctf * aperture_envelope(theta, aperture, aperture_edge)
    return ctf.astype(jnp.complex64)
