"""Focal-series alignment: batched FFT phase correlation + chained shifts.

Rebuilds the reference's alignment paths — GPU phase correlation
(misc_py/ewrec_class.py af_phase_corr:121-129, rel_pos_estimate:342-421)
and the MATLAB per-pair transform chaining with common-crop limits
(misc_py/evolutionary_align.m:1-80, misc_py/warp_stack.m:21-60) — as pure
JAX with subpixel (parabolic) peak interpolation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def phase_correlation(a: jax.Array, b: jax.Array) -> jax.Array:
    """Translation (dy, dx) that maps `b` onto `a`, subpixel via
    3-point parabolic interpolation around the correlation peak."""
    fa = jnp.fft.fft2(a)
    fb = jnp.fft.fft2(b)
    cross = fa * jnp.conj(fb)
    r = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    corr = jnp.abs(jnp.fft.ifft2(r))
    h, w = corr.shape
    idx = jnp.argmax(corr)
    py, px = idx // w, idx % w

    def parabolic(cm, c0, cp):
        denom = cm - 2 * c0 + cp
        return jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (cm - cp) / denom, 0.0)

    cy = parabolic(corr[(py - 1) % h, px], corr[py, px], corr[(py + 1) % h, px])
    cx = parabolic(corr[py, (px - 1) % w], corr[py, px], corr[py, (px + 1) % w])
    dy = py + cy
    dx = px + cx
    # Wrap to signed shifts.
    dy = jnp.where(dy > h / 2, dy - h, dy)
    dx = jnp.where(dx > w / 2, dx - w, dx)
    # Convention: return d with b(x) = a(x - d), i.e. b is a displaced by +d.
    return -jnp.stack([dy, dx])


def fourier_shift(img: jax.Array, shift: jax.Array) -> jax.Array:
    """Subpixel translation by Fourier phase ramp (periodic boundary)."""
    h, w = img.shape[-2:]
    ky = jnp.fft.fftfreq(h)[:, None]
    kx = jnp.fft.fftfreq(w)[None, :]
    phase = jnp.exp(-2j * jnp.pi * (shift[0] * ky + shift[1] * kx))
    out = jnp.fft.ifft2(jnp.fft.fft2(img) * phase)
    return out.real if jnp.isrealobj(img) else out


def relative_positions(stack: jax.Array) -> jax.Array:
    """Per-slice shifts relative to the middle image by chaining
    neighbouring pairwise phase correlations (warp_stack.m semantics:
    transforms composed outward from the centre slice)."""
    n = stack.shape[0]
    mid = n // 2
    pair = jax.vmap(phase_correlation)(stack[:-1], stack[1:])  # (n-1, 2)
    shifts = [jnp.zeros(2)] * n

    def chain(start, stop, step):
        acc = jnp.zeros(2)
        for i in range(start, stop, step):
            if step > 0:
                acc = acc + pair[i - 1]  # shift of i relative to i-1
            else:
                acc = acc - pair[i]
            shifts[i] = acc

    chain(mid + 1, n, 1)
    chain(mid - 1, -1, -1)
    return jnp.stack(shifts)


def align_stack(stack: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Align every slice to the middle image. Returns (aligned, shifts)."""
    shifts = relative_positions(stack)
    aligned = jax.vmap(fourier_shift)(stack, -shifts)
    return aligned, shifts


def affine_warp(img: jax.Array, matrix: jax.Array, offset: jax.Array,
                order: int = 1) -> jax.Array:
    """Sample img at A @ [y, x] + t (output coords -> input coords).
    matrix: (2, 2), offset: (2,). Bilinear by default."""
    from jax.scipy.ndimage import map_coordinates

    h, w = img.shape[-2:]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([yy.ravel(), xx.ravel()])  # (2, h*w)
    src = matrix @ coords + offset[:, None]
    out = map_coordinates(img, [src[0], src[1]], order=order, mode="nearest")
    return out.reshape(h, w)


def register_affine(
    fixed: jax.Array,
    moving: jax.Array,
    steps: int = 200,
    learning_rate: float = 1e-2,
    init_shift: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Gradient-descent affine registration of `moving` onto `fixed`
    (the imregtform 'affine' capability of reference
    misc_py/evolutionary_align.m:1-80, minus the MATLAB toolbox):
    minimises masked MSE over (A, t), seeded by phase correlation.
    Returns (matrix, offset, warped)."""
    import optax

    fixed = fixed.astype(jnp.float32)
    moving = moving.astype(jnp.float32)
    if init_shift is None:
        init_shift = phase_correlation(fixed, moving)
    params = {
        "matrix": jnp.eye(2, dtype=jnp.float32),
        "offset": jnp.asarray(init_shift, jnp.float32),
    }

    # Interior mask downweights wrapped/extrapolated borders.
    h, w = fixed.shape
    m = int(0.05 * min(h, w)) + 1
    mask = jnp.zeros((h, w)).at[m:-m, m:-m].set(1.0)

    def loss_fn(p):
        warped = affine_warp(moving, p["matrix"], p["offset"])
        return jnp.sum(mask * (warped - fixed) ** 2) / jnp.sum(mask)

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(steps):
        params, opt_state, _ = step(params, opt_state)
    warped = affine_warp(moving, params["matrix"], params["offset"])
    return params["matrix"], params["offset"], warped


def align_stack_affine(stack: jax.Array, steps: int = 150,
                       learning_rate: float = 1e-2):
    """Affine-align every slice to the middle image by composing pairwise
    registrations outward from the centre (warp_stack.m:21-60 chained
    transforms). Returns (aligned, transforms) with transforms a list of
    (matrix, offset) mapping each slice onto the middle frame."""
    n = stack.shape[0]
    mid = n // 2
    eye = (jnp.eye(2), jnp.zeros(2))
    transforms: list[tuple[jax.Array, jax.Array]] = [eye] * n

    def compose(a1, t1, a2, t2):
        # warp(x; a1,t1) then warp(.; a2,t2) == warp(x; a1@a2?, ...)
        # Our warp samples moving at A y + t: composing "align i->i-1"
        # (A1,t1) with "align i-1->mid" (A2,t2): sample moving at
        # A1 (A2 y + t2) + t1.
        return a1 @ a2, a1 @ t2 + t1

    # Outward from the middle.
    for i in range(mid + 1, n):
        a, t, _ = register_affine(stack[i - 1], stack[i], steps, learning_rate)
        pa, pt = transforms[i - 1]
        transforms[i] = compose(a, t, pa, pt)
    for i in range(mid - 1, -1, -1):
        a, t, _ = register_affine(stack[i + 1], stack[i], steps, learning_rate)
        pa, pt = transforms[i + 1]
        transforms[i] = compose(a, t, pa, pt)

    aligned = jnp.stack([
        affine_warp(stack[i], transforms[i][0], transforms[i][1])
        for i in range(n)
    ])
    return aligned, transforms


def common_crop_slices(shifts, shape: tuple[int, int]) -> tuple[slice, slice]:
    """Pixel region valid in every shifted slice (warp_stack.m:21-60)."""
    import numpy as np

    s = np.asarray(shifts)
    top = int(np.ceil(max(0, -s[:, 0].min())))
    bot = int(np.floor(min(shape[0], shape[0] - s[:, 0].max())))
    left = int(np.ceil(max(0, -s[:, 1].min())))
    right = int(np.floor(min(shape[1], shape[1] - s[:, 1].max())))
    return slice(top, max(top + 1, bot)), slice(left, max(left + 1, right))
