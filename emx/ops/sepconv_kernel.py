"""Pallas TPU kernel: fused separable convolution block.

The round-4 stage profile (docs/runs/flagship/stage_time.json) showed
the served denoiser is bound by XLA's conv emitters at the
128^2-resolution stages — every byte-diet lever (int8 boundaries, bf16
output, batch) measured throughput-neutral, and the 128^2 separable
stacks run at ~10% of MXU speed-of-light. This kernel fuses one
SepConvBlock body — depthwise 3x3 (+bias) -> pointwise 1x1 (+bias) ->
relu6 — into a single VMEM-resident pass per image:

  * the depthwise conv is 9 shifted multiply-adds on the VPU (no
    im2col, no intermediate HBM tensor),
  * the pointwise conv is one (rows*W, C) @ (C, Co) MXU dot per row
    tile,
  * the dw->pw intermediate never exists in HBM.

Grid is (batch,); each program holds one whole image in VMEM and walks
it in static row tiles (unrolled Python loop), so the working set for
128^2 x 128ch bf16 stays ~13 MB. Stride-1, rate-1, SAME padding only
(the deployment graph's refinement and folded-head stages). Off-TPU
callers (CPU tests) pass interpret=True; numerics are validated
against the unfused lax twin in tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sepconv_kernel(x_ref, dw_ref, dwb_ref, pw_ref, pwb_ref, out_ref,
                    *, rows: int):
    # Grid is (batch, row-tiles). The input block is the WHOLE padded
    # image but its index map ignores the tile axis, so Pallas keeps it
    # resident in VMEM across the inner grid steps (one fetch per
    # image); only the (rows, W, Co) output tile is double-buffered —
    # this is what bounds VMEM at 128-in/128-out where holding both
    # full images blew past the budget (the first on-chip failure).
    t = pl.program_id(1)
    xp = x_ref[0, pl.ds(t * rows, rows + 2)]   # (rows+2, W+2, C)
    w = xp.shape[1] - 2
    c = xp.shape[2]
    dw = dw_ref[:].astype(jnp.float32)         # (3, 3, C)
    dwb = dwb_ref[:].astype(jnp.float32)       # (C,)
    pwb = pwb_ref[:].astype(jnp.float32)       # (Co,)

    acc = jnp.zeros((rows, w, c), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            acc = acc + (xp[ky:ky + rows, kx:kx + w, :]
                         .astype(jnp.float32) * dw[ky, kx, :])
    hbuf = (acc + dwb).astype(xp.dtype)
    # Cast the pointwise weights to the activation dtype: serving
    # graphs carry f32 params over bf16 activations, and a
    # mixed-dtype dot does not lower to the MXU (the second on-chip
    # failure mode).
    y = jax.lax.dot_general(
        hbuf.reshape(rows * w, c), pw_ref[:].astype(xp.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = jnp.clip(y + pwb, 0.0, 6.0)            # bias + relu6
    out_ref[0] = y.reshape(rows, w, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def fused_sepconv(x: jax.Array, dw_kernel: jax.Array, dw_bias: jax.Array,
                  pw_kernel: jax.Array, pw_bias: jax.Array,
                  rows: int = 32, interpret: bool = False) -> jax.Array:
    """relu6(pointwise(depthwise3x3(x) + dw_bias) + pw_bias), fused.

    x: (B, H, W, C) NHWC; dw_kernel: (3, 3, 1, C) or (3, 3, C) (flax
    depthwise HWIO with I=1); pw_kernel: (1, 1, C, Co) or (C, Co).
    Returns (B, H, W, Co) in x.dtype. H must be divisible by `rows`.
    """
    b, h, w, c = x.shape
    dw = dw_kernel.reshape(3, 3, c)
    pw = pw_kernel.reshape(c, -1)
    co = pw.shape[-1]
    assert h % rows == 0, (h, rows)
    n_t = h // rows
    # SAME zero-padding happens ONCE in XLA (one cheap HBM copy per
    # call) so every row tile reads a uniform (rows+2, W+2, C) window —
    # no edge cases, no in-kernel pad (which Mosaic lowers poorly).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    return pl.pallas_call(
        functools.partial(_sepconv_kernel, rows=rows),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, c), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, w, co),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        interpret=interpret,
    )(xp, dw, dw_bias, pw, pw_bias)


def sepconv_reference(x, dw_kernel, dw_bias, pw_kernel, pw_bias):
    """The unfused twin (what SepConvBlock with norm='none' computes)."""
    b, h, w, c = x.shape
    dw = dw_kernel.reshape(3, 3, 1, c)
    pw = pw_kernel.reshape(1, 1, c, -1)
    y = jax.lax.conv_general_dilated(
        x, dw.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    y = y + dw_bias.astype(y.dtype)
    y = jax.lax.conv_general_dilated(
        y, pw.astype(y.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + pw_bias.astype(y.dtype)
    return jnp.clip(y, 0.0, 6.0)
