"""Post-training int8 quantization of deployment graphs.

The denoiser's deployment graph is HBM-bandwidth-bound on v5e (bench
ablations, docs/architecture.md), so int8 is a throughput lever twice
over: int8 activations halve the bytes crossing fusion boundaries vs
bf16, and the v5e MXU runs int8 matmuls at 2x bf16 peak. This module
implements static post-training quantization WITHOUT touching model
code, via flax method interception:

  * `calibrate(model, variables, batches)` — records the absolute max
    of every nn.Conv input (per conv, in trace order) over a
    calibration set.
  * `quantized_apply(model, variables, amax, mode)` — returns an
    apply_fn where every nn.Conv runs as
      mode='store': int8 round-trip on the INPUT (x -> q8 -> dq) so the
        HBM-resident tensor at the fusion boundary is int8; compute
        stays bf16. Conservative, no MXU int8 dependency.
      mode='mxu': int8 x int8 -> int32 `lax.conv_general_dilated`
        (per-output-channel weight scales, per-tensor input scale),
        rescale + bias in f32. Uses the MXU int8 path.

ConvTranspose layers (2 in the denoiser) and non-conv ops stay in the
model dtype. Quantization error is checked against the f32 artifact on
the val ladder before a quantized graph can become the benched one
(emx.bench.quant_check).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv_path(context) -> str:
    return "/".join(context.module.path)


def _is_conv(context) -> bool:
    return (isinstance(context.module, nn.Conv)
            and context.method_name == "__call__")


def calibrate(model, variables, batches, train: bool = False):
    """Run `batches` through the model recording per-conv input amax.
    Returns {conv_path: float}. One jitted pass per batch."""
    records: dict[str, Any] = {}

    def interceptor(next_fun, args, kwargs, context):
        if _is_conv(context):
            p = _conv_path(context)
            m = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
            records[p] = jnp.maximum(records[p], m) if p in records else m
        return next_fun(*args, **kwargs)

    @jax.jit
    def run(batch):
        records.clear()
        with nn.intercept_methods(interceptor):
            out = model.apply(variables, batch, train=train)
        return out, dict(records)

    amax: dict[str, float] = {}
    for b in batches:
        _, rec = run(b)
        for k, v in rec.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    return amax


def _quant_tensor(x, scale):
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8)


def _manual_conv(mod: nn.Conv, x, kernel, bias, compute_dtype):
    """Replicate nn.Conv's lowering so we control operand dtypes."""
    kh, kw = mod.kernel_size
    strides = mod.strides if isinstance(mod.strides, tuple) \
        else (mod.strides, mod.strides)
    dil = mod.kernel_dilation if isinstance(mod.kernel_dilation, tuple) \
        else (mod.kernel_dilation or 1,) * 2
    pad = mod.padding
    if isinstance(pad, str):
        padding = pad
    else:
        padding = [(p, p) if isinstance(p, int) else p for p in pad]
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=compute_dtype,
    )
    if bias is not None:
        out = out + bias.reshape((1,) * (out.ndim - 1) + (-1,)).astype(
            out.dtype)
    return out


def quantized_apply(model, variables, amax: dict[str, float],
                    mode: str = "store") -> Callable:
    """Build an apply_fn with every nn.Conv quantized. `amax` comes from
    `calibrate` (missing entries leave that conv untouched)."""
    assert mode in ("store", "mxu")

    def interceptor(next_fun, args, kwargs, context):
        if not _is_conv(context):
            return next_fun(*args, **kwargs)
        p = _conv_path(context)
        if p not in amax or amax[p] <= 0:
            return next_fun(*args, **kwargs)
        mod: nn.Conv = context.module
        x = args[0]
        x_scale = jnp.float32(amax[p] / 127.0)
        xq = _quant_tensor(x, x_scale)
        if mode == "store" or (mode == "mxu"
                               and mod.feature_group_count != 1):
            # Grouped (depthwise) int8 convs don't hit the MXU int8
            # path; give them the storage treatment instead.
            # int8 at the fusion boundary; compute in the model dtype.
            xdq = xq.astype(x.dtype) * x_scale.astype(x.dtype)
            return next_fun(xdq, *args[1:], **kwargs)
        kernel = mod.variables["params"]["kernel"]
        bias = mod.variables["params"].get("bias")
        # Per-output-channel symmetric weight scales.
        kf = kernel.astype(jnp.float32)
        w_amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2), keepdims=True)
        w_scale = jnp.maximum(w_amax / 127.0, 1e-12)
        kq = jnp.clip(jnp.round(kf / w_scale), -127, 127).astype(jnp.int8)
        acc = _manual_conv(mod, xq, kq, None, jnp.int32)
        out = acc.astype(jnp.float32) * (x_scale * w_scale.reshape(-1))
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)

    def apply_fn(x, train: bool = False):
        with nn.intercept_methods(interceptor):
            return model.apply(variables, x, train=train)

    return apply_fn
