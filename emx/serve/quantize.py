"""Post-training int8 quantization of deployment graphs.

The denoiser's deployment graph is HBM-bandwidth-bound on v5e (bench
ablations, docs/architecture.md), so int8 is a throughput lever twice
over: int8 activations halve the bytes crossing fusion boundaries vs
bf16, and the v5e MXU runs int8 matmuls at 2x bf16 peak. This module
implements static post-training quantization WITHOUT touching model
code, via flax method interception:

  * `calibrate(model, variables, batches)` — records per-conv,
    per-INPUT-CHANNEL absolute maxima (optionally a high quantile) of
    every nn.Conv input, in trace order, over a calibration set.
    Per-channel scales matter here: the folded (norm-free) deployment
    graph bakes the BatchNorm affines into the convs, so channel
    dynamic ranges differ by orders of magnitude and one per-tensor
    scale wastes most of the 8-bit grid on the widest channel.
  * `quantized_apply(model, variables, amax, mode)` — returns an
    apply_fn where every nn.Conv runs as
      mode='store': int8 round-trip on the INPUT (x -> q8 -> dq) so the
        HBM-resident tensor at the fusion boundary is int8; compute
        stays bf16. Conservative, no MXU int8 dependency.
      mode='mxu': int8 x int8 -> int32 `lax.conv_general_dilated`.
        Per-input-channel activation scales are folded INTO the weight
        before weight quantization (y = sum_c (W_oc * s_c) x_qc), so
        the integer conv itself stays a plain s8xs8->s32 op; rescale by
        the per-output-channel weight scale + bias in f32.

ConvTranspose layers (2 in the denoiser) and non-conv ops stay in the
model dtype. `skip` exempts named convs (sensitivity-ranked by
emx.bench.quant_check) so the quality-critical stem/head can stay
float while the bulk of the network runs int8. Quantization error is
checked against the f32 artifact on the val ladder before a quantized
graph can become the benched one (emx.bench.quant_check).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _conv_path(context) -> str:
    return "/".join(context.module.path)


def _is_conv(context) -> bool:
    return (isinstance(context.module, nn.Conv)
            and context.method_name == "__call__")


def calibrate(model, variables, batches, train: bool = False,
              per_channel: bool = True, quantile: float | None = None,
              return_order: bool = False):
    """Run `batches` through the model recording per-conv input ranges.

    Returns {conv_path: np.ndarray of shape (C_in,)} when `per_channel`
    (the default), else {conv_path: float}. `quantile` (e.g. 0.9995)
    clips the range at that quantile of |x| instead of the absolute
    max — trades saturation of rare outliers for a finer grid.
    One jitted pass per batch.

    `return_order`: also return the conv paths in EXECUTION order as a
    second value. (The amax dict itself is key-sorted — jit outputs are
    pytrees — so its iteration order is alphabetical, not trace order.)
    """
    records: dict[str, Any] = {}
    order: list[str] = []

    def _range(x):
        ax = jnp.abs(x.astype(jnp.float32))
        flat = ax.reshape(-1, ax.shape[-1]) if per_channel \
            else ax.reshape(-1, 1)
        if quantile is not None:
            r = jnp.quantile(flat, quantile, axis=0)
        else:
            r = jnp.max(flat, axis=0)
        return r if per_channel else r[0]

    def interceptor(next_fun, args, kwargs, context):
        if _is_conv(context):
            p = _conv_path(context)
            if p not in records:
                order.append(p)  # trace-time side channel: execution order
            m = _range(args[0])
            records[p] = jnp.maximum(records[p], m) if p in records else m
        return next_fun(*args, **kwargs)

    @jax.jit
    def run(batch):
        records.clear()
        with nn.intercept_methods(interceptor):
            out = model.apply(variables, batch, train=train)
        return out, dict(records)

    amax: dict[str, Any] = {}
    for b in batches:
        _, rec = run(b)
        for k, v in rec.items():
            v = np.asarray(v)
            amax[k] = np.maximum(amax.get(k, 0.0), v)
    amax = {k: (v if v.ndim else float(v)) for k, v in amax.items()}
    if return_order:
        return amax, list(order)
    return amax


def _scale_of(a):
    """amax entry (float | list | ndarray) -> jnp scale(s), >0-guarded."""
    s = jnp.asarray(np.asarray(a, dtype=np.float32) / 127.0)
    return jnp.maximum(s, 1e-12)


def _manual_conv(mod: nn.Conv, x, kernel, bias, compute_dtype):
    """Replicate nn.Conv's lowering so we control operand dtypes."""
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


def quantized_apply(model, variables, amax: dict[str, Any],
                    mode: str = "store",
                    skip: Iterable[str] = (),
                    capture: str | None = None) -> Callable:
    """Build an apply_fn with every nn.Conv quantized. `amax` comes from
    `calibrate` (missing entries and `skip` members leave that conv
    untouched). amax values may be per-tensor floats or per-input-
    channel arrays — per-channel scales are folded into the weights on
    the mxu path so the integer conv stays plain s8xs8->s32.

    `capture`: a conv path (or a tuple of paths); when set, apply_fn
    returns (output, unquantized_input_of_that_conv) — a tuple of inputs
    in the given order when `capture` is a tuple. Used to harvest
    intermediate features (e.g. the folded-head input, or the two
    decoder-stage concats for the 'decoder2' tail scope) from the
    deployment graph.

    mode='mxu2' extends 'mxu' to DEPTHWISE (grouped) convs: int8 input
    x int8 per-group kernel -> int32, rescaled per output channel. In
    'mxu' the depthwise convs get the storage treatment (bf16 compute),
    which keeps a bf16 tensor alive at every sepconv's internal
    boundary; at the flagship's dominant 128^2 stages those are the
    largest remaining bf16 tensors in the post-fusion HLO (round-4
    scripts/hlo_bytes.py audit)."""
    assert mode in ("store", "mxu", "mxu2")
    skip = set(skip)
    cap = ((capture,) if isinstance(capture, str)
           else tuple(capture) if capture is not None else ())
    captured: dict[str, Any] = {}

    def interceptor(next_fun, args, kwargs, context):
        if not _is_conv(context):
            return next_fun(*args, **kwargs)
        p = _conv_path(context)
        if p in cap:
            captured[p] = args[0]
        if p not in amax or p in skip or np.all(np.asarray(amax[p]) <= 0):
            return next_fun(*args, **kwargs)
        mod: nn.Conv = context.module
        x = args[0]
        grouped = mod.feature_group_count != 1
        # The mxu2 grouped path folds the per-input-channel activation
        # scale along the kernel's OUTPUT axis — valid ONLY for true
        # depthwise (one group per input channel, channel multiplier 1).
        # A grouped-but-not-depthwise conv would broadcast without error
        # and silently apply channel c's scale to the wrong group's
        # output channel (round-4 advisor finding).
        depthwise = (grouped
                     and mod.feature_group_count == x.shape[-1]
                     and mod.variables["params"]["kernel"].shape[2] == 1)
        x_scale = _scale_of(amax[p])  # () or (C_in,)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                      -127, 127).astype(jnp.int8)
        if mode == "store" or (grouped and not depthwise) or (
                mode == "mxu" and grouped):
            # Grouped (depthwise) int8 convs don't hit the MXU int8
            # path; give them the storage treatment instead.
            # int8 at the fusion boundary; compute in the model dtype.
            xdq = xq.astype(x.dtype) * x_scale.astype(x.dtype)
            return next_fun(xdq, *args[1:], **kwargs)
        kernel = mod.variables["params"]["kernel"]
        bias = mod.variables["params"].get("bias")
        # Fold the (per-input-channel) activation scale into the weight,
        # then per-output-channel symmetric weight scales:
        #   y = sum_c W[...,c,o]*(s_c*xq_c) = conv(xq, W*s_c) —
        # the int32 accumulator needs only the per-o rescale after.
        # Depthwise ('mxu2'): group o reads exactly input channel o, so
        # the per-input-channel scale folds along the OUTPUT axis of
        # the (3,3,1,C) kernel instead.
        if grouped:
            kf = kernel.astype(jnp.float32) * x_scale.reshape(1, 1, 1, -1)
        else:
            kf = kernel.astype(jnp.float32) * x_scale.reshape(1, 1, -1, 1)
        w_amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2), keepdims=True)
        w_scale = jnp.maximum(w_amax / 127.0, 1e-12)
        kq = jnp.clip(jnp.round(kf / w_scale), -127, 127).astype(jnp.int8)
        acc = _manual_conv(mod, xq, kq, None, jnp.int32)
        out = acc.astype(jnp.float32) * w_scale.reshape(-1)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)

    def apply_fn(x, train: bool = False):
        with nn.intercept_methods(interceptor):
            out = model.apply(variables, x, train=train)
        if isinstance(capture, str):
            return out, captured[capture]
        if cap:
            return out, tuple(captured[c] for c in cap)
        return out

    return apply_fn


def _ste(x, scale):
    """Fake-quantize with a straight-through gradient: forward is the
    int8 grid round-trip, backward is identity (round has zero grad)."""
    q = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_apply(model, amax: dict[str, Any], mode: str = "mxu",
                     skip: Iterable[str] = ()) -> Callable:
    """Differentiable twin of `quantized_apply` for quantization-aware
    finetuning: every nn.Conv sees fake-quantized (STE) inputs — and, in
    mxu mode, fake-quantized weights matching the deployment grid
    (activation scales folded in, per-output-channel weight scales) —
    so gradients steer the float params toward int8-robust minima.
    Returns fn(variables, x, train=False); `amax` stays fixed (static
    calibration, re-run `calibrate` after finetuning for serving)."""
    assert mode in ("store", "mxu", "mxu2")
    skip = set(skip)

    def interceptor(next_fun, args, kwargs, context):
        if not _is_conv(context):
            return next_fun(*args, **kwargs)
        p = _conv_path(context)
        if p not in amax or p in skip or np.all(np.asarray(amax[p]) <= 0):
            return next_fun(*args, **kwargs)
        mod: nn.Conv = context.module
        x = args[0]
        grouped = mod.feature_group_count != 1
        # Same true-depthwise guard as quantized_apply: the grouped
        # fake-quant grid is only the deployment grid for channel
        # multiplier 1 with one group per input channel.
        depthwise = (grouped
                     and mod.feature_group_count == x.shape[-1]
                     and mod.variables["params"]["kernel"].shape[2] == 1)
        x_scale = _scale_of(amax[p]).astype(jnp.float32)
        x_fq = _ste(x.astype(jnp.float32), x_scale)
        if mode == "store" or (grouped and not depthwise) or (
                mode == "mxu" and grouped):
            return next_fun(x_fq.astype(x.dtype), *args[1:], **kwargs)
        kernel = mod.variables["params"]["kernel"]
        bias = mod.variables["params"].get("bias")
        scale_shape = (1, 1, 1, -1) if grouped else (1, 1, -1, 1)
        kf = kernel.astype(jnp.float32) * x_scale.reshape(scale_shape)
        w_amax = jnp.max(jnp.abs(jax.lax.stop_gradient(kf)),
                         axis=(0, 1, 2), keepdims=True)
        w_scale = jnp.maximum(w_amax / 127.0, 1e-12)
        k_fq = _ste(kf, w_scale) / x_scale.reshape(scale_shape)
        out = _manual_conv(mod, x_fq, k_fq, None, jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)

    def apply_fn(variables, x, train: bool = False):
        with nn.intercept_methods(interceptor):
            return model.apply(variables, x, train=train)

    return apply_fn
