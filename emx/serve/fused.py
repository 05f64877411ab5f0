"""Serving-graph integration of the fused separable-conv Pallas kernel.

`fused_quantized_apply` builds the same int8 deployment graph as
emx.serve.quantize.quantized_apply, but SepConvBlocks that qualify
(stride 1, rate 1, folded norm, relu6, spatial size above a threshold)
run as ONE Pallas kernel (emx.ops.sepconv_kernel) instead of two XLA
convs — the round-4 stage profile showed those 128^2 stages bound the
served throughput at ~10% of MXU speed-of-light while every byte-diet
lever measured neutral. Interception nests: the SepConvBlock-level
interceptor claims qualifying blocks before the conv-level quantizer
sees their convs (the fused path computes in the model dtype, bf16 —
the pointwise loses int8 MXU rate but removes the dw->pw HBM round
trip and the per-conv emitter overhead; quant_check gates the PSNR
either way)."""

from __future__ import annotations

from typing import Any, Iterable

import flax.linen as nn
import jax.numpy as jnp

from emx.nn.blocks import SepConvBlock, relu6
from emx.ops.sepconv_kernel import fused_sepconv
from emx.serve.quantize import quantized_apply


def _qualifies(mod, x, min_pixels: int) -> bool:
    return (isinstance(mod, SepConvBlock)
            and mod.strides == 1 and mod.rate == 1
            and mod.norm == "none" and mod.activation is relu6
            and x.ndim == 4 and x.shape[1] * x.shape[2] >= min_pixels)


def load_serve_mode(bundle_path: str) -> dict | None:
    """Optional serving-mode sidecar next to a deployment bundle.

    `serve_mode.json` records serving-graph choices that do NOT change
    the bundle's bytes (the flagship bundle is single-writer through
    flagship_decision; a graph-layout preference must not re-write it):
    currently {"fused_rows": N} to run qualifying SepConvBlocks through
    the Pallas kernel. Guarded by the bundle's content hash — a stale
    sidecar next to a newly promoted bundle is ignored. Written by
    emx.bench.serve_perf when a fused variant wins at matched quality;
    honored by bench.py and emx.serve.server.serve_artifact."""
    import hashlib
    import json
    import os

    p = os.path.join(os.path.dirname(os.path.abspath(bundle_path)),
                     "serve_mode.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        mode = json.load(f)
    with open(bundle_path, "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()[:12]
    if mode.get("bundle_sha") != sha:
        return None
    return mode


def fused_quantized_apply(model, variables, amax: dict[str, Any],
                          mode: str = "mxu",
                          skip: Iterable[str] = (),
                          min_pixels: int = 16384,
                          rows: int = 32,
                          interpret: bool = False):
    """quantized_apply, with qualifying SepConvBlocks fused via Pallas.

    Returns fn(x, train=False)."""
    inner = quantized_apply(model, variables, amax, mode, skip=skip)

    def sep_interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name != "__call__"
                or not _qualifies(mod, args[0], min_pixels)):
            return next_fun(*args, **kwargs)
        p = mod.variables["params"]
        x = args[0]
        # fused_sepconv tiles whole row-bands: pick the largest divisor
        # of H that fits the requested band height, and fall back to the
        # unfused path when none does (a non-default serve tile, e.g.
        # 544 -> 136-row stages, must degrade gracefully rather than
        # assert at trace time — round-4 advisor finding).
        h = x.shape[1]
        r = min(rows, h)
        while r > 1 and h % r:
            r -= 1
        if h % r:
            return next_fun(*args, **kwargs)
        return fused_sepconv(
            x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
            p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
            rows=r, interpret=interpret,
        ).astype(x.dtype)

    def apply_fn(x, train: bool = False):
        with nn.intercept_methods(sep_interceptor):
            return inner(x, train=train)

    return apply_fn


def dense_quantized_apply(model, variables, amax: dict[str, Any],
                          mode: str = "mxu",
                          skip: Iterable[str] = (),
                          min_pixels: int = 16384,
                          quantized: bool = True):
    """quantized_apply, with qualifying SepConvBlocks' depthwise ->
    pointwise pair FOLDED into one dense 3x3 conv.

    The pair is linear (no nonlinearity between SepConvBlock's two
    convs, emx/nn/blocks.py:85-115), so

      K[ky,kx,ci,co] = dw[ky,kx,0,ci] * pw[0,0,ci,co]
      b[co]          = pw_b[co] + sum_ci dw_b[ci] * pw[0,0,ci,co]

    is exact in float arithmetic. FLOPs rise by 9*Co/(9+Co) (~8.4x at
    C=Co=128) — but the dense conv is MXU-shaped (im2col -> one big
    int8 matmul by XLA's own emitter) where the separable pair is
    VPU/emitter-bound at ~10-15% of peak (round-4 stage profile,
    docs/runs/flagship/stage_time.json), and the dw->pw intermediate
    plus the depthwise's bf16 'store'-mode boundary disappear entirely.
    This is the round-4 verdict's MXU-oriented second attack, expressed
    through XLA instead of a hand kernel (the hand-scheduled Pallas
    fusion measured 2.5x slower than XLA's emitters — commit e506ee6).

    `quantized=True` runs the folded conv on the int8 MXU path: the
    depthwise input's per-channel activation scale (amax of the block's
    Conv_0) folds into K along ci, weights get per-output-channel
    symmetric scales — the exact treatment quantized_apply gives dense
    convs. quantized=False keeps the folded conv in the model dtype
    (bf16) for an apples-to-apples ablation. PSNR is re-gated by
    serve_perf either way (the folded int8 grid differs from the
    two-stage one)."""
    import jax

    from emx.serve.quantize import _scale_of

    inner = quantized_apply(model, variables, amax, mode, skip=skip)

    def dense_interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name != "__call__"
                or not _qualifies(mod, args[0], min_pixels)):
            return next_fun(*args, **kwargs)
        x = args[0]
        p = mod.variables["params"]
        dw_path = "/".join(mod.path + ("Conv_0",))
        c = x.shape[-1]
        dw = p["Conv_0"]["kernel"].reshape(3, 3, c).astype(jnp.float32)
        dwb = p["Conv_0"]["bias"].astype(jnp.float32)
        pw = p["Conv_1"]["kernel"].reshape(c, -1).astype(jnp.float32)
        pwb = p["Conv_1"]["bias"].astype(jnp.float32)
        k = dw[:, :, :, None] * pw[None, None]          # (3, 3, C, Co)
        b = pwb + dwb @ pw                              # (Co,)
        dn = ("NHWC", "HWIO", "NHWC")
        if quantized and dw_path in amax and dw_path not in skip:
            x_scale = _scale_of(amax[dw_path])          # () or (C,)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                          -127, 127).astype(jnp.int8)
            kf = k * jnp.asarray(x_scale).reshape(1, 1, -1, 1)
            w_amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2), keepdims=True)
            w_scale = jnp.maximum(w_amax / 127.0, 1e-12)
            kq = jnp.clip(jnp.round(kf / w_scale),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, kq, window_strides=(1, 1), padding="SAME",
                dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * w_scale.reshape(-1) + b
        else:
            acc = jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), window_strides=(1, 1),
                padding="SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            y = acc + b
        return jnp.clip(y, 0.0, 6.0).astype(x.dtype)

    def apply_fn(x, train: bool = False):
        with nn.intercept_methods(dense_interceptor):
            return inner(x, train=train)

    return apply_fn
