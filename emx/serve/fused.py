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
