"""POST-fusion HBM traffic estimate of the served graph.

scripts/roofline.py reads XLA's cost analysis, which reports PRE-fusion
per-op bytes — an upper bound that says nothing about which tensors
actually materialize. This tool parses the post-optimization HLO of the
compiled deployment graph and sums, over the entry computation's
top-level instructions, the buffer bytes each instruction reads and
writes: after optimization every top-level instruction is a fusion
boundary, so operand+output bytes of top-level instructions ARE the
tensors that cross HBM (modulo VMEM-resident reuse between adjacent
ops, which XLA does not do across fusions today).

Prints per-dtype and per-op-kind totals plus the top-N heaviest
instructions — the worklist for the int8-boundary byte diet.

Usage:
    python scripts/hlo_bytes.py [bundle] [batch] [size] [platform]
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = (sys.argv[4] if len(sys.argv) > 4
                               else os.environ.get("JAX_PLATFORMS",
                                                   "axon"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
                "f64": 8, "s64": 8, "u64": 8, "c64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"(f32|f64|bf16|f16|s64|s32|s16|s8|u64|u32|u16"
                       r"|u8|pred|c64|c128)\[([0-9,]*)\]")


def shape_bytes(shape_str: str) -> dict[str, int]:
    """Bytes per dtype in a (possibly tuple) HLO shape string."""
    out: dict[str, int] = {}
    for dt, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out[dt] = out.get(dt, 0) + n * _DTYPE_BYTES[dt]
    return out


def analyze(hlo_text: str, top_n: int = 25) -> dict:
    """Traffic = sum over ENTRY-computation instructions of
    (output bytes) + (operand bytes), skipping constants/parameters as
    outputs (weights still count when read as operands)."""
    # Find the entry computation: "ENTRY %name (...) -> ... {"
    m = re.search(r"^ENTRY [^{]*\{(.*?)^\}", hlo_text,
                  re.S | re.M)
    assert m, "no ENTRY computation found"
    body = m.group(1)
    # name -> shape string of each instruction
    shapes: dict[str, str] = {}
    lines = []
    for raw in body.splitlines():
        line = raw.strip()
        mm = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\([^)]*\)|\S+) "
                      r"(\w+)\(([^)]*)\)", line)
        if not mm:
            continue
        name, shape, op, operands = mm.groups()
        shapes[name] = shape
        lines.append((name, shape, op, operands))
    by_dtype: dict[str, int] = {}
    by_op: dict[str, int] = {}
    rows = []
    total = 0
    for name, shape, op, operands in lines:
        if op in ("parameter", "constant", "get-tuple-element",
                  "bitcast", "tuple"):
            continue
        tb = shape_bytes(shape)
        # operand reads: only operands that are themselves instructions
        # with real buffers (constants count: weights stream from HBM)
        ob: dict[str, int] = {}
        for opnd in operands.split(","):
            opnd = opnd.strip().lstrip("%")
            # strip type prefix "bf16[1,2]{...} name" forms
            parts = opnd.split(" ")
            nm = parts[-1]
            if nm in shapes:
                for dt, b in shape_bytes(shapes[nm]).items():
                    ob[dt] = ob.get(dt, 0) + b
        inst_total = sum(tb.values()) + sum(ob.values())
        total += inst_total
        for dt, b in {**tb}.items():
            by_dtype[dt] = by_dtype.get(dt, 0) + b
        for dt, b in ob.items():
            by_dtype[dt] = by_dtype.get(dt, 0) + b
        by_op[op] = by_op.get(op, 0) + inst_total
        rows.append((inst_total, name, op, shape[:60]))
    rows.sort(reverse=True)
    return {"total_bytes": total, "by_dtype": by_dtype, "by_op": by_op,
            "top": [{"bytes": b, "name": n, "op": o, "shape": s}
                    for b, n, o, s in rows[:top_n]]}


def main(bundle: str = "docs/runs/flagship/artifact_int8.npz",
         batch: int = 8, size: int = 512) -> dict:
    from emx.nn import Denoiser
    from emx.serve.artifact import load_denoiser_artifact
    from emx.serve.quantize import quantized_apply

    cfg, variables, quant = load_denoiser_artifact(bundle,
                                                   with_quant=True)
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    if quant is not None:
        fn = quantized_apply(model, variables, quant["amax"],
                             quant["mode"], skip=quant.get("skip", ()))
    else:
        fn = lambda x: model.apply(variables, x, train=False)  # noqa

    x = jnp.zeros((batch, size, size), jnp.bfloat16)
    compiled = jax.jit(fn).lower(x).compile()
    res = analyze(compiled.as_text())
    res["bundle"] = bundle
    res["batch"] = batch
    res["bytes_per_img"] = res["total_bytes"] / batch
    res["metric"] = "hlo_postfusion_bytes"
    print(json.dumps(res, indent=1), flush=True)
    return res


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/flagship/artifact_int8.npz",
         int(a[1]) if len(a) > 1 else 8,
         int(a[2]) if len(a) > 2 else 512)
