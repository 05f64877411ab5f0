"""Cumulative stage timing of the served graph via capture + DCE.

quantized_apply(capture=path) returns (out, captured); jitting a
function that uses ONLY the captured tensor lets XLA dead-code-
eliminate everything after that conv — so throughput of successive
capture points gives a cumulative time profile of the deployment graph
without touching model code. Identifies which region (encoder, middle,
decoder, folded head) bounds the 5.4k img/s measurement (round-4
finding: int8-boundary byte diets are throughput-neutral, so the time
must be in specific kernels, not fusion-boundary traffic).

Usage: python scripts/stage_time.py [bundle] [batch]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(bundle: str = "docs/runs/flagship/artifact_int8.npz",
         batch: int = 96) -> dict:
    from emx.nn import Denoiser
    from emx.serve.artifact import load_denoiser_artifact
    from emx.serve.quantize import calibrate, quantized_apply

    cfg, variables, quant = load_denoiser_artifact(bundle,
                                                   with_quant=True)
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    noisy = jnp.zeros((8, 512, 512), jnp.bfloat16)
    _, order = calibrate(model, variables, [noisy], return_order=True)

    # Cut points: first conv of selected top-level modules, in
    # execution order (cumulative cost up to that module).
    tops = list(dict.fromkeys(p.split("/")[0] for p in order))
    idx = {t: i for i, t in enumerate(tops)}
    cuts = []
    for t in tops:
        if (t.startswith("XceptionMiddleBlock_0")
                or t.startswith("ASPP")
                or t == "SepConvBlock_4"):   # encoder block 4 entry
            cuts.append(t)
    # decoder stage 1 entry, stage 2 entry, refinement, folded head,
    # output conv: last 5 structural cut points from the tail mapping.
    from emx.nn.denoiser import tail_param_names

    for scope in ("decoder2", "decoder", "refine", "head"):
        m = tail_param_names(order, cfg.folded_head_depth, scope=scope)
        first = min((t for t in m if t in idx), key=lambda t: idx[t])
        cuts.append(first)
    cuts = list(dict.fromkeys(cuts))

    def throughput(fn, b=batch, chain=8):
        xs = jax.jit(lambda k: jax.random.uniform(
            k, (chain, b, 512, 512), jnp.bfloat16))(jax.random.key(0))
        jax.block_until_ready(xs)

        @jax.jit
        def run(xs):
            def body(acc, x):
                return acc + jnp.sum(fn(x).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
            return acc

        float(run(xs))
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(run(xs)) + float(run(xs))
            rates.append(b * chain * 2 / (time.perf_counter() - t0))
            assert np.isfinite(s)
        return round(sorted(rates)[1], 1)

    rows = []
    for t in cuts:
        cap = next(p for p in order if p.split("/")[0] == t)
        qfn = quantized_apply(model, variables, quant["amax"],
                              quant["mode"], skip=quant.get("skip", ()),
                              capture=cap)
        r = throughput(lambda x, f=qfn: f(x)[1])
        rows.append({"cut_before": t, "img_per_s": r,
                     "us_per_img": round(1e6 / r, 1)})
        print(json.dumps(rows[-1]), flush=True)

    full_fn = quantized_apply(model, variables, quant["amax"],
                              quant["mode"], skip=quant.get("skip", ()))
    rows.append({"cut_before": "<full>",
                 "img_per_s": (r := throughput(full_fn)),
                 "us_per_img": round(1e6 / r, 1)})
    out = {"metric": "stage_time", "bundle": bundle, "batch": batch,
           "rows": rows}
    print(json.dumps(out), flush=True)
    with open("docs/runs/flagship/stage_time.json", "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/flagship/artifact_int8.npz",
         int(a[1]) if len(a) > 1 else 96)
