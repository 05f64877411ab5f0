"""Round-3 head-architecture throughput sweep (VERDICT r2 item 1).

Measures inference throughput of denoiser head candidates with the
bench.py methodology (bf16-resident weights, on-device inputs, chained
launches) so the quality-bearing candidate can be picked against the
>= 5000 img/s floor before spending hours training it.

Usage: python -m emx.bench.head_sweep [out.jsonl]
Prints one JSON line per candidate and appends to out.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(name: str, cfg, batch: int = 96, chain: int = 32) -> dict:
    from emx.nn import Denoiser

    model = Denoiser(cfg)
    x0 = jnp.zeros((batch, 512, 512), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    variables = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables,
    )

    @jax.jit
    def run_chain(v, xs):
        def body(acc, x):
            return acc + jnp.sum(model.apply(v, x, train=False)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return acc

    xs = jax.jit(
        lambda k: jax.random.uniform(k, (chain, batch, 512, 512),
                                     jnp.bfloat16)
    )(jax.random.key(0))
    jax.block_until_ready(xs)

    t_c = time.perf_counter()
    float(run_chain(variables, xs))
    compile_s = time.perf_counter() - t_c

    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(2):
            acc = acc + run_chain(variables, xs)
        total = float(acc)
        assert np.isfinite(total)
        rates.append(batch * chain * 2 / (time.perf_counter() - t0))
    out = {
        "variant": name,
        "img_per_s": round(sorted(rates)[1], 1),
        "groups": [round(r, 1) for r in rates],
        "compile_s": round(compile_s, 1),
        "params_m": round(sum(
            p.size for p in jax.tree_util.tree_leaves(variables)) / 1e6, 2),
    }
    print(json.dumps(out), flush=True)
    return out


def main(out_path: str = "docs/runs/head_sweep/sweep.jsonl") -> None:
    import dataclasses

    from emx.nn import DenoiserConfig

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    base = DenoiserConfig(norm="none", dtype=jnp.bfloat16, space_to_depth=4)
    candidates = [
        ("s2d4_plain", base),
        ("s2d4_mrh32", dataclasses.replace(base, mid_res_head=32)),
        ("s2d4_mrh48", dataclasses.replace(base, mid_res_head=48)),
        ("s2d4_mrh48_d3",
         dataclasses.replace(base, mid_res_head=48, mid_res_depth=3)),
        ("s2d4_mrh64", dataclasses.replace(base, mid_res_head=64)),
        ("s2d4_frh16", dataclasses.replace(base, full_res_head=16)),
    ]
    with open(out_path, "a") as f:
        for name, cfg in candidates:
            try:
                r = measure(name, cfg)
            except Exception as e:  # keep sweeping past a failed variant
                r = {"variant": name, "error": str(e)[:200]}
                print(json.dumps(r), flush=True)
            f.write(json.dumps(r) + "\n")
            f.flush()


if __name__ == "__main__":
    main(*sys.argv[1:])
