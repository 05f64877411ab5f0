"""Denoiser throughput sweep over architecture/batch variants.

Usage: python -m emx.bench.sweep [variant ...]
Variants: base16 base64 s2d2_16 s2d2_64 ref16 (default: base16 base64 s2d2_64)
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def measure(name: str, cfg, batch: int, n_iters: int = 30) -> dict:
    from emx.nn import Denoiser

    model = Denoiser(cfg)
    x0 = jnp.zeros((batch, 512, 512), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)

    @jax.jit
    def fwd_sum(v, x):
        return jnp.sum(model.apply(v, x, train=False))

    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.random((batch, 512, 512), np.float32))
               for _ in range(2)]
    t_compile = time.perf_counter()
    float(fwd_sum(variables, batches[0]))
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(n_iters):
        acc = acc + fwd_sum(variables, batches[i % 2])
    assert np.isfinite(float(acc))
    dt = time.perf_counter() - t0
    out = {"variant": name, "batch": batch,
           "img_per_s": round(batch * n_iters / dt, 2),
           "ms_per_launch": round(1000 * dt / n_iters, 2),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(out), flush=True)
    return out


def main(argv: list[str]) -> None:
    from emx.nn import DenoiserConfig

    base = DenoiserConfig(norm="group", dtype=jnp.bfloat16)
    variants = {
        "base16": (base, 16),
        "base64": (base, 64),
        "s2d2_16": (base.__class__(**{**base.__dict__, "space_to_depth": 2}), 16),
        "s2d2_32": (base.__class__(**{**base.__dict__, "space_to_depth": 2}), 32),
        "s2d2_64": (base.__class__(**{**base.__dict__, "space_to_depth": 2}), 64),
        "s2d4_32": (base.__class__(**{**base.__dict__, "space_to_depth": 4}), 32),
        "s2d4_64": (base.__class__(**{**base.__dict__, "space_to_depth": 4}), 64),
        "s2d2_128": (base.__class__(**{**base.__dict__, "space_to_depth": 2}), 128),
        "s2d4_128": (base.__class__(**{**base.__dict__, "space_to_depth": 4}), 128),
        "s2d4_256": (base.__class__(**{**base.__dict__, "space_to_depth": 4}), 256),
        "ref16": (base.__class__(**{**base.__dict__, "aspp_separable": False,
                                    "upsample": "transpose"}), 16),
        "nonorm16": (base.__class__(**{**base.__dict__, "norm": "none"}), 16),
    }
    names = argv or ["base16", "base64", "s2d2_64"]
    for n in names:
        cfg, b = variants[n]
        try:
            measure(n, cfg, b)
        except Exception as e:
            print(json.dumps({"variant": n, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
