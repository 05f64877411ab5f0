"""North-star benchmark: end-to-end 512x512 micrograph denoise throughput
on one chip (BASELINE.md: target >= 5000 img/s/chip on v5e).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Runs the flagship denoiser (full reference widths, bfloat16 compute) in
inference mode over batched 512x512 crops, steady-state, excluding compile.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_S = 5000.0


def main() -> None:
    from emx.nn import Denoiser, DenoiserConfig

    batch = int(os.environ.get("EMX_BENCH_BATCH", "16"))
    cfg = DenoiserConfig(norm="group", dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    x0 = jnp.zeros((batch, 512, 512), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.random((batch, 512, 512), np.float32)) for _ in range(4)
    ]

    # Warmup / compile. Force a host readback — on tunneled backends
    # block_until_ready can return before remote execution completes, so
    # every timing below is bounded by an actual device->host transfer of
    # a reduction over the output.
    @jax.jit
    def fwd_sum(v, x):
        return jnp.sum(fwd(v, x))

    float(fwd_sum(variables, batches[0]))  # compile + full roundtrip

    # Chain iterations through an on-device accumulator; the single host
    # readback at the end cannot complete until every launch has executed.
    n_iters = 30
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(n_iters):
        acc = acc + fwd_sum(variables, batches[i % len(batches)])
    total = float(acc)
    dt = time.perf_counter() - t0
    assert np.isfinite(total)

    img_per_s = batch * n_iters / dt
    print(json.dumps({
        "metric": "denoiser_512_throughput",
        "value": round(img_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / BASELINE_IMG_S, 4),
    }))


if __name__ == "__main__":
    main()
