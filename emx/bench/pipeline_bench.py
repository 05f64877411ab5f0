"""Input-pipeline throughput: host loader (TIFF read + crop) and on-device
degradation rates — verifies the loader sustains the denoise target
without a host bottleneck (BASELINE.md row 4; SURVEY.md §7 hard part 5).

Usage: python -m emx.bench.pipeline_bench [n_files] [crop]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(n_files: int = 256, crop: int = 512) -> dict:
    from emx.data.degrade import denoiser_example
    from emx.data.pipeline import DataPipeline, PipelineConfig
    from emx.io.tiff import write_tiff

    tmp = tempfile.mkdtemp(prefix="emx_pipe_bench_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_files):
        p = os.path.join(tmp, f"{i}.tif")
        write_tiff(p, rng.random((crop, crop), np.float32).astype(np.float32))
        paths.append(p)

    pipe = DataPipeline(paths, PipelineConfig(batch_size=32, crop_size=crop,
                                              num_workers=8, prefetch=8))
    it = iter(pipe)
    next(it)  # warm the thread pool
    n_batches = 20
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    tiff_rate = 32 * n_batches / (time.perf_counter() - t0)

    # Production path: crops packed once into an .npy stack
    # (emx.data.harvest.pack_crops) and served via np.load(mmap_mode='r')
    # — page-cache-resident reads at memory rate, immune to the 1-core
    # decode contention that bounds the TIFF path.
    from emx.data.harvest import quantize_pack

    base = rng.random((n_files, crop, crop)).astype(np.float32)

    def packed_rate(dtype) -> float:
        packed = os.path.join(tmp, f"packed_{np.dtype(dtype).name}.npy")
        np.save(packed, quantize_pack(base, dtype))
        mm = np.load(packed, mmap_mode="r")
        pipe2 = DataPipeline(mm, PipelineConfig(batch_size=32,
                                                crop_size=crop))
        it2 = iter(pipe2)
        next(it2)
        # Median of 3 groups: the 1-core host is shared with whatever
        # else the session runs, and one long window under a contention
        # burst half-reports the rate (observed: 119 vs 3083 img/s).
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_batches):
                next(it2)
            rates.append(32 * n_batches / (time.perf_counter() - t0))
        return sorted(rates)[1]

    host_rate = packed_rate(np.float32)
    # Integer packs: the production diet for disk->chip serving (crops
    # rescaled per-image; the train step renormalises per crop anyway).
    host_rate_u16 = packed_rate(np.uint16)
    host_rate_u8 = packed_rate(np.uint8)
    # Float16 pack: the byte diet for FLOAT-origin corpora (the round-4
    # gap: only integer-packed corpora outran the chip; float TIFF-origin
    # stacks were loader-bound 1.7x). Same loader machinery, half the
    # bytes; ~1e-3 relative quantization, far below the Poisson noise
    # the degradation model adds; upcast happens on device in the step.
    host_rate_f16 = packed_rate(np.float16)

    # On-device degradation rate (runs inside the train step in practice).
    # Everything — key derivation included — inside ONE jit per launch:
    # eager jax.random ops cost a full dispatch round-trip each on
    # tunneled backends.
    batch = jnp.asarray(rng.random((32, crop, crop), np.float32))

    @jax.jit
    def degrade_sum(step, x):
        keys = jax.random.split(jax.random.fold_in(jax.random.key(0), step),
                                x.shape[0])
        lq, tgt = jax.vmap(denoiser_example)(keys, x)
        return jnp.sum(lq) + jnp.sum(tgt)

    float(degrade_sum(jnp.int32(0), batch))
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(10):
        acc = acc + degrade_sum(jnp.int32(i), batch)
    float(acc)
    degrade_rate = 320 / (time.perf_counter() - t0)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "metric": "input_pipeline",
        "host_loader_img_per_s": round(host_rate, 1),
        "host_loader_u16_img_per_s": round(host_rate_u16, 1),
        "host_loader_u8_img_per_s": round(host_rate_u8, 1),
        "host_loader_f16_img_per_s": round(host_rate_f16, 1),
        "host_loader_tiff_img_per_s": round(tiff_rate, 1),
        "device_degrade_img_per_s": round(degrade_rate, 1),
        "crop": crop,
    }


def main(n_files: int = 256, crop: int = 512) -> None:
    print(json.dumps(measure(n_files, crop)))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
