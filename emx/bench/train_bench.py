"""Training-step throughput ladder on the local chip.

Round-1 measured 31 img/s for the flagship train step (s2d=2, batch 16,
f32 compute) — far short of the reference's 500k-700k-iteration training
schedules (gan-infilling-100.py:1635-1642). This ladder measures the
levers VERDICT r1 item 4 names: bf16 compute, rematerialised middle
blocks, batch scaling to the HBM limit, and norm choice.

Usage: python -m emx.bench.train_bench            # full ladder
       python -m emx.bench.train_bench quick      # 3 rungs
Prints one JSON line per rung.
"""

from __future__ import annotations

import json
import sys
import time

import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__)))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def measure(s2d: int = 2, batch: int = 16, dtype: str = "bf16",
            remat: bool = False, norm: str = "group", steps: int = 16,
            size: int = 512, accum: int = 1,
            config_overrides: dict | None = None) -> dict:
    from emx.data.degrade import denoiser_example
    from emx.nn import Denoiser, DenoiserConfig
    from emx.train import TrainConfig, Trainer

    cfg = DenoiserConfig(
        norm=norm,
        dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
        space_to_depth=s2d,
        remat_middle=remat,
        **(config_overrides or {}),
    )
    model = Denoiser(cfg)
    trainer = Trainer(
        model,
        TrainConfig(optimizer="nesterov", grad_accum=accum, log_every=0),
        example_fn=denoiser_example,
    )
    data = jnp.asarray(
        np.random.default_rng(0).random((batch, size, size)), jnp.float32)
    state = trainer.init(jnp.zeros((batch, size, size)))
    state, m = trainer.step_fn(state, data)
    float(m["loss"])  # compile + full roundtrip
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = trainer.step_fn(state, data)
    loss = float(m["loss"])  # host readback forces remote completion
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return {
        "metric": "train_step_img_per_s",
        "value": round(batch * steps / dt, 2),
        "s2d": s2d, "batch": batch, "dtype": dtype, "remat": remat,
        "norm": norm, "accum": accum, "loss": round(loss, 4),
    }


LADDER = [
    dict(s2d=2, batch=16, dtype="f32"),                 # round-1 baseline
    dict(s2d=2, batch=16, dtype="bf16"),
    dict(s2d=2, batch=32, dtype="bf16"),
    dict(s2d=2, batch=32, dtype="bf16", remat=True),
    dict(s2d=2, batch=64, dtype="bf16", remat=True),
    dict(s2d=2, batch=16, dtype="bf16", norm="none"),
    dict(s2d=4, batch=64, dtype="bf16"),
]

QUICK = [LADDER[0], LADDER[1], LADDER[3]]


def main(rungs) -> None:
    for kw in rungs:
        try:
            print(json.dumps(measure(**kw)), flush=True)
        except Exception as e:
            print(json.dumps({"error": str(e)[:200], **kw}), flush=True)


if __name__ == "__main__":
    main(QUICK if "quick" in sys.argv[1:] else LADDER)
