"""On-chip GAN training-dynamics demonstration (VERDICT r1 item 5).

Runs the REAL fused G+D step (no stubs) at reduced widths for ~1.2k
steps and records metrics JSONL demonstrating:
  * band oscillation — the trainee flipping on the window-averaged
    D(fake) (reference gan-infilling-100.py:1903-1940),
  * the forced trainee switch firing after max_num_since_change
    one-sided windows (:1922-1925),
  * one collapse->rollback round trip end-to-end through the real
    Checkpointer: at the midpoint the discriminator is zeroed (a
    simulated mode collapse — D outputs exactly 0.5, the reference's
    collapse signature :1827-1831) and fit() must detect it from the
    live step metrics and restore the last checkpoint.

Usage: python -m emx.bench.gan_demo [out_dir] [steps]
Writes <out_dir>/metrics.jsonl + prints a JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys

import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__)))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def main(out_dir: str = "docs/runs/gan_r2", steps: int = 1200) -> dict:
    import functools

    from emx.data.degrade import fixed_scan_mask, infilling_example
    from emx.data.pipeline import DeviceDataset, PipelineConfig, \
        synthetic_micrographs
    from emx.nn.infilling import InfillingConfig, InfillingGenerator, \
        MultiscaleDiscriminator
    from emx.train.checkpoints import Checkpointer
    from emx.train.gan import GANConfig, GANTrainer

    size, batch = 256, 8
    os.makedirs(out_dir, exist_ok=True)

    # Reduced widths: half the reference generator/discriminator.
    net_cfg = InfillingConfig(
        gen_features=(16, 32, 32, 16), nin_down=(64, 128, 384),
        nin_up=(128, 64, 32), num_global_blocks=4, num_local_blocks=2,
        disc_features=(16, 32, 64, 128), norm="group",
    )
    cfg = GANConfig(
        gen_lr=2e-4, disc_lr=2e-4, log_every=1,
        trainee_switch_skip_n=2, max_num_since_change=8,
        ckpt_every_steps=100, model_dir=out_dir,
        collapse_eps=1e-6,
    )
    mask = fixed_scan_mask((size, size), coverage=1 / 64)
    example_fn = functools.partial(infilling_example, mask=mask)
    trainer = GANTrainer(InfillingGenerator(net_cfg),
                         MultiscaleDiscriminator(net_cfg), cfg,
                         example_fn=example_fn)
    data = synthetic_micrographs(64, size, seed=3)
    pipe = DeviceDataset(data, PipelineConfig(batch_size=batch,
                                              crop_size=size))
    state = trainer.init(jnp.asarray(data[:batch]))
    ckpt = Checkpointer(os.path.join(out_dir, "ckpt"))

    half = steps // 2
    state = trainer.fit(state, pipe, num_steps=half, checkpointer=ckpt)

    # Simulated mode collapse: zero the discriminator so D(x) == 0.5
    # exactly on real and fake — the reference's collapse signature.
    state = state.replace(
        disc_params=jax.tree_util.tree_map(jnp.zeros_like,
                                           state.disc_params))
    state = trainer.fit(state, pipe, num_steps=steps, checkpointer=ckpt)

    # Starvation segment: freeze the generator (lr -> 0) and raise the
    # bands so the window decision is persistently one-sided (d_fake sits
    # below switch_low every window). num_since_change must climb and the
    # forced switch (max_num_since_change) must fire — the starvation
    # scenario the mechanism exists for (reference :1922-1925).
    from emx.train.engine import set_learning_rate

    state = state.replace(gen_opt=set_learning_rate(state.gen_opt, 0.0))
    trainer.cfg.switch_low = 0.85
    trainer.cfg.switch_high = 0.95
    state = trainer.fit(state, pipe, num_steps=steps + 150,
                        checkpointer=ckpt)
    ckpt.close()

    from emx.utils.metrics import read_jsonl

    recs = read_jsonl(os.path.join(out_dir, "metrics.jsonl"))
    trainees = [r.get("train_gen") for r in recs if "train_gen" in r]
    switches = sum(1 for a, b in zip(trainees, trainees[1:]) if a != b)
    summary = {
        "metric": "gan_demo",
        "steps": int(state.step),
        "trainee_switches": switches,
        "both_trained": len(set(trainees)) == 2,
        "forced_switches": max((r.get("forced_switches", 0) for r in recs),
                               default=0),
        "rollbacks": max((r.get("rollback", 0) for r in recs), default=0),
        "final_d_fake": next((r["d_fake"] for r in reversed(recs)
                              if "d_fake" in r), None),
        "final_mse": next((r["mse"] for r in reversed(recs)
                           if "mse" in r), None),
    }
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "docs/runs/gan_r2",
         int(args[1]) if len(args) > 1 else 1200)
