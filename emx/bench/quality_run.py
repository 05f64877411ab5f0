"""Production-scale quality anchoring (VERDICT r1 item 2).

Trains the FLAGSHIP denoiser (full reference widths) on-chip for N
thousand steps at a given space_to_depth, then scores val PSNR against
the six classical filters (the reference's err_hist workload,
misc_py/err_hist_maker.py:1-175). Run once with s2d=2 (quality profile)
and once with s2d=4 (benched fast profile): the PSNR delta between them
measured at production widths is the quality-at-speed evidence the
round-1 60-step toy study could not give.

Usage: python -m emx.bench.quality_run <out_dir> [s2d] [steps] [batch]
Writes <out_dir>/metrics.jsonl, a checkpoint, and quality.json; prints
the quality summary as one JSON line.
"""

from __future__ import annotations

import json
import os
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


def main(out_dir: str, s2d: int = 2, steps: int = 5000,
         batch: int = 16, full_res_head: int = 0,
         norm: str = "group", mid_res_head: int = 0,
         folded_head: int = 0, init_from: str | None = None,
         corpus: str = "synthetic") -> dict:
    from emx.analysis.filters import compare_denoisers
    from emx.data.degrade import denoiser_example, poisson_dose
    from emx.data.pipeline import DeviceDataset, PipelineConfig, \
        synthetic_micrographs
    from emx.nn import Denoiser, DenoiserConfig
    from emx.train import TrainConfig, Trainer
    from emx.train.checkpoints import Checkpointer
    from emx.utils.image import sanitize, scale0to1

    size = 512
    os.makedirs(out_dir, exist_ok=True)
    cfg = DenoiserConfig(norm=norm, dtype=jnp.bfloat16,
                         space_to_depth=s2d, remat_middle=True,
                         full_res_head=full_res_head,
                         mid_res_head=mid_res_head,
                         folded_head=folded_head)
    model = Denoiser(cfg)
    # Reference hyperparameters: nesterov momentum 0.9, initial lr 1e-3
    # (denoiser-multi-gpu.py:118,1064-1066).
    tcfg = TrainConfig(learning_rate=1e-3, optimizer="nesterov",
                       grad_clip_norm=0.0, log_every=50,
                       ckpt_every_steps=1000, model_dir=out_dir, seed=0)
    trainer = Trainer(model, tcfg, example_fn=denoiser_example)

    if corpus in ("mixed", "mixed3"):
        # Diverse corpus: the synthetic-only corpus produced a model at
        # identity-level PSNR on lattice images
        # (docs/runs/quant_r3/ood_check.json); the reference trains on a
        # diverse real harvest (denoiser-multi-gpu.py:84-92). 'mixed' is
        # the round-4 three-family mix; 'mixed3' adds the filament
        # family (the grains recipe applied to the round-4 −2.48 dB
        # filaments loss; porous becomes the eval-only OOD probe).
        from emx.data.pipeline import mixed_micrographs

        train_imgs = mixed_micrographs(1024, size, seed=0,
                                       filaments=corpus == "mixed3")
    else:
        train_imgs = synthetic_micrographs(1024, size, seed=0)
    val_imgs = synthetic_micrographs(32, size, seed=999)
    pipe = DeviceDataset(train_imgs,
                         PipelineConfig(batch_size=batch, crop_size=size))
    state = trainer.init(jnp.zeros((batch, size, size)))
    ckpt = Checkpointer(os.path.join(out_dir, "ckpt"))
    if ckpt.latest_step() is not None:
        # Resume an interrupted run (orbax step + pipeline cursor).
        state, pipe_state = ckpt.restore(state)
        if pipe_state:
            pipe.load_state_dict(pipe_state)
    elif init_from:
        # Warm-start from a committed train-state bundle (orbax ckpts are
        # gitignored and lost between build sessions; state_bn.npz is the
        # cross-session resume path). Optimizer momentum restarts fresh —
        # it refills within tens of steps.
        from emx.serve.artifact import load_pytree_like

        ref = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            ref["batch_stats"] = state.batch_stats
        tree, meta = load_pytree_like(init_from, ref)
        state = state.replace(
            step=jnp.asarray(int(meta.get("step", 0)), jnp.int32),
            params=tree["params"],
            batch_stats=tree.get("batch_stats", state.batch_stats))
    from emx.serve.artifact import save_pytree_npz

    def save_resume(state):
        # Committed resume point (see init_from above). Refreshed every
        # segment: sessions end / VMs reset mid-run, orbax ckpts under
        # out_dir are gitignored — state_bn.npz is what survives.
        bundle = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            bundle["batch_stats"] = state.batch_stats
        save_pytree_npz(os.path.join(out_dir, "state_bn.npz"), bundle,
                        meta={"step": int(state.step), "s2d": s2d,
                              "norm": norm, "folded_head": folded_head})

    start = int(state.step)
    t0 = time.perf_counter()
    # Two-phase schedule: 1e-3 for the first 70%, then 1e-4 (the
    # reference drops lr by hand via learning_rate.txt mid-training).
    phase1 = int(steps * 0.7)
    from emx.train.engine import set_learning_rate

    save_every = 5000
    while int(state.step) < steps:
        here = int(state.step)
        if here >= phase1:
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, 1e-4))
        bound = phase1 if here < phase1 else steps
        state = trainer.fit(state, pipe,
                            num_steps=min(bound, here + save_every),
                            checkpointer=ckpt)
        save_resume(state)
    train_s = max(time.perf_counter() - t0, 1e-9)
    ckpt.save(int(state.step), state, pipe.state_dict(), wait=True)
    ckpt.close()
    save_resume(state)

    # Fixed val degradation: deterministic LOW-dose ladder — the regime
    # the denoiser exists for (train doses ~ 25+Exp(75)); classical
    # filters hold their own at high dose but not here.
    doses = np.linspace(25.0, 150.0, val_imgs.shape[0]).astype(np.float32)

    @jax.jit
    def make_val(imgs, doses):
        def one(k, img, dose):
            img = scale0to1(sanitize(img))
            lq = poisson_dose(k, img, dose)
            tgt = img * (jnp.mean(lq) / jnp.maximum(jnp.mean(img), 1e-12))
            return lq, tgt

        keys = jax.random.split(jax.random.key(7), imgs.shape[0])
        return jax.vmap(one)(keys, imgs, doses)

    noisy, clean = make_val(jnp.asarray(val_imgs), jnp.asarray(doses))

    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def nn_fn(x):
        return model.apply(variables, x, train=False)

    results = compare_denoisers(noisy, clean, nn_fn=nn_fn, per_image=True)

    folded_psnr = None
    if norm == "batch":
        # Deployment provenance: fold BatchNorm into the convs and score
        # the folded (norm-free — the exact graph bench.py measures)
        # model. Fold is exact at inference, so folded PSNR must match.
        from emx.serve.optimize import fold_denoiser
        from emx.utils.image import psnr as _psnr

        folded_cfg, folded_vars = fold_denoiser(cfg, variables)
        folded_model = Denoiser(folded_cfg)

        @jax.jit
        def nn_folded(x):
            return folded_model.apply(folded_vars, x, train=False)

        folded_psnr = float(jnp.mean(jax.vmap(_psnr)(nn_folded(noisy),
                                                     clean)))
        # The folded model IS the deployment unit: save it as the
        # one-file artifact bench.py measures (EMX_BENCH_ARTIFACT).
        from emx.serve.artifact import save_denoiser_artifact

        save_denoiser_artifact(os.path.join(out_dir, "artifact.npz"),
                               folded_cfg, folded_vars)

    from emx.analysis.filters import save_err_hists

    save_err_hists(results, os.path.join(out_dir, "err_hist"))
    results = {k: {m: v for m, v in r.items() if m in ("mse", "psnr")}
               for k, r in results.items()}
    # Out-of-family robustness row (CTF-lattice ladder) — the point of
    # corpus='mixed'; reported for every run so the tradeoff is visible.
    from emx.bench.quant_check import _ood_ladder, _psnr as _psnr_m

    ood_noisy, ood_clean = _ood_ladder()
    ood_psnr = _psnr_m(nn_fn(ood_noisy), ood_clean)

    summary = {
        "metric": "quality_anchor", "corpus": corpus,
        "ood_psnr": ood_psnr,
        "s2d": s2d, "steps": int(state.step), "batch": batch,
        "full_res_head": full_res_head, "mid_res_head": mid_res_head,
        "folded_head": folded_head, "norm": norm,
        "train_img_per_s": round(batch * (int(state.step) - start) / train_s,
                                 2),
        "nn_psnr": round(results["nn"]["psnr"], 3),
        "identity_psnr": round(results["identity"]["psnr"], 3),
        "best_classical": max(
            ((k, v["psnr"]) for k, v in results.items()
             if k not in ("nn", "identity")), key=lambda kv: kv[1]),
        "all": {k: round(v["psnr"], 3) for k, v in results.items()},
    }
    if folded_psnr is not None:
        summary["nn_folded_psnr"] = round(folded_psnr, 3)
    with open(os.path.join(out_dir, "quality.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/quality_s2d2",
         int(a[1]) if len(a) > 1 else 2,
         int(a[2]) if len(a) > 2 else 5000,
         int(a[3]) if len(a) > 3 else 16,
         int(a[4]) if len(a) > 4 else 0,
         a[5] if len(a) > 5 else "group",
         int(a[6]) if len(a) > 6 else 0,
         int(a[7]) if len(a) > 7 else 0,
         a[8] if len(a) > 8 and a[8] != "none" else None,
         a[9] if len(a) > 9 else "synthetic")
