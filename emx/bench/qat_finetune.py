"""Quantization-aware finetune of the deployment artifact.

Post-training quantization of the folded flagship costs ~1.4 dB in mxu
mode (docs/runs/quant_r3). This runner finetunes the FLOAT weights with
fake-quantized (straight-through-estimator) convs that match the int8
deployment grid exactly (emx.serve.quantize.fake_quant_apply), so the
optimizer steers the weights toward int8-robust minima — the standard
QAT recipe, applied to the served graph rather than the training graph.

Flow: load artifact -> calibrate -> finetune (huberised MSE, the
reference trainer's loss, on the same synthetic corpus recipe the
artifact was trained on) -> recalibrate on the finetuned weights ->
score the REAL int8 graph (quantized_apply) on the val ladder ->
promote to artifact_int8.npz when it beats the PTQ-only bundle and the
classical-filter gate.

Usage: python -m emx.bench.qat_finetune <artifact.npz> [out_dir] [steps]
                                        [batch] [lr] [psnr_gate]
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
import optax


def main(artifact: str, out_dir: str = "docs/runs/qat_r3",
         steps: int = 3000, batch: int = 16, lr: float = 2e-5,
         psnr_gate: float | None = None, mode: str = "mxu",
         trainable_last_n: int | None = None,
         target: str = "clean", clean_weight: float = 0.0) -> dict:
    """`target`:
      'clean' — huberised MSE against the degradation ground truth (the
        artifact's original objective). Measured round 3: at lr 2e-5 x
        3000 steps this REGRESSED the model (float 38.33 -> 35.06) — a
        converged nesterov minimum revisited with fresh Adam steps walks
        away from it far faster than STE robustness accrues.
      'float' — self-distillation: match the FLOAT teacher's output on
        the same batch. The minimum (zero quantization error, function
        unchanged) coincides with what serving wants, so the objective
        cannot degrade the function it is protecting; `clean_weight`
        optionally mixes the clean-target loss back in."""
    import dataclasses

    from emx.bench.quant_check import _psnr, _throughput, _val_ladder
    from emx.data.degrade import denoiser_example
    from emx.data.pipeline import synthetic_micrographs
    from emx.nn import Denoiser
    from emx.serve.artifact import (load_denoiser_artifact,
                                    save_denoiser_artifact)
    from emx.serve.quantize import calibrate, fake_quant_apply, \
        quantized_apply
    from emx.train.losses import huberised_mse

    os.makedirs(out_dir, exist_ok=True)
    cfg, variables = load_denoiser_artifact(artifact)
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    noisy, clean = _val_ladder()

    assert target in ("clean", "float")
    out: dict = {"metric": "qat_finetune", "artifact": artifact,
                 "mode": mode, "steps": steps, "batch": batch, "lr": lr,
                 "target": target, "clean_weight": clean_weight}
    out["float_psnr"] = _psnr(
        jax.jit(lambda x: model.apply(variables, x, train=False))(noisy),
        clean)
    amax, conv_order = calibrate(model, variables, [noisy[:8]],
                                 return_order=True)
    out["ptq_psnr"] = _psnr(
        jax.jit(quantized_apply(model, variables, amax, mode))(noisy),
        clean)

    # Finetune with the deployment-grid fake quantizer. The corpus and
    # example recipe match the artifact's training run (quality_run:
    # 1024 synthetic micrographs, reference dose model).
    train_imgs = jax.device_put(
        jnp.asarray(synthetic_micrographs(1024, noisy.shape[-1], seed=0)))
    fq = fake_quant_apply(model, amax, mode=mode)
    all_params = jax.device_put(
        jax.tree_util.tree_map(
            lambda p: jnp.asarray(p, jnp.float32), variables["params"]))
    # Head-only finetune option: differentiate only the params of the
    # LAST trainable_last_n convs in trace order (the head — it sits at
    # the network end, so the backward graph shrinks to a few layers;
    # the full-model backward compile breaks the remote-compile relay
    # on this host: ~30 min then 'Broken pipe').
    if trainable_last_n:
        tops = [p.split("/")[0] for p in conv_order]  # execution order
        train_tops = sorted(set(tops[-trainable_last_n:]))
        out["trainable_tops"] = train_tops
        trainable = {k: v for k, v in all_params.items()
                     if k in train_tops}
        frozen = {k: v for k, v in all_params.items()
                  if k not in train_tops}
    else:
        trainable, frozen = all_params, {}
    opt = optax.adam(lr)
    opt_state = opt.init(trainable)

    # All device arrays (corpus, frozen params, the float teacher) are
    # jit ARGS: a closed-over device array is embedded as an MLIR
    # constant, ballooning the remote-compile payload past the relay's
    # limit (observed: 69 s MLIR conversion, then the relay drops the
    # >1 GB request with 'Broken pipe' ~30 min in).
    @jax.jit
    def step(trainable, frozen, teacher, opt_state, key, corpus):
        k_idx, k_ex = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch,), 0, corpus.shape[0])
        imgs = jnp.take(corpus, idx, axis=0)
        lq, tgt = jax.vmap(denoiser_example)(
            jax.random.split(k_ex, batch), imgs)
        if target == "float":
            tgt_f = jax.lax.stop_gradient(
                model.apply({"params": teacher}, lq, train=False)
            ).astype(jnp.float32)

        def loss_fn(tr):
            pred = fq({"params": {**frozen, **tr}}, lq, train=False)
            pred = pred.astype(jnp.float32)
            if target == "float":
                loss = huberised_mse(pred, tgt_f)
                if clean_weight:
                    loss = loss + clean_weight * huberised_mse(pred, tgt)
                return loss
            return huberised_mse(pred, tgt)

        loss, g = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(trainable, updates), opt_state, loss

    teacher = all_params if target == "float" else {}
    key = jax.random.key(1234)
    t0 = time.perf_counter()
    losses = []
    for i in range(steps):
        trainable, opt_state, loss = step(trainable, frozen, teacher,
                                          opt_state,
                                          jax.random.fold_in(key, i),
                                          train_imgs)
        if (i + 1) % 200 == 0:
            losses.append(round(float(loss), 5))
    out["train_s"] = round(time.perf_counter() - t0, 1)
    out["loss_trace"] = losses

    # Recalibrate on the finetuned weights, score the REAL int8 graph.
    new_vars = {"params": {**frozen, **trainable}}
    amax2 = calibrate(model, new_vars, [noisy[:8]])
    qfn = jax.jit(quantized_apply(model, new_vars, amax2, mode))
    out["qat_psnr"] = _psnr(qfn(noisy), clean)
    out["qat_float_psnr"] = _psnr(
        jax.jit(lambda x: model.apply(new_vars, x, train=False))(noisy),
        clean)
    out["qat_img_per_s"] = _throughput(qfn)

    if psnr_gate is not None:
        from emx.bench.quant_check import FLAGSHIP, _is_flagship

        out["psnr_gate"] = psnr_gate
        dest = os.path.join(os.path.dirname(artifact) or ".",
                            "artifact_int8.npz")
        if _is_flagship(dest):
            # The flagship path is written ONLY by flagship_decision
            # (multi-family maximin gate — round-3 verdict: in-place
            # promotion here shipped a bundle whose ood_grains score
            # was never measured). Park the candidate in the run dir.
            dest = os.path.join(out_dir, "bundle.npz")
        # Never regress the shipped bundle's val PSNR: the gate uses
        # the FLAGSHIP incumbent (candidates below it cannot win the
        # decision on the val axis they were distilled for).
        incumbent = -1.0
        if os.path.exists(FLAGSHIP):
            _, _, q_inc = load_denoiser_artifact(FLAGSHIP,
                                                 with_quant=True)
            incumbent = float((q_inc or {}).get("psnr", -1.0))
        out["incumbent_psnr"] = incumbent
        promoted = (out["qat_psnr"]
                    > max(out["ptq_psnr"], psnr_gate, incumbent))
        out["gate_passed"] = out["promoted"] = promoted
        if promoted:
            save_denoiser_artifact(dest, cfg, new_vars, quant={
                "mode": mode, "amax": amax2,
                "psnr": out["qat_psnr"],
                "float_psnr": out["qat_float_psnr"],
                "psnr_gate": psnr_gate,
                "qat": {"kind": target, "steps": steps,
                        "clean_weight": clean_weight},
                "img_per_s_at_check": out["qat_img_per_s"]})
            out["promoted_artifact"] = dest
    name = "qat.json" if target == "clean" else f"qat_{target}.json"
    with open(os.path.join(out_dir, name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


def head_distill(artifact: str, out_dir: str = "docs/runs/qat_r3",
                 steps: int = 4000, batch: int = 16, lr: float = 1e-4,
                 psnr_gate: float | None = None,
                 mode: str = "mxu", scope: str = "head",
                 corpus: str = "synthetic") -> dict:
    """Head-distillation QAT: the full fake-quant training graph (and
    even its head-only-gradient variant) exceeds the remote-compile
    relay's ~31-minute request ceiling, so train the folded head
    STANDALONE: capture its input from the int8 deployment graph (which
    compiles fine), fake-quant-finetune FoldedHeadTail against the
    ground truth, then write the head params back and re-gate. The head
    learns to correct the body's accumulated quantization error — the
    dominant PTQ loss — with compiles that are seconds, not tens of
    minutes.

    `scope` widens the standalone tail: 'refine' captures one stage
    earlier (before the body-resolution refinement block; measured
    37.30 -> 38.75 on the flagship), 'decoder' a further decoder stage
    earlier (38.75 -> 41.05 -> 42.69 over two iterations), 'decoder2'
    the whole decoder (two capture points; see FoldedHeadTail). The
    tail input becomes (features..., raw batch).

    `corpus` 'synthetic' (the artifact's training family) or 'mixed'
    (adds CTF-lattice micrographs — the ood_check family the
    synthetic-only bundle fails on). Every run also reports
    `ood_psnr` on the held-out CTF ladder."""
    import dataclasses

    from emx.bench.quant_check import _psnr, _throughput, _val_ladder
    from emx.data.degrade import denoiser_example
    from emx.data.pipeline import synthetic_micrographs
    from emx.nn import Denoiser
    from emx.nn.denoiser import FoldedHeadTail, tail_param_names
    from emx.serve.artifact import (load_denoiser_artifact,
                                    save_denoiser_artifact)
    from emx.serve.quantize import calibrate, fake_quant_apply, \
        quantized_apply
    from emx.train.losses import huberised_mse

    def stage(msg):
        print(f"[stage +{time.perf_counter() - t_start:8.1f}s] {msg}",
              flush=True)

    t_start = time.perf_counter()
    os.makedirs(out_dir, exist_ok=True)
    cfg, variables = load_denoiser_artifact(artifact)
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    noisy, clean = _val_ladder()
    stage("ladder built")

    out: dict = {"metric": "qat_head_distill", "artifact": artifact,
                 "mode": mode, "steps": steps, "batch": batch, "lr": lr,
                 "scope": scope, "corpus": corpus}
    out["float_psnr"] = _psnr(
        jax.jit(lambda x: model.apply(variables, x, train=False))(noisy),
        clean)
    stage(f"float psnr {out['float_psnr']}")
    amax, order = calibrate(model, variables, [noisy[:8]],
                            return_order=True)
    stage("calibrated")
    out["ptq_psnr"] = _psnr(
        jax.jit(quantized_apply(model, variables, amax, mode))(noisy),
        clean)
    stage(f"ptq psnr {out['ptq_psnr']}")

    mapping = tail_param_names(order, cfg.folded_head_depth,
                               scope=scope)
    out["head_modules"] = sorted(mapping)
    deep = scope != "head"
    if scope == "decoder2":
        # Two capture points: the concat feeding the FIRST decoder
        # stage, and the concat feeding the second stage — whose first
        # features[2] channels are the int8 graph's own DeconvBlock
        # output (recomputed by the tail); the remainder is encoder
        # tap 0, which the tail cannot re-derive.
        inv = {v: k for k, v in mapping.items()}
        caps = tuple(
            next(p for p in order if p.split("/")[0] == inv[name])
            for name in ("SepConvBlock_0", "SepConvBlock_2"))
        f2 = cfg.features[2]

        def tail_inputs(captured, lq):
            cat1, cat2 = captured
            return (cat1, cat2[..., f2:], lq)
    else:
        caps = next(p for p in order if p.split("/")[0] in mapping)

        def tail_inputs(captured, lq):
            return (captured, lq) if deep else captured

    capture_fn = jax.jit(quantized_apply(model, variables, amax, mode,
                                         capture=caps))

    if corpus in ("mixed", "mixed3"):
        from emx.data.pipeline import mixed_micrographs

        corpus_imgs = mixed_micrographs(1024, noisy.shape[-1], seed=0,
                                        filaments=corpus == "mixed3")
    else:
        corpus_imgs = synthetic_micrographs(1024, noisy.shape[-1],
                                            seed=0)
    train_imgs = jax.device_put(jnp.asarray(corpus_imgs))
    jax.block_until_ready(train_imgs)
    stage("corpus resident")

    # corpus as a jit ARG, not a closure: closed-over device arrays are
    # embedded as MLIR constants — a >1 GB remote-compile payload that
    # the relay drops with 'Broken pipe' (the cause of every earlier
    # QAT compile failure this round).
    @jax.jit
    def make_batch(corpus, key):
        k_idx, k_ex = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch,), 0, corpus.shape[0])
        imgs = jnp.take(corpus, idx, axis=0)
        return jax.vmap(denoiser_example)(
            jax.random.split(k_ex, batch), imgs)

    tail = FoldedHeadTail(cfg, tail_scope=scope)
    tail_params = {new: jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32), variables["params"][old])
        for old, new in mapping.items()}
    lq0, _ = make_batch(train_imgs, jax.random.key(0))
    stage("make_batch compiled")
    cat0 = tail_inputs(capture_fn(lq0)[1], lq0)
    stage("capture_fn compiled")
    tail_amax = calibrate(tail, {"params": tail_params}, [cat0])
    fq_tail = fake_quant_apply(tail, tail_amax, mode=mode)
    stage("tail calibrated")

    import optax

    opt = optax.adam(lr)
    opt_state = opt.init(tail_params)

    @jax.jit
    def tail_step(tp, opt_state, cat, tgt):
        def loss_fn(p):
            pred = fq_tail({"params": p}, cat)
            return huberised_mse(pred.astype(jnp.float32), tgt)

        loss, g = jax.value_and_grad(loss_fn)(tp)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(tp, updates), opt_state, loss

    key = jax.random.key(1234)
    t0 = time.perf_counter()
    losses = []
    for i in range(steps):
        lq, tgt = make_batch(train_imgs, jax.random.fold_in(key, i))
        cat = tail_inputs(capture_fn(lq)[1], lq)
        tail_params, opt_state, loss = tail_step(tail_params, opt_state,
                                                 cat, tgt)
        if (i + 1) % 200 == 0:
            losses.append(round(float(loss), 5))
    out["train_s"] = round(time.perf_counter() - t0, 1)
    out["loss_trace"] = losses

    new_params = dict(variables["params"])
    for old, new in mapping.items():
        new_params[old] = tail_params[new]
    new_vars = {"params": new_params}
    amax2 = calibrate(model, new_vars, [noisy[:8]])
    qfn = jax.jit(quantized_apply(model, new_vars, amax2, mode))
    out["qat_psnr"] = _psnr(qfn(noisy), clean)
    out["qat_float_psnr"] = _psnr(
        jax.jit(lambda x: model.apply(new_vars, x, train=False))(noisy),
        clean)
    out["qat_img_per_s"] = _throughput(qfn)
    # Score the candidate on the FULL flagship-decision policy (every
    # family + capped margin sum) so the distill ladder optimizes the
    # number it will be judged by — round-4's val-PSNR-maximizing
    # stacked candidates were correctly vetoed by the decision gate on
    # OOD margin, i.e. chip time went to unshippable bundles.
    from emx.bench.flagship_decision import (capped_margin_sum,
                                             family_rows)
    from emx.bench.quant_check import _ood_ladder

    fams = family_rows(qfn)
    out["families"] = fams
    out["capped_margin_sum"] = capped_margin_sum(fams)
    out["ood_psnr"] = fams["ood_ctf"]["nn_psnr"]
    ood_noisy, ood_clean = _ood_ladder()
    out["ood_psnr_before"] = _psnr(
        jax.jit(quantized_apply(model, variables, amax, mode))(ood_noisy),
        ood_clean)

    if psnr_gate is not None:
        from emx.bench.quant_check import FLAGSHIP

        out["psnr_gate"] = psnr_gate
        # Gate against the shipped FLAGSHIP's val PSNR, but never write
        # that path here — promotion routes through flagship_decision's
        # multi-family maximin policy (round-3 verdict: the in-place
        # promotion below shipped a bundle whose ood_grains score was
        # never measured). The candidate bundle below is the artifact
        # the decision scores.
        incumbent = -1.0
        if os.path.exists(FLAGSHIP):
            _, _, q_inc = load_denoiser_artifact(FLAGSHIP,
                                                 with_quant=True)
            incumbent = float((q_inc or {}).get("psnr", -1.0))
        out["incumbent_psnr"] = incumbent
        out["gate_passed"] = out["promoted"] = (
            out["qat_psnr"] > max(out["ptq_psnr"], psnr_gate, incumbent))
    # Always keep the distilled bundle as an immutable candidate (e.g.
    # mixed-corpus generalist runs trade val-ladder PSNR for OOD
    # robustness and still win the maximin decision).
    cand = os.path.join(out_dir, "bundle.npz")
    save_denoiser_artifact(cand, cfg, new_vars, quant={
        "mode": mode, "amax": amax2, "psnr": out["qat_psnr"],
        "float_psnr": out["qat_float_psnr"],
        "ood_psnr": out["ood_psnr"],
        "capped_margin_sum": out["capped_margin_sum"],
        "psnr_gate": psnr_gate,
        "img_per_s_at_check": out["qat_img_per_s"],
        "qat": {"kind": "tail_distill" if deep else "head_distill",
                "scope": scope, "corpus": corpus, "steps": steps,
                "head_modules": sorted(mapping)}})
    out["candidate_bundle"] = cand
    name = {"head": "qat_head.json", "refine": "qat_tail.json",
            "decoder": "qat_tail_decoder.json",
            "decoder2": "qat_tail_decoder2.json"}[scope]
    with open(os.path.join(out_dir, name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    kw = dict(
        out_dir=a[1] if len(a) > 1 else "docs/runs/qat_r3",
        steps=int(a[2]) if len(a) > 2 else 3000,
        batch=int(a[3]) if len(a) > 3 else 16,
        lr=float(a[4]) if len(a) > 4 else 2e-5,
        psnr_gate=float(a[5]) if len(a) > 5 else None,
    )
    art = a[0] if a else "docs/runs/flagship/artifact.npz"
    sel = a[6] if len(a) > 6 else None
    scopes = {"head": "head", "tail": "refine", "decoder": "decoder",
              "decoder2": "decoder2"}
    if sel in scopes:
        head_distill(art, scope=scopes[sel],
                     corpus=a[7] if len(a) > 7 else "synthetic", **kw)
    elif sel == "float":
        main(art, target="float",
             clean_weight=float(a[7]) if len(a) > 7 else 0.0, **kw)
    else:
        main(art, trainable_last_n=int(sel) if sel else None, **kw)
