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
         trainable_last_n: int | None = None) -> dict:
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

    out: dict = {"metric": "qat_finetune", "artifact": artifact,
                 "mode": mode, "steps": steps, "batch": batch, "lr": lr}
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

    @jax.jit
    def step(trainable, opt_state, key):
        k_idx, k_ex = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch,), 0, train_imgs.shape[0])
        imgs = jnp.take(train_imgs, idx, axis=0)
        lq, tgt = jax.vmap(denoiser_example)(
            jax.random.split(k_ex, batch), imgs)

        def loss_fn(tr):
            pred = fq({"params": {**frozen, **tr}}, lq, train=False)
            return huberised_mse(pred.astype(jnp.float32), tgt)

        loss, g = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(trainable, updates), opt_state, loss

    key = jax.random.key(1234)
    t0 = time.perf_counter()
    losses = []
    for i in range(steps):
        trainable, opt_state, loss = step(trainable, opt_state,
                                          jax.random.fold_in(key, i))
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
        out["psnr_gate"] = psnr_gate
        promoted = (out["qat_psnr"] > max(out["ptq_psnr"], psnr_gate))
        out["promoted"] = promoted
        if promoted:
            dest = os.path.join(os.path.dirname(artifact) or ".",
                                "artifact_int8.npz")
            save_denoiser_artifact(dest, cfg, new_vars, quant={
                "mode": mode, "amax": amax2,
                "psnr": out["qat_psnr"],
                "float_psnr": out["qat_float_psnr"],
                "psnr_gate": psnr_gate, "qat_steps": steps,
                "img_per_s_at_check": out["qat_img_per_s"]})
            out["promoted_artifact"] = dest
    with open(os.path.join(out_dir, "qat.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/flagship/artifact.npz",
         a[1] if len(a) > 1 else "docs/runs/qat_r3",
         int(a[2]) if len(a) > 2 else 3000,
         int(a[3]) if len(a) > 3 else 16,
         float(a[4]) if len(a) > 4 else 2e-5,
         psnr_gate=float(a[5]) if len(a) > 5 else None,
         trainable_last_n=int(a[6]) if len(a) > 6 else None)
