"""Quantized-deployment check: PSNR + throughput of the int8 modes
against the float artifact (emx.serve.quantize).

Loads a deployment artifact (emx.serve.artifact), scores the float
graph and both quantized modes on the low-dose val ladder quality_run
uses, and measures their inference throughput with the bench.py chain
harness. A quantized graph is only eligible to become the benched
deployment graph if its PSNR stays above the best classical filter.

Usage: python -m emx.bench.quant_check <artifact.npz> [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# The shipped deployment bundle. Only emx.bench.flagship_decision may
# write this path (multi-family maximin policy); candidate producers
# in this module and qat_finetune refuse to target it directly.
FLAGSHIP = "docs/runs/flagship/artifact_int8.npz"

# Canonical classical-filter bar on the val ladder (best classical =
# gaussian; full precision so every gate record matches — round-3
# advisor finding: a hand-rounded 36.01 broke gate-value consistency).
VAL_CLASSICAL_BAR = 36.01258850097656


def _is_flagship(path: str) -> bool:
    return os.path.abspath(path) == os.path.abspath(FLAGSHIP)


def _val_ladder(n=32, size=512):
    from emx.data.degrade import poisson_dose
    from emx.data.pipeline import synthetic_micrographs
    from emx.utils.image import sanitize, scale0to1

    imgs = jnp.asarray(synthetic_micrographs(n, size, seed=999))
    doses = jnp.asarray(np.linspace(25.0, 150.0, n).astype(np.float32))

    @jax.jit
    def make(imgs, doses):
        def one(k, img, dose):
            img = scale0to1(sanitize(img))
            lq = poisson_dose(k, img, dose)
            tgt = img * (jnp.mean(lq) / jnp.maximum(jnp.mean(img), 1e-12))
            return lq, tgt

        keys = jax.random.split(jax.random.key(7), imgs.shape[0])
        return jax.vmap(one)(keys, imgs, doses)

    return make(imgs, doses)


def _ood_ladder(n=32, size=512, family="ctf"):
    """Held-out evaluation ladders under the same low-dose range.
    family='ctf': CTF-lattice micrographs (seed 555 — disjoint from the
    mixed training corpus's ctf seed; held-out-IN-family for models
    trained on corpus='mixed'). family='grains': polycrystalline
    Voronoi micrographs (seed 321; held-out-in-family once grains
    joined the round-4 training mix, true OOD for earlier bundles).
    family='filaments': curvilinear worm-like tubes + vesicle rings
    (seed 777; held-out-in-family once filaments joined the round-5
    'mixed3' training mix — training seed 40_000). family='porous':
    bicontinuous spinodal foam (seed 444) — NEVER in any training
    corpus, the standing true-OOD probe."""
    from emx.data.degrade import poisson_dose
    from emx.data.pipeline import (ctf_micrographs, filament_micrographs,
                                   grain_micrographs, porous_micrographs)
    from emx.utils.image import sanitize, scale0to1

    if family == "grains":
        imgs = jnp.asarray(grain_micrographs(n, size, seed=321))
    elif family == "filaments":
        imgs = jnp.asarray(filament_micrographs(n, size, seed=777))
    elif family == "porous":
        imgs = jnp.asarray(porous_micrographs(n, size, seed=444))
    else:
        imgs = jnp.asarray(ctf_micrographs(n, size, seed=555))
    doses = jnp.asarray(np.linspace(25.0, 150.0, n).astype(np.float32))

    @jax.jit
    def make(imgs, doses):
        def one(k, img, dose):
            img = scale0to1(sanitize(img))
            lq = poisson_dose(k, img, dose)
            tgt = img * (jnp.mean(lq) / jnp.maximum(jnp.mean(img),
                                                    1e-12))
            return lq, tgt

        keys = jax.random.split(jax.random.key(13), imgs.shape[0])
        return jax.vmap(one)(keys, imgs, doses)

    return make(imgs, doses)


def _psnr(pred, truth):
    from emx.utils.image import psnr

    return round(float(jnp.mean(jax.vmap(psnr)(pred, truth))), 3)


def _throughput(apply_fn, batch=96, chain=16) -> float:
    xs = jax.jit(lambda k: jax.random.uniform(
        k, (chain, batch, 512, 512), jnp.bfloat16))(jax.random.key(0))
    jax.block_until_ready(xs)

    @jax.jit
    def run(xs):
        def body(acc, x):
            return acc + jnp.sum(apply_fn(x)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return acc

    float(run(xs))
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(2):
            acc = acc + run(xs)
        assert np.isfinite(float(acc))
        rates.append(batch * chain * 2 / (time.perf_counter() - t0))
    return round(sorted(rates)[1], 1)


def main(artifact: str, out_dir: str = "docs/runs/quant_r3",
         throughput: bool = True,
         psnr_gate: float | None = None) -> dict:
    from emx.nn import Denoiser
    from emx.serve.artifact import load_denoiser_artifact
    from emx.serve.quantize import calibrate, quantized_apply

    os.makedirs(out_dir, exist_ok=True)
    cfg, variables = load_denoiser_artifact(artifact)
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    noisy, clean = _val_ladder()

    @jax.jit
    def float_fn(x):
        return model.apply(variables, x, train=False)

    # Calibrate on a slice of the ladder inputs (the served regime).
    # Per-input-channel ranges: the folded graph bakes BN affines into
    # the convs, so channel dynamic ranges vary wildly and a per-tensor
    # scale wastes the 8-bit grid (emx/serve/quantize.py docstring).
    amax = calibrate(model, variables, [noisy[:8]])

    out: dict = {"metric": "quant_check", "artifact": artifact,
                 "float_psnr": _psnr(float_fn(noisy), clean)}
    fns = {"float": float_fn}
    skips: dict[str, tuple] = {}
    for mode in ("store", "mxu"):
        try:
            fn = jax.jit(quantized_apply(model, variables, amax,
                                         mode=mode))
            out[f"{mode}_psnr"] = _psnr(fn(noisy), clean)
            fns[mode] = fn
            skips[mode] = ()
        except Exception as e:
            out[f"{mode}_error"] = str(e)[:200]

    # Sensitivity-guided repair: if a mode misses the gate, rank conv
    # GROUPS (top-level module prefix) by the PSNR damage of quantizing
    # that group alone, then skip the most damaging groups until the
    # gate passes. The skip list ships inside the promoted bundle so
    # bench serves exactly the checked configuration.
    if psnr_gate is not None:
        groups = sorted({p.split("/")[0] for p in amax})
        for mode in ("mxu", "store"):
            if mode not in fns or out[f"{mode}_psnr"] >= psnr_gate:
                continue
            damage = {}
            for g in groups:
                only_g = [p for p in amax if not p.startswith(g + "/")
                          and p != g]
                fn_g = jax.jit(quantized_apply(model, variables, amax,
                                               mode=mode, skip=only_g))
                damage[g] = out["float_psnr"] - _psnr(fn_g(noisy), clean)
            out[f"{mode}_group_damage"] = {
                g: round(d, 3) for g, d in sorted(
                    damage.items(), key=lambda kv: -kv[1])}
            skip: list[str] = []
            for g, d in sorted(damage.items(), key=lambda kv: -kv[1]):
                skip += [p for p in amax
                         if p.startswith(g + "/") or p == g]
                fn_s = jax.jit(quantized_apply(model, variables, amax,
                                               mode=mode, skip=skip))
                p_s = _psnr(fn_s(noisy), clean)
                if p_s >= psnr_gate:
                    out[f"{mode}_psnr"] = p_s
                    out[f"{mode}_skip_groups"] = sorted(
                        {s.split('/')[0] for s in skip})
                    fns[mode] = fn_s
                    skips[mode] = tuple(skip)
                    break
    if throughput:
        for name, fn in fns.items():
            try:
                out[f"{name}_img_per_s"] = _throughput(fn)
            except Exception as e:
                out[f"{name}_throughput_error"] = str(e)[:200]
    # Promotion: the fastest quantized mode whose val-ladder PSNR clears
    # `psnr_gate` (the best classical filter) AND that beats the float
    # graph's throughput gets written as an int8-promoted bundle that
    # bench.py serves directly (emx.serve.artifact quant entry).
    if psnr_gate is not None:
        from emx.serve.artifact import save_denoiser_artifact

        float_tp = out.get("float_img_per_s", float("inf"))
        best = None
        for mode in ("mxu", "store"):
            p, t = out.get(f"{mode}_psnr"), out.get(f"{mode}_img_per_s")
            if p is None or t is None or p < psnr_gate or t <= float_tp:
                continue
            if best is None or t > out[f"{best}_img_per_s"]:
                best = mode
        out["psnr_gate"] = psnr_gate
        out["promoted_mode"] = best
        if best is not None:
            dest = os.path.join(os.path.dirname(artifact) or ".",
                                "artifact_int8.npz")
            if _is_flagship(dest):
                # The flagship path is written ONLY by
                # flagship_decision (multi-family maximin gate); park
                # the candidate beside the run record instead.
                dest = os.path.join(out_dir, "bundle.npz")
            # Never regress an existing promoted bundle (same contract
            # as emx.bench.qat_finetune: distilled bundles carry val
            # PSNR far above a fresh PTQ of the same float artifact).
            if os.path.exists(dest):
                _, _, q_inc = load_denoiser_artifact(dest,
                                                     with_quant=True)
                incumbent = float((q_inc or {}).get("psnr", -1.0))
                out["incumbent_psnr"] = incumbent
                if out[f"{best}_psnr"] <= incumbent:
                    best = None
                    out["promoted_mode"] = None
        if best is not None:
            save_denoiser_artifact(dest, cfg, variables, quant={
                "mode": best, "amax": amax,
                "skip": list(skips.get(best, ())),
                "psnr": out[f"{best}_psnr"],
                "float_psnr": out["float_psnr"],
                "psnr_gate": psnr_gate,
                "img_per_s_at_check": out[f"{best}_img_per_s"]})
            out["promoted_artifact"] = dest
    with open(os.path.join(out_dir, "quant_check.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


def calib_independence(bundle: str = "docs/runs/flagship/artifact_int8.npz",
                       out_dir: str = "docs/runs/qat_r3") -> dict:
    """Evidence that the promoted bundle's PSNR does not hinge on
    calibrating activation scales with val-ladder inputs: recalibrate
    amax on TRAINING-corpus degradations (disjoint seed from the
    ladder's micrographs) and re-score the ladder with those scales.
    Static PTQ calibration is scale statistics only — if quality holds,
    the eval is clean of calibration leakage."""
    import dataclasses

    from emx.data.degrade import denoiser_example
    from emx.data.pipeline import synthetic_micrographs
    from emx.nn import Denoiser
    from emx.serve.artifact import load_denoiser_artifact
    from emx.serve.quantize import calibrate, quantized_apply

    cfg, variables, quant = load_denoiser_artifact(bundle, with_quant=True)
    assert quant is not None, "bundle has no promoted quant mode"
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    noisy, clean = _val_ladder()

    out = {"metric": "calib_independence", "bundle": bundle,
           "mode": quant["mode"]}
    out["ladder_calib_psnr"] = _psnr(
        jax.jit(quantized_apply(model, variables, quant["amax"],
                                quant["mode"],
                                skip=quant.get("skip", ())))(noisy), clean)
    # Train-corpus calibration set: same degradation recipe, disjoint
    # micrographs (seed 0 vs the ladder's 999).
    imgs = jnp.asarray(synthetic_micrographs(8, noisy.shape[-1], seed=0))
    lq, _ = jax.vmap(denoiser_example)(
        jax.random.split(jax.random.key(11), 8), imgs)
    amax_train = calibrate(model, variables, [lq])
    out["train_calib_psnr"] = _psnr(
        jax.jit(quantized_apply(model, variables, amax_train,
                                quant["mode"],
                                skip=quant.get("skip", ())))(noisy), clean)
    out["delta_db"] = round(
        out["ladder_calib_psnr"] - out["train_calib_psnr"], 3)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "calib_independence.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


def ood_check(bundle: str = "docs/runs/flagship/artifact_int8.npz",
              out_dir: str = "docs/runs/quant_r3",
              family: str = "ctf") -> dict:
    """Robustness evidence on an OUT-OF-FAMILY ladder, scored for the
    served bundle, its float twin, and every classical filter (the
    reference err_hist workload, misc_py/err_hist_maker.py:1-175, on a
    harder domain). family='ctf': weak-phase CTF lattice images
    (held-out-in-family once the model trains on corpus='mixed');
    family='grains': polycrystalline Voronoi micrographs — eval-only,
    never in any training corpus. Writes ood_check.json (ctf) or
    ood_check_<family>.json."""
    import dataclasses

    from emx.analysis.filters import compare_denoisers
    from emx.nn import Denoiser
    from emx.serve.artifact import load_denoiser_artifact
    from emx.serve.quantize import quantized_apply

    cfg, variables, quant = load_denoiser_artifact(bundle,
                                                   with_quant=True)
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = Denoiser(cfg)

    noisy, clean = _ood_ladder(family=family)
    if quant is not None:
        nn_fn = jax.jit(quantized_apply(model, variables, quant["amax"],
                                        quant["mode"],
                                        skip=quant.get("skip", ())))
    else:
        nn_fn = jax.jit(lambda x: model.apply(variables, x, train=False))
    results = compare_denoisers(noisy, clean, nn_fn=nn_fn)
    float_psnr = _psnr(
        jax.jit(lambda x: model.apply(variables, x, train=False))(noisy),
        clean)
    classical = {k: round(v["psnr"], 3) for k, v in results.items()
                 if k != "nn"}
    best = max(classical.items(), key=lambda kv: kv[1])
    out = {"metric": "ood_check", "bundle": bundle,
           "family": {"grains": "grain_micrographs",
                      "filaments": "filament_micrographs",
                      "porous": "porous_micrographs"}.get(
                          family, "ctf_micrographs"),
           "quant_mode": (quant or {}).get("mode", "float"),
           "nn_psnr": round(results["nn"]["psnr"], 3),
           "nn_float_psnr": float_psnr,
           "identity_psnr": _psnr(noisy, clean),
           "best_classical": list(best), "all": {
               **classical, "nn": round(results["nn"]["psnr"], 3)}}
    os.makedirs(out_dir, exist_ok=True)
    name = ("ood_check.json" if family == "ctf"
            else f"ood_check_{family}.json")
    with open(os.path.join(out_dir, name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    if a and a[0] == "calib":
        calib_independence(*a[1:])
    elif a and a[0] == "ood":
        ood_check(*a[1:])
    else:
        main(a[0] if a else "docs/runs/flagship/artifact.npz",
             a[1] if len(a) > 1 else "docs/runs/quant_r3",
             psnr_gate=float(a[2]) if len(a) > 2 else None)
