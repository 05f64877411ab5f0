"""Auto-select (J-invariant) quality check across every policy family.

Scores three serving modes on each flagship-decision ladder:

  * nn      — the shipped int8 bundle alone,
  * classical — the per-family BEST classical filter (clean-reference
    oracle, the decision gate's bar),
  * auto    — emx.serve.select.auto_denoise choosing per image among
    {nn, gaussian, median, wiener} on the noisy frame alone.

The claim under test: the selector keeps the NN's in-family wins while
routing out-of-family images to a classical filter, so the AUTO mode's
margin over best classical is >= ~0 on EVERY family — with no clean
data and no family oracle at serve time (the structural fix for OOD
inputs that corpus breadth alone cannot finish).

Usage: python -m emx.bench.auto_select_check [bundle] [out_path]
Writes docs/runs/flagship/auto_select.json.
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def main(bundle: str = "docs/runs/flagship/artifact_int8.npz",
         out_path: str = "docs/runs/flagship/auto_select.json") -> dict:
    import dataclasses

    from emx.analysis.filters import (chambolle_tv, gaussian_filter,
                                      median_filter, wiener_filter)
    from emx.bench.flagship_decision import FAMILIES
    from emx.bench.quant_check import _ood_ladder, _val_ladder
    from emx.nn import Denoiser
    from emx.serve.artifact import load_denoiser_artifact
    from emx.serve.quantize import quantized_apply
    from emx.serve.select import auto_denoise
    from emx.utils.image import psnr

    cfg, variables, quant = load_denoiser_artifact(bundle,
                                                   with_quant=True)
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    if quant is not None:
        nn_fn = jax.jit(quantized_apply(model, variables, quant["amax"],
                                        quant["mode"],
                                        skip=quant.get("skip", ())))
    else:
        nn_fn = jax.jit(lambda x: model.apply(variables, x, train=False))

    def f32(fn):
        return lambda x: fn(x).astype(jnp.float32)

    candidates = [
        f32(nn_fn),
        jax.jit(jax.vmap(lambda x: gaussian_filter(x, 1.0))),
        jax.jit(jax.vmap(lambda x: median_filter(x, 1))),
        jax.jit(jax.vmap(lambda x: wiener_filter(x, 1))),
        jax.jit(jax.vmap(lambda x: chambolle_tv(x, 0.1))),
    ]
    names = ["nn", "gaussian", "median", "wiener", "tv"]

    rows = {}
    for fam in FAMILIES:
        noisy, clean = (_val_ladder() if fam == "val"
                        else _ood_ladder(family=fam.split("_", 1)[1]))
        per = {}
        for name, fn in zip(names, candidates):
            per[name] = round(float(jnp.mean(jax.vmap(psnr)(
                fn(noisy), clean))), 3)
        # The gate's bar is the FULL six-filter classical ladder (the
        # selector's candidate subset may understate it).
        from emx.analysis.filters import compare_denoisers

        res = compare_denoisers(noisy, clean)
        best_cl = round(max(v["psnr"] for k, v in res.items()
                            if k != "identity"), 3)
        out_img, chosen = auto_denoise(noisy, candidates,
                                       jax.random.key(7), n_masks=4)
        auto = round(float(jnp.mean(jax.vmap(psnr)(
            out_img.astype(jnp.float32), clean))), 3)
        counts = np.bincount(np.asarray(chosen),
                             minlength=len(names)).tolist()
        rows[fam] = {"per_candidate_psnr": per, "auto_psnr": auto,
                     "best_classical_psnr": best_cl,
                     "auto_margin": round(auto - best_cl, 3),
                     "nn_margin": round(per["nn"] - best_cl, 3),
                     "chosen_counts": dict(zip(names, counts))}
        print(fam, json.dumps(rows[fam]), flush=True)

    out = {"metric": "auto_select_check", "bundle": bundle,
           "n_masks": 4, "families": rows,
           "worst_auto_margin": round(
               min(r["auto_margin"] for r in rows.values()), 3),
           "worst_nn_margin": round(
               min(r["nn_margin"] for r in rows.values()), 3)}
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/flagship/artifact_int8.npz",
         a[1] if len(a) > 1 else "docs/runs/flagship/auto_select.json")
