"""Speed-of-light analysis of the deployment graph.

Lowers the served graph (the exact program bench.py measures: flagship
int8 bundle, quantized_apply) through XLA, reads the compiler's own
cost analysis (flops / bytes accessed), and compares the measured
throughput against the v5e roofline:

  peak compute: 197 TFLOP/s bf16, 394 TOP/s int8     (public v5e specs)
  HBM bandwidth: 819 GB/s

Writes docs/runs/flagship/roofline.json. Runs on CPU (compile-only; the
HLO flop count is backend-independent for convs) — pass a platform arg
to force. Usage:
    python scripts/roofline.py [bundle] [batch] [measured_img_per_s]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

# Force CPU: the env bakes JAX_PLATFORMS=axon and sitecustomize
# pre-imports jax, so setdefault is NOT enough — a stray axon compile
# would contend with whatever chip job owns the single-job tunnel.
os.environ["JAX_PLATFORMS"] = os.environ.get("ROOFLINE_PLATFORM", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

V5E = {"bf16_flops": 197e12, "int8_ops": 394e12, "hbm_Bps": 819e9}


def main(bundle: str = "docs/runs/flagship/artifact_int8.npz",
         batch: int = 8, measured_img_per_s: float | None = None,
         size: int = 512) -> dict:
    from emx.nn import Denoiser
    from emx.serve.artifact import load_denoiser_artifact
    from emx.serve.quantize import quantized_apply

    cfg, variables, quant = load_denoiser_artifact(bundle,
                                                   with_quant=True)
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    if quant is not None:
        fn = quantized_apply(model, variables, quant["amax"],
                             quant["mode"], skip=quant.get("skip", ()))
    else:
        fn = lambda x: model.apply(variables, x, train=False)  # noqa

    x = jnp.zeros((batch, size, size), jnp.bfloat16)
    compiled = jax.jit(fn).lower(x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    flops_per_img = flops / batch
    bytes_per_img = bytes_accessed / batch
    # Weight bytes are amortised over the batch by XLA's analysis
    # already (one touch per launch); intensity uses the analysis value.
    intensity = flops / max(bytes_accessed, 1.0)

    mode = (quant or {}).get("mode", "float")
    peak = V5E["int8_ops"] if mode == "mxu" else V5E["bf16_flops"]
    sol_compute = peak / flops_per_img          # img/s if MXU-bound
    # NOTE: cost_analysis 'bytes accessed' is PRE-FUSION per-op traffic
    # — an upper bound on real HBM bytes. Fusion keeps intermediates in
    # VMEM, so measured throughput can legitimately exceed this
    # "naive-bytes" ceiling; when it does, that is direct evidence of
    # how much traffic the compiler eliminated.
    sol_naive_mem = V5E["hbm_Bps"] / bytes_per_img

    out = {"metric": "roofline", "bundle": bundle, "quant_mode": mode,
           "batch": batch, "size": size,
           "flops_per_img": flops_per_img,
           "hlo_prefusion_bytes_per_img": bytes_per_img,
           "arithmetic_intensity_flop_per_byte": round(intensity, 2),
           "v5e_peak_ops": peak, "v5e_hbm_Bps": V5E["hbm_Bps"],
           "sol_compute_img_per_s": round(sol_compute, 1),
           "sol_naive_membound_img_per_s": round(sol_naive_mem, 1)}
    if measured_img_per_s:
        out["measured_img_per_s"] = measured_img_per_s
        out["fraction_of_compute_peak"] = round(
            measured_img_per_s / sol_compute, 3)
        out["implied_hbm_bytes_per_img_upper"] = round(
            V5E["hbm_Bps"] / measured_img_per_s, 0)
        out["fusion_traffic_reduction_at_least"] = round(
            1.0 - (V5E["hbm_Bps"] / measured_img_per_s)
            / bytes_per_img, 3) if measured_img_per_s > sol_naive_mem \
            else 0.0
    os.makedirs("docs/runs/flagship", exist_ok=True)
    with open("docs/runs/flagship/roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/flagship/artifact_int8.npz",
         int(a[1]) if len(a) > 1 else 8,
         float(a[2]) if len(a) > 2 else None)
