"""North-star benchmark: end-to-end 512x512 micrograph denoise throughput
on one chip (BASELINE.md: target >= 5000 img/s/chip on v5e).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N,
   "extras": {"ewrec_iters_per_s": ..., "host_loader_img_per_s": ...,
              "device_degrade_img_per_s": ...}}

The primary metric is the flagship denoiser (full reference widths,
bfloat16 compute) in inference mode over batched 512x512 crops,
steady-state, excluding compile. `extras` tracks the EWREC GS-iteration
rate and the input-pipeline rates every round so BASELINE.md's
"to be established" rows get driver-recorded numbers (VERDICT r1 item 8).
Set EMX_BENCH_EXTRAS=0 to skip them, EMX_BENCH_TRACE=<dir> to capture a
jax.profiler trace of the steady-state denoise launches.
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

    # Profiles (measurement ladder + quality ladder in
    # docs/architecture.md):
    #   fast    — space_to_depth=4, batch 96, 64-deep chains (throughput
    #             profile; the PRODUCTION-WIDTH quality ladder puts its
    #             PSNR far below s2d=2 — see quality_run artifacts)
    #   quality — space_to_depth=2 (flagship deployment default: 36.4 dB,
    #             beats all six classical filters at 20k steps)
    # Both run the deployment graph: a BatchNorm-trained model folded
    # into its norm-free twin (emx.serve.optimize.fold_batchnorm — exact
    # at inference; norm ops otherwise cost ~43% of runtime on v5e).
    profile = os.environ.get("EMX_BENCH_PROFILE", "fast")
    s2d = 4 if profile == "fast" else 2
    batch = int(os.environ.get("EMX_BENCH_BATCH", "96"))
    frh = int(os.environ.get("EMX_BENCH_FRH", "0"))
    mrh = int(os.environ.get("EMX_BENCH_MRH", "0"))
    # EMX_BENCH_ARTIFACT: path to a trained deployment bundle
    # (emx.serve.artifact). When set, the measured program is the exact
    # served graph — config AND weights — closing the "benched graph =
    # served graph" provenance (VERDICT r2 weak #7). Default: the
    # checked-in trained flagship artifact, if present.
    # Default artifact: the int8-promoted bundle when quant_check has
    # written one (it only exists if its val-ladder PSNR cleared the
    # classical-filter gate AND it out-ran the float graph), else the
    # float flagship bundle.
    _flagship = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "docs", "runs", "flagship")
    _default = os.path.join(_flagship, "artifact_int8.npz")
    if not os.path.exists(_default):
        _default = os.path.join(_flagship, "artifact.npz")
    artifact = os.environ.get("EMX_BENCH_ARTIFACT", _default)
    quant = None
    if artifact and os.path.exists(artifact):
        from emx.serve.artifact import load_denoiser_artifact

        cfg, variables, quant = load_denoiser_artifact(
            artifact, with_quant=True)
        cfg = __import__("dataclasses").replace(cfg, dtype=jnp.bfloat16)
        model = Denoiser(cfg)
        # EMX_BENCH_QUANT overrides the artifact's promoted mode:
        # "0" forces the float graph, "store"/"mxu" force a mode.
        q_env = os.environ.get("EMX_BENCH_QUANT", "")
        if q_env == "0":
            quant = None
        elif q_env in ("store", "mxu") and quant is not None:
            quant = dict(quant, mode=q_env)
    else:
        artifact = None
        cfg = DenoiserConfig(norm="none", dtype=jnp.bfloat16,
                             space_to_depth=s2d, full_res_head=frh,
                             mid_res_head=mrh,
                             folded_head=int(os.environ.get(
                                 "EMX_BENCH_FOLD", "0")))
        model = Denoiser(cfg)
        x0 = jnp.zeros((batch, 512, 512), jnp.float32)
        variables = model.init(jax.random.key(0), x0, train=False)
    # bf16-resident weights: halves weight HBM traffic (compute is bf16
    # anyway; flax would otherwise re-cast f32 params at every use).
    variables = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables,
    )
    # Device-resident ONCE: numpy-backed weights passed as jit args are
    # re-uploaded through the tunnel on EVERY launch (~20% of wall-clock
    # at chain 64); device_put makes later launches zero-copy.
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)

    # Chain `chain` forward passes on-device inside ONE program (lax.scan)
    # so per-launch host/tunnel latency is amortised, and force a host
    # readback of the accumulator — on tunneled backends
    # block_until_ready can return before remote execution completes.
    chain = int(os.environ.get("EMX_BENCH_CHAIN", "64"))

    if quant is not None:
        # The artifact ships a quant_check-verified int8 serving mode:
        # measure THAT graph (int8 fusion-boundary stores / MXU int8
        # matmuls), not its float twin. A hash-guarded serve_mode.json
        # sidecar (emx.serve.fused.load_serve_mode, written by
        # serve_perf at matched quality) may route qualifying 128^2
        # SepConvBlocks through the fused Pallas kernel.
        from emx.serve.fused import (dense_quantized_apply,
                                     fused_quantized_apply,
                                     load_serve_mode)
        from emx.serve.quantize import quantized_apply

        smode = load_serve_mode(artifact) or {}
        if os.environ.get("EMX_BENCH_FUSED", ""):
            smode = {"fused_rows": int(os.environ["EMX_BENCH_FUSED"])}
        if os.environ.get("EMX_BENCH_DENSE", ""):
            smode = {"dense": os.environ["EMX_BENCH_DENSE"]}
        fused_rows = int(smode.get("fused_rows", 0))
        dense = smode.get("dense", "")
        if dense:
            # Dense-folded SepConvBlocks (serve_perf-promoted): the
            # dw->pw pair runs as one MXU-shaped conv.
            def apply_fn(v, x):
                return dense_quantized_apply(
                    model, v, quant["amax"], mode=quant["mode"],
                    skip=quant.get("skip", ()),
                    quantized=dense == "int8")(x)
        elif fused_rows:
            def apply_fn(v, x):
                return fused_quantized_apply(
                    model, v, quant["amax"], mode=quant["mode"],
                    skip=quant.get("skip", ()), rows=fused_rows,
                    interpret=jax.default_backend() == "cpu")(x)
        else:
            def apply_fn(v, x):
                return quantized_apply(model, v, quant["amax"],
                                       mode=quant["mode"],
                                       skip=quant.get("skip", ()))(x)
    else:
        def apply_fn(v, x):
            return model.apply(v, x, train=False)

    @jax.jit
    def run_chain(v, xs):
        def body(acc, x):
            return acc + jnp.sum(apply_fn(v, x)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return acc

    # bf16 resident inputs generated ON-DEVICE: a host-built (chain,
    # batch, 512, 512) stack is up to GBs and its upload through the
    # tunnel dominates wall-clock (input values are irrelevant to
    # throughput). jax.random keeps startup seconds-fast at any chain.
    xs = jax.jit(
        lambda k: jax.random.uniform(
            k, (chain, batch, 512, 512), jnp.bfloat16)
    )(jax.random.key(0))
    jax.block_until_ready(xs)

    float(run_chain(variables, xs))  # compile + full roundtrip

    trace_dir = os.environ.get("EMX_BENCH_TRACE", "")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)

    # Median of 3 measurement groups: the tunnel adds +-20% run-to-run
    # variance (docs/architecture.md), and the median of consecutive
    # in-process groups is a far tighter estimator than one long window.
    n_launches = 4
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n_launches):
            acc = acc + run_chain(variables, xs)
        total = float(acc)
        dt = time.perf_counter() - t0
        assert np.isfinite(total)
        rates.append(batch * chain * n_launches / dt)

    if trace_dir:
        jax.profiler.stop_trace()

    img_per_s = sorted(rates)[1]

    extras: dict = {}
    if os.environ.get("EMX_BENCH_EXTRAS", "1") != "0":
        try:
            from emx.bench.ewrec_bench import measure as measure_ewrec

            ew = measure_ewrec()
            extras["ewrec_iters_per_s"] = ew["value"]
            extras["ewrec_full_recon_per_s"] = ew["full_reconstructions_per_s"]
        except Exception as e:  # extras must never sink the primary metric
            extras["ewrec_error"] = str(e)[:120]
        try:
            from emx.bench.pipeline_bench import measure as measure_pipe

            pb = measure_pipe(n_files=128)
            extras["host_loader_img_per_s"] = pb["host_loader_img_per_s"]
            extras["host_loader_u16_img_per_s"] = pb.get(
                "host_loader_u16_img_per_s")
            extras["host_loader_u8_img_per_s"] = pb.get(
                "host_loader_u8_img_per_s")
            extras["host_loader_f16_img_per_s"] = pb.get(
                "host_loader_f16_img_per_s")
            extras["host_loader_tiff_img_per_s"] = pb.get(
                "host_loader_tiff_img_per_s")
            extras["device_degrade_img_per_s"] = pb["device_degrade_img_per_s"]
        except Exception as e:
            extras["pipeline_error"] = str(e)[:120]

    extras["throughput_groups"] = [round(r, 1) for r in rates]
    if artifact:
        extras["artifact"] = os.path.relpath(
            artifact, os.path.dirname(os.path.abspath(__file__)))
        extras["artifact_cfg"] = {
            "s2d": cfg.space_to_depth, "mid_res_head": cfg.mid_res_head,
            "full_res_head": cfg.full_res_head,
            "folded_head": cfg.folded_head}
        if quant is not None:
            extras["quant"] = {k: v for k, v in quant.items()
                               if k not in ("amax", "skip")} | {
                "n_quantized_convs": (len(quant["amax"])
                                      - len(quant.get("skip", ()))),
                "n_skipped_convs": len(quant.get("skip", ())),
                "fused_rows": fused_rows, "dense": dense}
        # The coupled quality evidence for the measured graph: the
        # training run's val-ladder PSNR vs the classical-filter bar
        # (quality.json is written next to the artifact by quality_run).
        qpath = os.path.join(os.path.dirname(artifact), "quality.json")
        if os.path.exists(qpath):
            with open(qpath) as f:
                q = json.load(f)
            extras["artifact_quality"] = {
                "nn_psnr": q.get("nn_psnr"),
                "nn_folded_psnr": q.get("nn_folded_psnr"),
                "best_classical": q.get("best_classical"),
                "identity_psnr": q.get("identity_psnr"),
                "steps": q.get("steps"),
            }
    print(json.dumps({
        "metric": "denoiser_512_throughput",
        "value": round(img_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / BASELINE_IMG_S, 4),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
