"""Post-training int8 quantization: both modes must compile and stay
numerically close to the float model on the deployment (norm-free)
denoiser graph."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from emx.nn import Denoiser, DenoiserConfig
from emx.serve.quantize import calibrate, quantized_apply


def _model_and_vars():
    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=4, folded_head=16)
    model = Denoiser(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64)),
                    jnp.float32)
    variables = model.init(jax.random.key(1), x, train=False)
    return model, variables, x


def test_calibrate_records_every_conv():
    model, variables, x = _model_and_vars()
    amax = calibrate(model, variables, [x])
    n_convs = sum(1 for p in jax.tree_util.tree_leaves_with_path(
        variables["params"])
        if getattr(p[0][-1], "key", "") == "kernel"
        and "ConvTranspose" not in str(p[0]))
    assert len(amax) == n_convs
    # Per-channel by default: each entry spans that conv's input width.
    assert all(np.asarray(v).ndim == 1 and np.all(np.asarray(v) >= 0)
               and np.max(v) > 0 for v in amax.values())


def test_calibrate_execution_order():
    """return_order must give conv paths in EXECUTION order (the amax
    dict itself is key-sorted by the jit pytree roundtrip): the folded
    head's convs come last."""
    model, variables, x = _model_and_vars()
    amax, order = calibrate(model, variables, [x], return_order=True)
    assert set(order) == set(amax) and len(order) == len(amax)
    # tiny() + folded_head: the output conv executes last.
    assert list(amax) != order  # sorted vs traced order differ
    last_tops = {p.split("/")[0] for p in order[-2:]}
    assert any(t.startswith("ConvBlock") for t in last_tops)


def test_calibrate_per_tensor_and_quantile():
    model, variables, x = _model_and_vars()
    amax_t = calibrate(model, variables, [x], per_channel=False)
    assert all(np.isscalar(v) and v > 0 for v in amax_t.values())
    amax_q = calibrate(model, variables, [x], quantile=0.99)
    amax_m = calibrate(model, variables, [x])
    for k in amax_m:
        assert np.all(np.asarray(amax_q[k]) <= np.asarray(amax_m[k]) + 1e-6)


def test_skip_leaves_conv_float():
    model, variables, x = _model_and_vars()
    amax = calibrate(model, variables, [x])
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(quantized_apply(model, variables, amax, "mxu",
                                     skip=list(amax))(x))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_quant_promoted_artifact_roundtrip(tmp_path):
    """An int8-promoted bundle (emx.serve.artifact quant entry) carries
    mode + amax through save/load, and the reloaded quantized graph
    reproduces the in-memory quantized output exactly."""
    from emx.serve.artifact import (load_denoiser_artifact,
                                    save_denoiser_artifact)

    model, variables, x = _model_and_vars()
    amax = calibrate(model, variables, [x])
    path = str(tmp_path / "artifact_int8.npz")
    save_denoiser_artifact(path, model.config, variables,
                           quant={"mode": "mxu", "amax": amax,
                                  "psnr": 37.0})
    cfg2, vars2, quant2 = load_denoiser_artifact(path, with_quant=True)
    assert quant2["mode"] == "mxu" and quant2["psnr"] == 37.0
    assert set(quant2["amax"]) == set(amax)
    ref = np.asarray(quantized_apply(model, variables, amax, "mxu")(x))
    got = np.asarray(quantized_apply(
        __import__("emx.nn", fromlist=["Denoiser"]).Denoiser(cfg2),
        vars2, quant2["amax"], "mxu")(x))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # Plain load keeps the 2-tuple contract.
    cfg3, vars3 = load_denoiser_artifact(path)
    assert cfg3 == cfg2


def test_fake_quant_matches_quantized_forward_and_is_trainable():
    """fake_quant_apply (STE twin) must reproduce quantized_apply's
    forward within accumulation tolerance, and a few QAT steps on the
    fake-quant loss must reduce the REAL quantized loss."""
    import optax

    from emx.serve.quantize import fake_quant_apply

    model, variables, x = _model_and_vars()
    amax = calibrate(model, variables, [x])
    for mode in ("store", "mxu"):
        got_q = np.asarray(quantized_apply(model, variables, amax, mode)(x))
        got_f = np.asarray(fake_quant_apply(model, amax, mode)(variables, x))
        assert np.abs(got_q - got_f).mean() < 2e-3, mode

    # Trainability: STE gradients are finite/nonzero, and descending the
    # fake-quant loss toward a nontrivial target also moves the REAL
    # quantized graph toward it (the whole point of QAT).
    fq = fake_quant_apply(model, amax, "mxu")
    target = jnp.asarray(np.random.default_rng(7).random(x.shape),
                         jnp.float32) * 0.5 + 0.25

    def loss_fn(p):
        return jnp.mean((fq({"params": p}, x) - target) ** 2)

    params = variables["params"]
    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.linalg.norm(l))
             for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms) and max(norms) > 0

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def q_loss(p):
        pred = quantized_apply(model, {"params": p}, amax, "mxu")(x)
        return float(jnp.mean((jnp.asarray(pred) - target) ** 2))

    before = q_loss(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s

    for _ in range(30):
        params, opt_state = step(params, opt_state)
    assert q_loss(params) < before


def test_quantized_outputs_close_to_float():
    model, variables, x = _model_and_vars()
    amax = calibrate(model, variables, [x])
    ref = np.asarray(model.apply(variables, x, train=False))
    for mode in ("store", "mxu"):
        fn = jax.jit(quantized_apply(model, variables, amax, mode=mode))
        got = np.asarray(fn(x))
        err = np.abs(got - ref).mean()
        assert err < 0.02, (mode, err)


def test_folded_head_tail_replicates_full_model():
    """FoldedHeadTail with params mapped from the full Denoiser must
    reproduce the full model's output exactly, given the captured
    folded-head input (the head-distillation contract)."""
    from emx.nn.denoiser import FoldedHeadTail, tail_param_names

    model, variables, x = _model_and_vars()
    amax, order = calibrate(model, variables, [x], return_order=True)
    mapping = tail_param_names(order, model.config.folded_head_depth)
    first_head_conv = next(p for p in order
                           if p.split("/")[0] in mapping)
    # Float path (amax={} quantizes nothing) with feature capture.
    full_out, cat = quantized_apply(model, variables, {},
                                    capture=first_head_conv)(x)
    tail = FoldedHeadTail(model.config)
    tail_params = {new: variables["params"][old]
                   for old, new in mapping.items()}
    tail_out = tail.apply({"params": tail_params}, cat)
    np.testing.assert_allclose(np.asarray(tail_out),
                               np.asarray(full_out), atol=1e-6)


def test_deep_tail_replicates_full_model():
    """FoldedHeadTail(include_refine=True) — the body-resolution
    refinement block + folded head — must reproduce the full model's
    output exactly given features captured BEFORE the refinement block
    and the raw input batch (the deep tail-distillation contract)."""
    from emx.nn.denoiser import FoldedHeadTail, tail_param_names

    model, variables, x = _model_and_vars()
    amax, order = calibrate(model, variables, [x], return_order=True)
    mapping = tail_param_names(order, model.config.folded_head_depth,
                               scope="refine")
    assert len(mapping) == model.config.folded_head_depth + 5
    first_conv = next(p for p in order if p.split("/")[0] in mapping)
    full_out, h = quantized_apply(model, variables, {},
                                  capture=first_conv)(x)
    tail = FoldedHeadTail(model.config, tail_scope="refine")
    tail_params = {new: variables["params"][old]
                   for old, new in mapping.items()}
    tail_out = tail.apply({"params": tail_params}, (h, x))
    np.testing.assert_allclose(np.asarray(tail_out),
                               np.asarray(full_out), atol=1e-6)


def test_decoder_tail_replicates_full_model():
    """FoldedHeadTail(scope='decoder') — second decoder stage (incl. the
    ConvTranspose DeconvBlock) + refinement + folded head — must
    reproduce the full model's output exactly given the captured
    skip-concat and the raw input batch."""
    from emx.nn.denoiser import FoldedHeadTail, tail_param_names

    model, variables, x = _model_and_vars()
    amax, order = calibrate(model, variables, [x], return_order=True)
    mapping = tail_param_names(order, model.config.folded_head_depth,
                               scope="decoder")
    assert len(mapping) == model.config.folded_head_depth + 9
    assert mapping["DeconvBlock_1"] == "DeconvBlock_0"
    first_conv = next(p for p in order if p.split("/")[0] in mapping)
    full_out, cat2 = quantized_apply(model, variables, {},
                                     capture=first_conv)(x)
    tail = FoldedHeadTail(model.config, tail_scope="decoder")
    tail_params = {new: variables["params"][old]
                   for old, new in mapping.items()}
    tail_out = tail.apply({"params": tail_params}, (cat2, x))
    np.testing.assert_allclose(np.asarray(tail_out),
                               np.asarray(full_out), atol=1e-6)


def test_decoder2_tail_replicates_full_model():
    """FoldedHeadTail(scope='decoder2') — the WHOLE decoder (both stages
    incl. both ConvTranspose DeconvBlocks) + refinement + folded head —
    must reproduce the full model exactly given the first decoder
    stage's captured concat, encoder tap 0 (sliced from the second
    stage's captured concat), and the raw batch."""
    from emx.nn.denoiser import FoldedHeadTail, tail_param_names

    model, variables, x = _model_and_vars()
    amax, order = calibrate(model, variables, [x], return_order=True)
    mapping = tail_param_names(order, model.config.folded_head_depth,
                               scope="decoder2")
    assert len(mapping) == model.config.folded_head_depth + 13
    assert mapping["DeconvBlock_0"] == "DeconvBlock_0"
    assert mapping["DeconvBlock_1"] == "DeconvBlock_1"
    inv = {v: k for k, v in mapping.items()}
    caps = tuple(next(p for p in order if p.split("/")[0] == inv[n])
                 for n in ("SepConvBlock_0", "SepConvBlock_2"))
    full_out, (cat1, cat2) = quantized_apply(model, variables, {},
                                             capture=caps)(x)
    f2 = model.config.features[2]
    tail = FoldedHeadTail(model.config, tail_scope="decoder2")
    tail_params = {new: variables["params"][old]
                   for old, new in mapping.items()}
    tail_out = tail.apply({"params": tail_params},
                          (cat1, cat2[..., f2:], x))
    np.testing.assert_allclose(np.asarray(tail_out),
                               np.asarray(full_out), atol=1e-6)


def test_flagship_decision_policy():
    """select_winner: hard gates (val PSNR + throughput), then maximin
    per-family classical margin, ties by val PSNR — the documented
    policy that prevents an in-family-only bundle from shipping when a
    robust bundle exists (docs/runs/quant_r3/ood_check.json motivation)."""
    from emx.bench.flagship_decision import select_winner

    def row(name, val, ctf, grains, rate, bars=(36.0, 29.5, 25.0)):
        fams = {"val": (val, bars[0]), "ood_ctf": (ctf, bars[1]),
                "ood_grains": (grains, bars[2])}
        r = {"bundle": name, "img_per_s": rate}
        for f, (nn, bar) in fams.items():
            r[f] = {"nn_psnr": nn, "best_classical": ["x", bar],
                    "margin": round(nn - bar, 3)}
        return r

    # Synthetic-overfit bundle: huge val margin, loses OOD.
    overfit = row("overfit", 44.5, 23.7, 24.0, 5380.0)
    # Robust bundle: smaller val margin, wins everywhere.
    robust = row("robust", 41.0, 31.0, 27.0, 5340.0)
    # Fails the throughput gate despite the best margins.
    slow = row("slow", 43.0, 33.0, 30.0, 1500.0)
    # Fails the val gate.
    weak = row("weak", 35.0, 31.0, 28.0, 6000.0)

    w = select_winner([overfit, robust, slow, weak], 36.01, 5000.0)
    assert w["bundle"] == "robust"
    # Without the robust candidate, the overfit one still ships (it
    # passes the hard gates; maximin only ranks the eligible set).
    w = select_winner([overfit, slow, weak], 36.01, 5000.0)
    assert w["bundle"] == "overfit"
    # Nobody eligible -> None.
    assert select_winner([slow, weak], 36.01, 5000.0) is None
    # Maximin tie within 0.1 dB -> higher val PSNR wins.
    a = row("a", 40.0, 31.00, 27.0, 5100.0)
    b = row("b", 42.0, 30.95, 27.0, 5100.0)
    assert select_winner([a, b], 36.01, 5000.0)["bundle"] == "b"


def test_flagship_decision_four_families_and_guard():
    """Round 4: the decision scores a fourth (filaments) family, and the
    candidate producers refuse to write the flagship path directly —
    promotion routes only through flagship_decision."""
    from emx.bench.flagship_decision import select_winner
    from emx.bench.quant_check import FLAGSHIP, _is_flagship

    def row(name, scores, rate):
        r = {"bundle": name, "img_per_s": rate}
        for f, (nn, bar) in scores.items():
            r[f] = {"nn_psnr": nn, "best_classical": ["x", bar],
                    "margin": round(nn - bar, 3)}
        return r

    fams = ("val", "ood_ctf", "ood_grains", "ood_filaments")
    # 'a' wins 3 families big but loses filaments; 'b' is robust on all.
    a = row("a", {"val": (44.0, 36.0), "ood_ctf": (32.0, 29.5),
                  "ood_grains": (30.0, 25.0),
                  "ood_filaments": (22.0, 27.0)}, 5400.0)
    b = row("b", {"val": (40.0, 36.0), "ood_ctf": (30.0, 29.5),
                  "ood_grains": (26.0, 25.0),
                  "ood_filaments": (27.5, 27.0)}, 5200.0)
    w = select_winner([a, b], 36.01, 5000.0, families=fams)
    assert w["bundle"] == "b"
    # The flagship path predicate the producers guard on.
    assert _is_flagship(FLAGSHIP)
    assert _is_flagship("docs/runs/flagship/../flagship/artifact_int8.npz")
    assert not _is_flagship("docs/runs/qat_r4/bundle.npz")


def test_flagship_decision_common_failure_family_degeneracy():
    """Regression for the round-4 incident: when a NEW family is
    uniformly hard for every candidate, plain maximin reduces to
    'least-bad on the new axis' and a 0.17 dB noise difference there
    outweighed a 6.6 dB ctf robustness difference (the identity-level-
    on-ctf specialist got promoted). The capped-margin-sum policy must
    pick the robust bundle. Numbers below are the real first 4-family
    DECISION rows."""
    from emx.bench.flagship_decision import select_winner

    def row(name, val, ctf, grains, fil, rate):
        bars = {"val": 36.013, "ood_ctf": 29.522, "ood_grains": 32.033,
                "ood_filaments": 39.791}
        vals = {"val": val, "ood_ctf": ctf, "ood_grains": grains,
                "ood_filaments": fil}
        r = {"bundle": name, "img_per_s": rate}
        for f, bar in bars.items():
            r[f] = {"nn_psnr": vals[f], "best_classical": ["x", bar],
                    "margin": round(vals[f] - bar, 3)}
        return r

    fams = ("val", "ood_ctf", "ood_grains", "ood_filaments")
    robust = row("robust", 43.321, 30.276, 27.524, 32.209, 5333.8)
    specialist = row("specialist", 44.463, 23.631, 27.452, 32.380, 5346.0)
    w = select_winner([robust, specialist], 36.01, 5000.0, families=fams)
    assert w["bundle"] == "robust"


def test_mxu2_quantizes_depthwise_and_stays_close():
    """mode='mxu2' runs grouped (depthwise) convs as int8 x int8 -> s32
    with the per-input-channel activation scale folded along the
    kernel's OUTPUT axis (group o reads channel o). It must stay as
    close to float as 'mxu' does, and its fake-quant twin must match
    its forward on a depthwise-only probe."""
    import flax.linen as nn

    from emx.serve.quantize import fake_quant_apply

    model, variables, x = _model_and_vars()
    amax = calibrate(model, variables, [x])
    ref = np.asarray(model.apply(variables, x, train=False))
    got_mxu = np.asarray(quantized_apply(model, variables, amax,
                                         "mxu")(x))
    got = np.asarray(quantized_apply(model, variables, amax, "mxu2")(x))
    err2 = float(np.mean((got - ref) ** 2))
    err1 = float(np.mean((got_mxu - ref) ** 2))
    assert err2 < max(4 * err1, 1e-4), (err1, err2)

    # Grouped int8 lowering correctness: a single depthwise conv must
    # match its float twin within the quantization grid (per-channel
    # input step + per-output weight step, 3x3 support).
    class DW(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                           feature_group_count=x.shape[-1],
                           dtype=jnp.float32)(x)

    dw = DW()
    rng = np.random.default_rng(3)
    xg = jnp.asarray(rng.normal(0, 40.0, (1, 8, 8, 4)), jnp.float32)
    vg = dw.init(jax.random.key(0), xg)
    am = calibrate(dw, vg, [xg])
    out_f = np.asarray(dw.apply(vg, xg))
    out_q = np.asarray(quantized_apply(dw, vg, am, "mxu2")(xg))
    w = np.asarray(vg["params"]["Conv_0"]["kernel"])
    # Error bound: 9 taps x (x_step/2 * |w| + w_step/2 * |x|).
    x_step = np.asarray(list(am.values())[0]) / 127.0
    bound = 9 * (np.max(x_step) / 2 * np.max(np.abs(w))
                 + np.max(np.abs(w) * x_step) / 127.0 / 2 * 127.0)
    assert np.max(np.abs(out_q - out_f)) < max(4 * bound, 1.0), (
        np.max(np.abs(out_q - out_f)), bound)

    # Fake-quant twin matches the real mxu2 forward.
    fq = fake_quant_apply(model, amax, mode="mxu2")
    got_fq = np.asarray(fq(variables, x))
    np.testing.assert_allclose(got_fq, got, atol=5e-3)


def test_denoiser_out_dtype_bf16():
    """out_dtype='bfloat16' halves the output path; values must match
    the f32 output within bf16 rounding."""
    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=2, dtype=jnp.bfloat16)
    model = Denoiser(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32)),
                    jnp.float32)
    variables = model.init(jax.random.key(1), x, train=False)
    out32 = model.apply(variables, x, train=False)
    model16 = Denoiser(dataclasses.replace(cfg, out_dtype="bfloat16"))
    out16 = model16.apply(variables, x, train=False)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), atol=4e-3)
