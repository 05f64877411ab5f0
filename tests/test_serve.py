"""Tiled inference, artifact export, and HTTP serving tests."""

import http.client
import io
import json

import jax.numpy as jnp
import numpy as np
import pytest


def test_tiled_apply_identity_reconstructs():
    from emx.serve.tiling import tiled_apply

    img = np.random.default_rng(0).random((100, 140)).astype(np.float32)
    out = tiled_apply(lambda x: x, jnp.asarray(img), tile=48, overlap=16, batch=3)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_tiled_apply_small_image_pads():
    from emx.serve.tiling import tiled_apply

    img = np.random.default_rng(1).random((20, 30)).astype(np.float32)
    out = tiled_apply(lambda x: x, jnp.asarray(img), tile=32, overlap=8, batch=2)
    assert out.shape == (20, 30)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_tiled_apply_pad_exceeding_dim():
    """Images much smaller than the tile (pad width >= dim, where a
    single reflect pad raises) are grown by repeated reflection —
    the serving path routes every non-native-size request here."""
    from emx.serve.tiling import tiled_apply

    img = np.random.default_rng(4).random((20, 30)).astype(np.float32)
    out = tiled_apply(lambda x: x, jnp.asarray(img), tile=128,
                      overlap=16, batch=2)
    assert out.shape == (20, 30)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_tiled_applier_with_model():
    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.tiling import TiledApplier

    model = Denoiser(DenoiserConfig(features=(8, 12, 16, 24, 24),
                                    num_middle_blocks=1, aspp_filters=16,
                                    aspp_out=16, norm="group"))
    import jax

    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32)))
    applier = TiledApplier(model, variables, tile=32, overlap=8, batch=2)
    out = applier(np.random.default_rng(2).random((64, 80)).astype(np.float32))
    assert out.shape == (64, 80)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_artifact_roundtrip(tmp_path):
    import jax

    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.export import load_artifact, save_artifact

    cfg = DenoiserConfig(features=(8, 12, 16, 24, 24), num_middle_blocks=1,
                         aspp_filters=16, aspp_out=16, norm="group")
    model = Denoiser(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32)))
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32)), jnp.float32)
    expect = model.apply(variables, x, train=False)

    path = str(tmp_path / "artifact")
    save_artifact(path, "denoiser", cfg.__dict__, variables)
    art = load_artifact(path, template_variables=variables)
    out = art.apply_fn()(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)

    # Load without a template too (pure msgpack restore).
    art2 = load_artifact(path)
    out2 = art2.apply_fn()(x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(expect), atol=1e-6)


def _post_npy(port, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/api/predict", body=buf.getvalue())
    resp = conn.getresponse()
    assert resp.status == 200, resp.read()
    return np.load(io.BytesIO(resp.read()))


def test_inference_server_end_to_end():
    from emx.serve.server import InferenceServer

    srv = InferenceServer(lambda x: x * 2.0, port=0, max_batch=4)
    srv.start()
    try:
        img = np.random.default_rng(3).random((16, 16)).astype(np.float32)
        out = _post_npy(srv.port, img)
        np.testing.assert_allclose(out, img * 2.0, atol=1e-6)

        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["status"] == "ok"
        conn.request("GET", "/metrics")
        metrics = json.loads(conn.getresponse().read())
        assert metrics["requests"] >= 1
    finally:
        srv.stop()


def test_inference_server_batches_concurrent_requests():
    import threading

    from emx.serve.server import InferenceServer

    seen_batches = []

    def apply_fn(x):
        seen_batches.append(x.shape[0])
        return x + 1.0

    srv = InferenceServer(apply_fn, port=0, max_batch=8)
    srv.start()
    try:
        img = np.ones((8, 8), np.float32)
        results = [None] * 6

        def call(i):
            results[i] = _post_npy(srv.port, img)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for r in results:
            np.testing.assert_allclose(r, img + 1.0)
    finally:
        srv.stop()


def test_inference_server_timeout_returns_504():
    import time as _time

    from emx.serve.server import InferenceServer

    def slow_apply(x):
        _time.sleep(1.0)
        return x

    srv = InferenceServer(slow_apply, port=0, max_batch=4,
                          request_timeout_s=0.15)
    srv.start()
    try:
        img = np.ones((4, 4), np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.request("POST", "/api/predict", buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 504
        assert b"timed out" in resp.read()
    finally:
        srv.stop()


def test_serve_npz_denoiser_bundle(tmp_path):
    """serve_artifact accepts the one-file deployment bundle and
    serves predictions through HTTP."""
    import dataclasses
    import io
    import urllib.request

    import jax

    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.artifact import save_denoiser_artifact
    from emx.serve.server import serve_artifact

    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=4, folded_head=8)
    model = Denoiser(cfg)
    x = jnp.zeros((1, 64, 64), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    p = str(tmp_path / "artifact.npz")
    save_denoiser_artifact(p, cfg, variables)

    srv = serve_artifact(p, tile=64, port=0)
    try:
        buf = io.BytesIO()
        np.save(buf, np.random.default_rng(0).random((64, 64)).astype(
            np.float32))
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/predict", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = np.load(io.BytesIO(resp.read()))
        assert out.shape == (64, 64)
        assert np.isfinite(out).all()
    finally:
        srv.stop()


def test_serve_int8_promoted_bundle(tmp_path):
    """An int8-promoted bundle must be served through the QUANTIZED
    graph (the program bench.py measures), not its float twin."""
    import dataclasses
    import io
    import json
    import urllib.request

    import jax

    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.artifact import save_denoiser_artifact
    from emx.serve.quantize import calibrate, quantized_apply
    from emx.serve.server import serve_artifact

    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=4, folded_head=8)
    model = Denoiser(cfg)
    x = jnp.asarray(np.random.default_rng(5).random((1, 64, 64)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    amax = calibrate(model, variables, [x])
    p = str(tmp_path / "artifact_int8.npz")
    save_denoiser_artifact(p, cfg, variables,
                           quant={"mode": "mxu", "amax": amax,
                                  "psnr": 1.0})
    # serve_artifact jits the quantized graph; compare against the same
    # jitted program — int8 rounding can turn a 1-ulp float difference
    # between eager and compiled into a full quantization step.
    expect = np.asarray(
        jax.jit(quantized_apply(model, variables, amax, "mxu"))(x))[0]

    # tile=64: the 64^2 request is the NATIVE size -> micro-batch path
    # (otherwise it would be served through overlapped tiling).
    srv = serve_artifact(p, tile=64, port=0)
    try:
        buf = io.BytesIO()
        np.save(buf, np.asarray(x[0]))
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/predict", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = np.load(io.BytesIO(resp.read()))
        np.testing.assert_allclose(out, expect, atol=1e-5)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["quant"] == "mxu"
    finally:
        srv.stop()


def test_inference_server_pads_to_power_of_two():
    """pad_batches: every device launch sees a power-of-two batch (so a
    jitted apply_fn compiles at most log2(max_batch)+1 programs), and
    padded rows never leak into responses."""
    import threading

    from emx.serve.server import InferenceServer

    seen = []

    def apply_fn(x):
        seen.append(x.shape[0])
        return x + 1.0

    srv = InferenceServer(apply_fn, port=0, max_batch=8,
                          pad_batches=True)
    srv.start()
    try:
        results = [None] * 5

        def call(i):
            img = np.full((4, 4), float(i), np.float32)
            results[i] = (img, _post_npy(srv.port, img))

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for img, out in results:
            np.testing.assert_allclose(out, img + 1.0)
        assert seen and all(b in (1, 2, 4, 8) for b in seen), seen
    finally:
        srv.stop()


def test_serve_arbitrary_size_routes_through_tiling(tmp_path):
    """A denoiser bundle serves ANY 2D image size: non-native shapes go
    through overlapped tiling (reference Denoiser.denoise,
    machine_learning/denoiser.py:653-682) and match the library
    tiled_apply exactly."""
    import dataclasses

    import jax

    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.artifact import save_denoiser_artifact
    from emx.serve.server import serve_artifact
    from emx.serve.tiling import tiled_apply

    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=4, folded_head=8)
    model = Denoiser(cfg)
    x64 = jnp.zeros((1, 64, 64))
    variables = model.init(jax.random.key(0), x64, train=False)
    p = str(tmp_path / "artifact.npz")
    save_denoiser_artifact(p, cfg, variables)

    srv = serve_artifact(p, tile=64, overlap=16, port=0)
    try:
        img = np.random.default_rng(0).random((100, 80)).astype(
            np.float32)
        out = _post_npy(srv.port, img)
        assert out.shape == (100, 80)
        fn = srv.apply_fn
        expect = np.asarray(tiled_apply(fn, img, tile=64, overlap=16,
                                        batch=8))
        np.testing.assert_allclose(out, expect, atol=1e-6)
        # Native-size requests still use the micro-batch path.
        native = np.random.default_rng(1).random((64, 64)).astype(
            np.float32)
        out2 = _post_npy(srv.port, native)
        assert out2.shape == (64, 64)
    finally:
        srv.stop()


def test_serve_mode_sidecar(tmp_path):
    """serve_mode.json routes serving through the fused Pallas path only
    when its bundle hash matches; a stale sidecar is ignored."""
    import dataclasses
    import hashlib
    import io
    import json
    import urllib.request

    import jax

    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.artifact import save_denoiser_artifact
    from emx.serve.fused import load_serve_mode
    from emx.serve.quantize import calibrate, quantized_apply
    from emx.serve.server import serve_artifact

    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=4, folded_head=8)
    model = Denoiser(cfg)
    x = jnp.asarray(np.random.default_rng(5).random((1, 64, 64)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    amax = calibrate(model, variables, [x])
    p = str(tmp_path / "artifact_int8.npz")
    save_denoiser_artifact(p, cfg, variables,
                           quant={"mode": "mxu", "amax": amax,
                                  "psnr": 1.0})

    side = tmp_path / "serve_mode.json"
    side.write_text(json.dumps({"fused_rows": 32, "bundle_sha": "bad"}))
    assert load_serve_mode(p) is None  # hash mismatch -> ignored

    sha = hashlib.sha256(open(p, "rb").read()).hexdigest()[:12]
    side.write_text(json.dumps({"fused_rows": 32, "bundle_sha": sha}))
    assert load_serve_mode(p)["fused_rows"] == 32

    # Served output through the fused build path (no tiny block reaches
    # min_pixels, so numerics match the plain quantized graph exactly —
    # this exercises the sidecar plumbing and the fused build).
    expect = np.asarray(
        jax.jit(quantized_apply(model, variables, amax, "mxu"))(x))[0]
    srv = serve_artifact(p, tile=64, port=0)
    try:
        assert srv.model_info["fused_rows"] == 32
        buf = io.BytesIO()
        np.save(buf, np.asarray(x[0]))
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/predict",
            data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = np.load(io.BytesIO(resp.read()))
        np.testing.assert_allclose(out, expect, atol=1e-5)
    finally:
        srv.stop()


def test_j_invariant_selector_ranks_denoisers():
    """The J-invariant score separates a matched gaussian from a badly
    over-blurred one (the coarse NN-vs-classical gap the selector
    exists for) and auto_denoise picks the winner — no clean reference
    used anywhere. (Identity is NOT a valid candidate: its J-invariant
    version is the masked fill itself — Noise2Self can only calibrate
    functions that don't read the masked pixel.)"""
    import jax

    from emx.analysis.filters import gaussian_filter
    from emx.data.degrade import poisson_dose
    from emx.data.pipeline import synthetic_micrographs
    from emx.serve.select import auto_denoise, j_invariant_score

    imgs = jnp.asarray(synthetic_micrographs(4, 64, seed=11))
    keys = jax.random.split(jax.random.key(0), 4)
    noisy = jax.vmap(lambda k, x: poisson_dose(k, x, 25.0))(keys, imgs)

    good = jax.vmap(lambda x: gaussian_filter(x, 1.0))
    bad = jax.vmap(lambda x: gaussian_filter(x, 4.0))
    s_good = j_invariant_score(good, noisy, jax.random.key(1),
                               n_masks=8)
    s_bad = j_invariant_score(bad, noisy, jax.random.key(1), n_masks=8)
    assert float(jnp.mean((s_good < s_bad).astype(jnp.float32))) >= 0.75

    out, chosen = auto_denoise(noisy, [bad, good], jax.random.key(2),
                               n_masks=8)
    assert out.shape == noisy.shape
    assert float(jnp.mean((chosen == 1).astype(jnp.float32))) >= 0.75
    # The selected output really is the winner's output per image.
    g_out = good(noisy)
    for i in range(4):
        if bool(chosen[i] == 1):
            np.testing.assert_allclose(np.asarray(out[i]),
                                       np.asarray(g_out[i]), atol=1e-5)


def test_serve_auto_select_mode(tmp_path):
    """serve_artifact(auto=True): requests are denoised by the
    per-image J-invariant winner among {nn, classical filters}; the
    /metrics endpoint reports per-candidate chosen counts and /healthz
    advertises the candidate list."""
    import dataclasses
    import io
    import json
    import urllib.request

    import jax

    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.artifact import save_denoiser_artifact
    from emx.serve.server import serve_artifact

    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=4, folded_head=8)
    model = Denoiser(cfg)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64), jnp.float32),
                           train=False)
    p = str(tmp_path / "artifact.npz")
    save_denoiser_artifact(p, cfg, variables)

    srv = serve_artifact(p, tile=64, port=0, auto=True, auto_n_masks=1)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/healthz",
                timeout=30) as resp:
            info = json.loads(resp.read())
        assert info["auto"] == ["nn", "gaussian", "median", "wiener",
                                "tv"]
        for seed in range(2):
            buf = io.BytesIO()
            np.save(buf, np.random.default_rng(seed).random(
                (64, 64)).astype(np.float32))
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/api/predict",
                data=buf.getvalue())
            with urllib.request.urlopen(req, timeout=120) as resp:
                out = np.load(io.BytesIO(resp.read()))
            assert out.shape == (64, 64) and np.isfinite(out).all()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics",
                timeout=30) as resp:
            metrics = json.loads(resp.read())
        assert sum(metrics["chosen"].values()) == 2
    finally:
        srv.stop()
