"""Verify drive 1: library flow on CPU, incl. the new per-channel
quantization path at its real surfaces (calibrate -> quant_check-style
promotion dict -> artifact roundtrip -> quantized serve)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import dataclasses
import json
import time

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)


from emx.data.degrade import denoiser_example
from emx.data.pipeline import DeviceDataset, PipelineConfig, synthetic_micrographs
from emx.nn import Denoiser, DenoiserConfig
from emx.train import Trainer, TrainConfig

cfg = DenoiserConfig(features=(8, 8, 8, 8, 8), num_middle_blocks=0,
                     aspp_filters=8, aspp_out=8, norm="batch",
                     space_to_depth=4, folded_head=8)
model = Denoiser(cfg)
trainer = Trainer(model, TrainConfig(model_dir="/tmp/e2e_run", log_every=10),
                  example_fn=denoiser_example)
pipe = DeviceDataset(synthetic_micrographs(32, 64), PipelineConfig(batch_size=8, crop_size=64))
state = trainer.init(jnp.zeros((8, 64, 64)))
l0 = None
state = trainer.fit(state, pipe, num_steps=30)
log("train 30 steps done")

from emx.serve.optimize import fold_denoiser

fcfg, fvars = fold_denoiser(cfg, {"params": state.params, "batch_stats": state.batch_stats})
fmodel = Denoiser(fcfg)
log("folded")

from emx.serve.artifact import load_denoiser_artifact, save_denoiser_artifact
from emx.serve.quantize import calibrate, quantized_apply

x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64)), jnp.float32)
amax = calibrate(fmodel, fvars, [x])
assert all(np.asarray(v).ndim == 1 for v in amax.values()), "per-channel calibration"
ref = np.asarray(fmodel.apply(fvars, x, train=False))
some_skip = sorted(amax)[:2]
for mode in ("store", "mxu"):
    q = np.asarray(quantized_apply(fmodel, fvars, amax, mode, skip=some_skip)(x))
    err = float(np.abs(q - ref).mean())
    log(f"quant mode={mode} skip=2 mean err {err:.5f}")
    assert err < 0.05, (mode, err)

art = "/tmp/e2e_artifact.npz"
save_denoiser_artifact(art, fmodel.config, fvars,
                       quant={"mode": "mxu", "amax": amax, "skip": list(some_skip), "psnr": 1.0})
cfg2, vars2, quant2 = load_denoiser_artifact(art, with_quant=True)
assert quant2["mode"] == "mxu" and list(quant2["skip"]) == list(some_skip)
assert all(isinstance(v, np.ndarray) for v in quant2["amax"].values())
q2 = np.asarray(quantized_apply(Denoiser(cfg2), vars2, quant2["amax"], quant2["mode"],
                                skip=quant2["skip"])(x))
q1 = np.asarray(quantized_apply(fmodel, fvars, amax, "mxu", skip=some_skip)(x))
np.testing.assert_allclose(q2, q1, atol=1e-5)
log("artifact quant roundtrip exact")

from emx.serve.tiling import tiled_apply

big = jnp.asarray(np.random.default_rng(1).random((96, 130)), jnp.float32)
apply_fn = jax.jit(lambda v, xx: fmodel.apply(v, xx, train=False))
out = tiled_apply(lambda xx: apply_fn(fvars, xx), big, tile=64, overlap=16)
assert out.shape == big.shape and np.isfinite(np.asarray(out)).all()
log("tiled_apply non-square ok")

# HTTP server surface
import http.client
import io

from emx.serve.server import InferenceServer

srv = InferenceServer(lambda xx: np.asarray(apply_fn(fvars, xx)), port=0, max_batch=4)
srv.start()
payload = np.random.default_rng(2).random((64, 64)).astype(np.float32)
buf = io.BytesIO()
np.save(buf, payload)
conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
conn.request("POST", "/api/predict", body=buf.getvalue())
resp = conn.getresponse()
assert resp.status == 200, resp.read()
out_img = np.load(io.BytesIO(resp.read()))
assert out_img.shape == (64, 64) and np.isfinite(out_img).all()
conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
conn.request("POST", "/api/predict", body=b"garbage")
assert conn.getresponse().status == 400
srv.stop()
log("HTTP serve ok (+400 on garbage)")

# EWREC on synthetic focal series with known ground-truth wave
from emx.physics.propagate import propagate_back_to_defocus
from emx.recon import EWRECConfig, ewrec

rng = np.random.default_rng(3)
n = 64
yy, xx = np.mgrid[0:n, 0:n].astype(np.float32) / n
amp = 1.0 + 0.1 * np.sin(2 * np.pi * (2 * xx + yy))
phase = np.zeros((n, n), np.float32)
for _ in range(4):
    cy, cx = rng.uniform(0.2, 0.8, 2)
    sg = rng.uniform(0.05, 0.15)
    phase += rng.uniform(0.2, 0.8) * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sg**2)))
wave = jnp.asarray(amp * np.exp(1j * phase), jnp.complex64)
defocuses = jnp.asarray([-200.0, 0.0, 200.0])
wl = 0.025
stack = jnp.stack([jnp.abs(propagate_back_to_defocus(wave, df, wl)) ** 2 for df in defocuses])
out = ewrec(stack, EWRECConfig(wavelength=wl, px_dim=1.0, num_iter=30), defocuses=defocuses)
rec = np.asarray(out["amplitude"]) * np.exp(1j * np.asarray(out["phase"]))
w = np.asarray(amp * np.exp(1j * phase))
corr = abs(np.vdot(rec, w)) / (np.linalg.norm(rec) * np.linalg.norm(w))
log(f"ewrec complex corr {corr:.4f} loss {float(out['loss']):.2e}")
assert corr > 0.95, corr
log("ALL E2E CHECKS PASSED")
