"""HTTP serving latency + throughput bench on the real chip.

Reference anchor: the Flask server prints per-request wall time and
stores nothing (tf_utility/graph_server.py:16,37; BASELINE.md 'Serving
latency'). This drives the micro-batching InferenceServer with the
promoted flagship bundle over real HTTP (raw .npy bodies), under a
constant closed-loop concurrency, and records the latency distribution
and aggregate throughput.

Usage:
    python -m emx.bench.serve_latency [bundle] [out_dir] [concurrency]
        [requests_per_worker] [size]
"""
from __future__ import annotations

import http.client
import io
import json
import os
import sys
import threading
import time

import numpy as np


def _post(port: int, arr: np.ndarray, timeout: float = 120.0):
    buf = io.BytesIO()
    np.save(buf, arr)
    conn = http.client.HTTPConnection("127.0.0.1", port,
                                      timeout=timeout)
    conn.request("POST", "/api/predict", body=buf.getvalue())
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    if resp.status != 200:
        raise RuntimeError(f"{resp.status}: {body[:200]!r}")
    return np.load(io.BytesIO(body))


def main(bundle: str = "docs/runs/flagship/artifact_int8.npz",
         out_dir: str = "docs/runs/flagship", concurrency: int = 16,
         requests_per_worker: int = 32, size: int = 512) -> dict:
    from emx.serve.server import serve_artifact

    srv = serve_artifact(bundle, port=0, max_batch=concurrency)
    rng = np.random.default_rng(0)
    imgs = rng.random((concurrency, size, size), np.float32)

    # Warm-up: compile every power-of-two batch the padded dispatcher
    # can launch (directly — concurrent HTTP waves don't deterministically
    # form every group size), so steady-state latencies measure
    # execution only, then two HTTP waves to warm the whole path.
    t0 = time.perf_counter()
    m = 1
    while m <= concurrency:
        np.asarray(srv.apply_fn(imgs[:m]))
        m *= 2
    for _ in range(2):
        ts = [threading.Thread(target=_post, args=(srv.port, imgs[i]))
              for i in range(concurrency)]
        [t.start() for t in ts]
        [t.join() for t in ts]
    warmup_s = time.perf_counter() - t0

    lat: list[float] = []
    lock = threading.Lock()

    def worker(i: int):
        mine = []
        for _ in range(requests_per_worker):
            t = time.perf_counter()
            out = _post(srv.port, imgs[i])
            mine.append(time.perf_counter() - t)
            assert out.shape == (size, size)
        with lock:
            lat.extend(mine)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker, args=(i,))
          for i in range(concurrency)]
    # Clean occupancy accounting: drop the warmup waves' counters so
    # img_per_launch reflects the measured closed-loop section only.
    srv.metrics.update({"requests": 0, "launches": 0, "errors": 0,
                        "batched_images": 0, "total_latency_s": 0.0})
    [t.start() for t in ts]
    [t.join() for t in ts]
    wall = time.perf_counter() - t0

    lat_ms = np.sort(np.asarray(lat)) * 1e3
    n = len(lat_ms)

    def pct(p):
        return round(float(lat_ms[min(n - 1, int(p / 100 * n))]), 2)

    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    conn.request("GET", "/metrics")
    metrics = json.loads(conn.getresponse().read())
    conn.close()

    # Oversize images take the overlapped-tiling route (reference
    # Denoiser.denoise handles arbitrary shapes the same way,
    # machine_learning/denoiser.py:653-682). Sequential requests: the
    # tiled program already fills the chip, concurrency only queues.
    # Measured once (the default-concurrency run) — it is independent of
    # the closed-loop load above.
    oversize = {}
    for os_size in (2048, 4096) if concurrency == 16 else ():
        big = rng.random((os_size, os_size), np.float32)
        _post(srv.port, big, timeout=600.0)  # compile
        times = []
        for _ in range(3):
            t = time.perf_counter()
            out_img = _post(srv.port, big, timeout=600.0)
            times.append(time.perf_counter() - t)
            assert out_img.shape == (os_size, os_size)
        oversize[f"{os_size}x{os_size}_ms"] = round(
            float(np.median(times)) * 1e3, 1)

    srv.stop()

    out = {"metric": "serve_latency", "bundle": bundle,
           "concurrency": concurrency, "requests": n, "size": size,
           "p50_ms": pct(50), "p90_ms": pct(90), "p99_ms": pct(99),
           "mean_ms": round(float(np.mean(lat_ms)), 2),
           "throughput_img_per_s": round(n / wall, 1),
           "img_per_launch": round(metrics["batched_images"]
                                   / max(metrics["launches"], 1), 2),
           "batch_window_s": srv.batch_window_s,
           "warmup_s": round(warmup_s, 1),
           "oversize_latency": oversize,
           "server_metrics": metrics}
    os.makedirs(out_dir, exist_ok=True)
    name = ("serve_latency.json" if concurrency == 16
            else f"serve_latency_c{concurrency}.json")
    with open(os.path.join(out_dir, name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/flagship/artifact_int8.npz",
         a[1] if len(a) > 1 else "docs/runs/flagship",
         int(a[2]) if len(a) > 2 else 16,
         int(a[3]) if len(a) > 3 else 32,
         int(a[4]) if len(a) > 4 else 512)
