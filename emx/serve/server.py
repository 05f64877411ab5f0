"""Batched inference HTTP server.

Replaces the reference's Flask single-image endpoint
(tf_utility/graph_server.py:10-66) with a stdlib ThreadingHTTPServer that
micro-batches concurrent requests into one device launch:

  POST /api/predict   body: raw .npy bytes (2D float image)
                      resp: raw .npy bytes (same shape)
  GET  /healthz       liveness + model metadata
  GET  /metrics       JSON counters (requests, batched launches, latency)

Requests are queued; a dispatcher thread drains up to `max_batch` at a
time and runs them through the (jitted, fixed-shape) apply function —
on TPU the second and later launches reuse the compiled program.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

import numpy as np


class _Pending:
    __slots__ = ("img", "event", "result", "error", "cancelled")

    def __init__(self, img):
        self.img = img
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.cancelled = False


class InferenceServer:
    def __init__(
        self,
        apply_fn: Callable[[np.ndarray], np.ndarray],
        host: str = "127.0.0.1",
        port: int = 8501,
        max_batch: int = 8,
        input_shape: tuple[int, int] | None = None,
        model_info: dict | None = None,
        request_timeout_s: float = 120.0,
        pad_batches: bool = False,
        oversize_fn: Callable[[np.ndarray], np.ndarray] | None = None,
        tile_size: int = 512,
        batch_window_s: float = 0.0,
        aux_names: list[str] | None = None,
    ):
        self.apply_fn = apply_fn
        self.max_batch = max_batch
        # Fill window: after the first request of a dispatch group
        # arrives, wait up to this deadline for the group to fill toward
        # max_batch before launching. Round-4 measurement: at closed-loop
        # concurrency 16 the window-less dispatcher averaged 6.6
        # img/launch against a best_batch of 96 — most of each launch's
        # fixed (tunnel-dominated) cost was spent on a third of the
        # available work. The window costs an idle client at most
        # `batch_window_s` of added latency (~4% of the measured 1.16 s
        # p50) and lets loaded launches fill.
        self.batch_window_s = batch_window_s
        # Arbitrary-size serving (reference Denoiser.denoise,
        # machine_learning/denoiser.py:653-682): a 2D image whose shape
        # is not the native tile is routed through `oversize_fn`
        # (overlapped tiling) instead of the fixed-shape micro-batcher.
        # Serialized by a lock: concurrent 8k^2 requests would
        # otherwise race device memory.
        self.oversize_fn = oversize_fn
        self.tile_size = tile_size
        self._oversize_lock = threading.Lock()
        # Pad ragged dispatch groups up to the next power of two so a
        # jitted apply_fn compiles at most log2(max_batch)+1 programs
        # instead of one per distinct group size (XLA recompiles on any
        # shape change; under bursty load every batch size 1..max_batch
        # appears). Padding rows are copies of row 0 and are sliced off.
        self.pad_batches = pad_batches
        self.request_timeout_s = request_timeout_s
        self.input_shape = input_shape
        self.model_info = model_info or {}
        self.metrics = {"requests": 0, "launches": 0, "errors": 0,
                        "batched_images": 0, "total_latency_s": 0.0}
        # When apply_fn returns (batch, per_image_label) instead of a
        # bare batch (the auto-select serving mode), per-label counts
        # are reported under metrics["chosen"], keyed by aux_names.
        self.aux_names = aux_names
        if aux_names:
            self.metrics["chosen"] = {name: 0 for name in aux_names}
        self._q: queue.Queue[_Pending] = queue.Queue()
        self._stop = threading.Event()
        self._dispatcher = threading.Thread(target=self._dispatch, daemon=True)
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/healthz":
                    body = json.dumps({"status": "ok", **server.model_info})
                elif self.path == "/metrics":
                    body = json.dumps(server.metrics)
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                raw = body.encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def do_POST(self):
                if self.path != "/api/predict":
                    self.send_response(404)
                    self.end_headers()
                    return
                t0 = time.perf_counter()
                # Count every received request up front so errors can
                # never exceed requests (ADVICE r2).
                server.metrics["requests"] += 1
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                try:
                    img = np.load(io.BytesIO(raw), allow_pickle=False)
                except Exception as e:
                    server.metrics["errors"] += 1
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(str(e).encode())
                    return
                if (server.oversize_fn is not None and img.ndim == 2
                        and img.shape != (server.tile_size,
                                          server.tile_size)):
                    try:
                        with server._oversize_lock:
                            out = np.asarray(server.oversize_fn(
                                np.asarray(img, np.float32)))
                        server.metrics["launches"] += 1
                    except Exception as e:
                        server.metrics["errors"] += 1
                        self.send_response(500)
                        self.end_headers()
                        self.wfile.write(str(e).encode())
                        return
                    server.metrics["total_latency_s"] += (
                        time.perf_counter() - t0)
                    buf = io.BytesIO()
                    np.save(buf, out)
                    raw_out = buf.getvalue()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/octet-stream")
                    self.send_header("Content-Length",
                                     str(len(raw_out)))
                    self.end_headers()
                    self.wfile.write(raw_out)
                    return
                pending = _Pending(np.asarray(img, np.float32))
                server._q.put(pending)
                if not pending.event.wait(timeout=server.request_timeout_s):
                    # Dispatcher never got to it — mark cancelled so a
                    # late dispatch drops it, and fail loudly instead of
                    # returning a pickled None with HTTP 200.
                    pending.cancelled = True
                    server.metrics["errors"] += 1
                    self.send_response(504)
                    self.end_headers()
                    self.wfile.write(b"inference timed out")
                    return
                server.metrics["total_latency_s"] += time.perf_counter() - t0
                if pending.error is not None:
                    server.metrics["errors"] += 1
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(str(pending.error).encode())
                    return
                buf = io.BytesIO()
                np.save(buf, pending.result)
                raw_out = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(raw_out)))
                self.end_headers()
                self.wfile.write(raw_out)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]

    def _dispatch(self) -> None:
        # Two-stage pipeline: this thread forms groups and LAUNCHES
        # (jax dispatch is async — apply_fn returns a device future);
        # the readback thread blocks on the host transfer and completes
        # the pendings. While one launch's results cross the (tunnel-
        # dominated) device->host path, the next group is already
        # forming and launching — the bounded queue caps in-flight
        # launches at its depth.
        rq: queue.Queue = queue.Queue(maxsize=2)

        def readback():
            while True:
                item = rq.get()
                if item is None:
                    return
                group, out_dev, n = item
                try:
                    aux = None
                    if isinstance(out_dev, tuple):
                        out_dev, aux = out_dev
                    out = np.asarray(out_dev)[:n]
                    if aux is not None and self.aux_names:
                        for c in np.asarray(aux)[:n]:
                            self.metrics["chosen"][
                                self.aux_names[int(c)]] += 1
                    for p, o in zip(group, out):
                        p.result = o
                except Exception as e:  # execution errors surface here
                    for p in group:
                        p.error = e
                finally:
                    for p in group:
                        p.event.set()

        rb = threading.Thread(target=readback, daemon=True)
        rb.start()
        try:
            while not self._stop.is_set():
                try:
                    first = self._q.get(timeout=0.1)
                except queue.Empty:
                    continue
                batch = [first]
                if self.batch_window_s:
                    # Wait-for-fill up to the deadline (see __init__).
                    deadline = time.perf_counter() + self.batch_window_s
                    while len(batch) < self.max_batch:
                        rem = deadline - time.perf_counter()
                        if rem <= 0:
                            break
                        try:
                            batch.append(self._q.get(timeout=rem))
                        except queue.Empty:
                            break
                while len(batch) < self.max_batch:
                    try:
                        batch.append(self._q.get_nowait())
                    except queue.Empty:
                        break
                # Group by shape so one launch serves homogeneous
                # requests.
                by_shape: dict[tuple, list[_Pending]] = {}
                for p in batch:
                    if p.cancelled:  # requester already gave up (504)
                        continue
                    by_shape.setdefault(p.img.shape, []).append(p)
                for shape, group in by_shape.items():
                    # Re-check cancellation at launch time: a pending
                    # that timed out while queued in this dispatch group
                    # would otherwise still pay for a full inference
                    # (ADVICE r2).
                    group = [p for p in group if not p.cancelled]
                    if not group:
                        continue
                    try:
                        stacked = np.stack([p.img for p in group])
                        n = stacked.shape[0]
                        if self.pad_batches:
                            m = 1
                            while m < n:
                                m *= 2
                            if m > n:
                                stacked = np.concatenate(
                                    [stacked,
                                     np.repeat(stacked[:1], m - n,
                                               axis=0)])
                        out_dev = self.apply_fn(stacked)
                        self.metrics["launches"] += 1
                        self.metrics["batched_images"] += n
                    except Exception as e:  # trace/stack errors
                        for p in group:
                            p.error = e
                            p.event.set()
                        continue
                    rq.put((group, out_dev, n))
        finally:
            rq.put(None)

    def start(self) -> None:
        self._dispatcher.start()
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def stop(self) -> None:
        self._stop.set()
        self.httpd.shutdown()


def serve_artifact(artifact_path: str, tile: int = 512,
                   overlap: int = 80, **kw) -> InferenceServer:
    """Serve either artifact format: the generic directory artifact
    (emx.serve.export) or a one-file .npz denoiser deployment bundle
    (emx.serve.artifact — the folded graph bench.py measures).
    Denoiser bundles serve ARBITRARY-size 2D images: native-tile
    requests go through the micro-batcher; anything else through
    overlapped tiling (reference Denoiser.denoise semantics)."""
    import os as _os

    if artifact_path.endswith(".npz") or _os.path.isfile(artifact_path):
        from emx.nn import Denoiser
        from emx.serve.artifact import load_denoiser_artifact

        cfg, variables, quant = load_denoiser_artifact(
            artifact_path, with_quant=True)
        model = Denoiser(cfg)

        import jax as _jax

        if quant is not None:
            # int8-promoted bundle: serve the gate-checked quantized
            # graph — the same program bench.py measures (including the
            # hash-guarded serve_mode.json sidecar routing 128^2
            # SepConvBlocks through the fused Pallas kernel).
            from emx.serve.fused import (dense_quantized_apply,
                                         fused_quantized_apply,
                                         load_serve_mode)
            from emx.serve.quantize import quantized_apply

            smode = load_serve_mode(artifact_path) or {}
            fused_rows = int(kw.pop("fused_rows",
                                    smode.get("fused_rows", 0)))
            dense = str(kw.pop("dense", smode.get("dense", "")))
            if dense:
                apply_fn = _jax.jit(dense_quantized_apply(
                    model, variables, quant["amax"], mode=quant["mode"],
                    skip=quant.get("skip", ()),
                    quantized=dense == "int8"))
            elif fused_rows:
                apply_fn = _jax.jit(fused_quantized_apply(
                    model, variables, quant["amax"], mode=quant["mode"],
                    skip=quant.get("skip", ()), rows=fused_rows,
                    interpret=_jax.default_backend() == "cpu"))
            else:
                apply_fn = _jax.jit(quantized_apply(
                    model, variables, quant["amax"], mode=quant["mode"],
                    skip=quant.get("skip", ())))
        else:
            apply_fn = _jax.jit(
                lambda x: model.apply(variables, x, train=False))

        auto = bool(kw.pop("auto", False))
        auto_n_masks = int(kw.pop("auto_n_masks", 2))
        auto_names: list[str] | None = None
        if auto:
            # Auto-select serving: every request is denoised by the
            # per-image J-invariant winner among the NN and the
            # classical filters (emx.serve.select) — no clean data, no
            # family oracle. Out-of-family inputs route to a classical
            # filter instead of trusting the NN blindly, at
            # ~(n_masks+1)x the NN compute. The mask key is fixed:
            # deterministic serving, and the ranking stays unbiased for
            # pixel-independent noise.
            import jax.numpy as _jnp

            from emx.analysis.filters import (chambolle_tv,
                                              gaussian_filter,
                                              median_filter,
                                              wiener_filter)
            from emx.serve.select import auto_denoise

            base_fn = apply_fn
            cands = [
                lambda x: base_fn(x).astype(_jnp.float32),
                _jax.vmap(lambda x: gaussian_filter(x, 1.0)),
                _jax.vmap(lambda x: median_filter(x, 1)),
                _jax.vmap(lambda x: wiener_filter(x, 1)),
                _jax.vmap(lambda x: chambolle_tv(x, 0.1)),
            ]
            auto_names = ["nn", "gaussian", "median", "wiener", "tv"]
            apply_fn = _jax.jit(lambda x: auto_denoise(
                x, cands, _jax.random.key(0), n_masks=auto_n_masks))
            kw.setdefault("aux_names", auto_names)
        kw.setdefault("pad_batches", True)
        kw.setdefault("batch_window_s", 0.05)
        from emx.serve.tiling import tiled_apply

        def oversize_fn(img, _fn=apply_fn):
            if auto:  # tiled path keeps the output, drops the labels
                return tiled_apply(lambda b: _fn(b)[0], img, tile=tile,
                                   overlap=overlap, batch=8)
            return tiled_apply(_fn, img, tile=tile, overlap=overlap,
                               batch=8)

        kw.setdefault("oversize_fn", oversize_fn)
        kw.setdefault("tile_size", tile)

        info = {"model": "denoiser", "s2d": cfg.space_to_depth,
                "folded_head": cfg.folded_head,
                "quant": None if quant is None else quant["mode"],
                "fused_rows": fused_rows if quant is not None else 0,
                "dense": dense if quant is not None else "",
                "auto": auto_names or False,
                "tile": tile, "overlap": overlap}
    else:
        from emx.serve.export import load_artifact

        art = load_artifact(artifact_path)
        apply_fn = art.apply_fn()
        info = {"model": art.model_name}
    srv = InferenceServer(apply_fn, model_info=info, **kw)
    srv.start()
    return srv
