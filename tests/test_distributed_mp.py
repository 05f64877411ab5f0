"""Cross-process (DCN-analog) data parallelism tests.

Two real OS processes, 4 virtual CPU devices each, stitched by
jax.distributed into one 8-device runtime; the batch is sharded over
('dcn', 'data') of a pod mesh. Asserts the step is numerically
equivalent to the same step on a single-process flat 8-device 'data'
mesh — i.e. multi-host DP does not silently degenerate to replication
(VERDICT round 1, item 6; SURVEY.md §2.4 DCN collectives).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(__file__)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


import functools


@functools.lru_cache(maxsize=1)
def _flat_mesh_reference():
    """Same step on this process's flat 8-device 'data' mesh."""
    from emx.data.degrade import denoiser_example
    from emx.nn import Denoiser, DenoiserConfig
    from emx.parallel.mesh import batch_sharding, make_mesh
    from emx.train import TrainConfig, Trainer

    mesh = make_mesh(data=8, spatial=1)
    model = Denoiser(
        DenoiserConfig(features=(8, 12, 16, 24, 24), num_middle_blocks=1,
                       aspp_filters=16, aspp_out=16, norm="group")
    )
    trainer = Trainer(
        model,
        TrainConfig(learning_rate=1e-3, optimizer="adam", log_every=0),
        mesh=mesh,
        example_fn=denoiser_example,
    )
    data = np.random.default_rng(0).random((16, 32, 32)).astype(np.float32)
    state = trainer.init(jnp.zeros((16, 32, 32)))
    batch = jax.device_put(jnp.asarray(data), batch_sharding(mesh))
    state, metrics = trainer.step_fn(state, batch)
    digest = float(
        sum(float(jnp.sum(jnp.abs(p)))
            for p in jax.tree_util.tree_leaves(state.params))
    )
    return float(metrics["loss"]), digest


def test_pod_mesh_dp_matches_flat_mesh_single_process():
    """(2,4) pod mesh in ONE process: batch must shard over dcn x data
    (16 examples / 8 devices = 2 each), and the step must match the flat
    8-device mesh bit-for-bit in math (same global batch, same params)."""
    from emx.parallel.distributed import make_pod_mesh
    from emx.parallel.mesh import batch_sharding

    mesh = make_pod_mesh(dcn_data=2)
    assert dict(mesh.shape) == {"dcn": 2, "data": 4, "spatial": 1}
    sh = batch_sharding(mesh)
    arr = jax.device_put(jnp.zeros((16, 32, 32)), sh)
    # 8-way sharding over the batch dim, NOT 4-way replication over dcn.
    assert arr.sharding.shard_shape(arr.shape)[0] == 2

    from emx.data.degrade import denoiser_example
    from emx.nn import Denoiser, DenoiserConfig
    from emx.train import TrainConfig, Trainer

    model = Denoiser(
        DenoiserConfig(features=(8, 12, 16, 24, 24), num_middle_blocks=1,
                       aspp_filters=16, aspp_out=16, norm="group")
    )
    trainer = Trainer(
        model,
        TrainConfig(learning_rate=1e-3, optimizer="adam", log_every=0),
        mesh=mesh,
        example_fn=denoiser_example,
    )
    data = np.random.default_rng(0).random((16, 32, 32)).astype(np.float32)
    state = trainer.init(jnp.zeros((16, 32, 32)))
    batch = jax.device_put(jnp.asarray(data), batch_sharding(mesh))
    state, metrics = trainer.step_fn(state, batch)
    pod_loss = float(metrics["loss"])
    pod_digest = float(
        sum(float(jnp.sum(jnp.abs(p)))
            for p in jax.tree_util.tree_leaves(state.params))
    )
    ref_loss, ref_digest = _flat_mesh_reference()
    assert pod_loss == pytest.approx(ref_loss, abs=1e-5)
    assert pod_digest == pytest.approx(ref_digest, rel=1e-5)


def test_two_process_dcn_dp_gradient_equivalence(tmp_path):
    """Two OS processes x 4 devices: host_batch_slice +
    make_array_from_process_local_data + the ('dcn','data') sharding must
    produce the same loss/params as the single-process flat-mesh run."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_dp_worker.py"),
             "2", str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    results = []
    for i in range(2):
        with open(tmp_path / f"proc{i}.json") as f:
            results.append(json.load(f))
    # Each host loaded a distinct half of the global batch...
    assert results[0]["host_slice"] == [0, 8]
    assert results[1]["host_slice"] == [8, 8]
    # ...and both replicas agree (all-reduce consistency).
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-6)
    assert results[0]["param_digest"] == pytest.approx(
        results[1]["param_digest"], rel=1e-6)

    ref_loss, ref_digest = _flat_mesh_reference()
    assert results[0]["loss"] == pytest.approx(ref_loss, abs=1e-5)
    assert results[0]["param_digest"] == pytest.approx(ref_digest, rel=1e-5)
