"""Worker for the multi-process DCN data-parallel test (run by
tests/test_distributed_mp.py, one subprocess per simulated host).

Each process owns 4 virtual CPU devices; jax.distributed stitches them
into one 8-device runtime. The global batch is sharded over the
('dcn', 'data') axes of a pod mesh — 'dcn' spans the process boundary,
exactly the cross-slice data parallelism SURVEY.md §2.4 commits to.
Writes {loss, param_digest} JSON so the parent can assert equivalence
with a single-process flat-mesh run of the same step.
"""

import json
import os
import sys

# Script-path execution puts tests/ (not the repo root) on sys.path;
# the repo is not pip-installed, so add the root explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_proc = int(sys.argv[1])
    pid = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc,
        process_id=pid,
    )

    import jax.numpy as jnp
    import numpy as np

    from emx.data.degrade import denoiser_example
    from emx.nn import Denoiser, DenoiserConfig
    from emx.parallel.distributed import host_batch_slice, make_pod_mesh
    from emx.parallel.mesh import batch_sharding
    from emx.train import TrainConfig, Trainer

    assert jax.device_count() == 4 * n_proc
    assert jax.process_count() == n_proc

    mesh = make_pod_mesh(dcn_data=n_proc)

    # Establish the Gloo clique with a TINY collective first: the big
    # train-step compile takes minutes on a loaded 1-core host, and if
    # the two processes reach their first collective more than 30 s
    # apart the Gloo KV rendezvous times out. A seconds-long jit keeps
    # the skew tiny; later collectives reuse the clique.
    from jax.sharding import NamedSharding, PartitionSpec as P

    tiny_sh = NamedSharding(mesh, P(("dcn", "data")))
    tiny = jax.make_array_from_process_local_data(
        tiny_sh, np.ones((4,), np.float32), global_shape=(8,))
    total = float(jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(
        tiny))
    assert total == 8.0, total

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

    global_batch = 16
    data = np.random.default_rng(0).random(
        (global_batch, 32, 32)).astype(np.float32)
    start, size = host_batch_slice(global_batch)
    local = data[start : start + size]

    state = trainer.init(jnp.zeros((global_batch, 32, 32)))
    batch = jax.make_array_from_process_local_data(
        batch_sharding(mesh), local,
        global_shape=(global_batch, 32, 32),
    )
    state, metrics = trainer.step_fn(state, batch)
    loss = float(metrics["loss"])
    digest = float(
        sum(float(jnp.sum(jnp.abs(p)))
            for p in jax.tree_util.tree_leaves(state.params))
    )
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump({"loss": loss, "param_digest": digest,
                   "host_slice": [start, size]}, f)


if __name__ == "__main__":
    main()
