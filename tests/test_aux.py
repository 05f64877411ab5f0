"""Auxiliary capability tests: AOT export, fringe classifier, rosenbrock,
multi-host helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_export_compiled_stablehlo(tmp_path):
    from emx.serve.export import export_compiled, load_compiled

    def fn(x):
        return jnp.tanh(x) * 2.0

    x = jnp.arange(8.0)
    export_compiled(str(tmp_path / "frozen"), fn, (x,))
    loaded = load_compiled(str(tmp_path / "frozen"))
    np.testing.assert_allclose(np.asarray(loaded(x)), np.asarray(fn(x)),
                               atol=1e-6)


def test_fringe_classifier_learns_simulator_labels():
    from emx.scope.classifier import collect_fringe_dataset, train_fringe_classifier
    from emx.scope.sim import SimulatedMicroscope

    scope = SimulatedMicroscope(image_size=32, dose=0, optimal_z=0.0)
    imgs, labels = collect_fringe_dataset(scope, n_per_class=24, seed=0)
    assert imgs.shape[0] == 48 and labels.sum() == 24
    res = train_fringe_classifier(imgs, labels, steps=300, seed=0)
    assert res.accuracy > 0.8
    assert res.losses[-1] < res.losses[0]


def test_rosenbrock_optimizers_converge():
    from emx.analysis.optim_demo import compare_optimizers, optimize_rosenbrock

    traj, final = optimize_rosenbrock(steps=1500)
    assert final < 1e-2
    np.testing.assert_allclose(np.asarray(traj[-1]), [1.0, 1.0], atol=0.2)
    table = compare_optimizers(steps=800)
    assert table["adam"] < 1.0


def test_distributed_single_process_noop_and_mesh():
    from emx.parallel.distributed import host_batch_slice, initialize, make_pod_mesh

    initialize()  # single-process no-op
    mesh = make_pod_mesh(dcn_data=1, spatial=1)
    assert mesh.shape["dcn"] == 1
    assert mesh.shape["data"] * mesh.shape["spatial"] == jax.device_count()
    start, size = host_batch_slice(32)
    assert (start, size) == (0, 32)


def test_trainer_profiler_trace_capture(tmp_path):
    # SURVEY.md §5 tracing commitment: fit() writes a jax.profiler trace.
    import jax.numpy as jnp

    from emx.data.degrade import denoiser_example
    from emx.data.pipeline import DeviceDataset, PipelineConfig, \
        synthetic_micrographs
    from emx.nn import Denoiser, DenoiserConfig
    from emx.train import TrainConfig, Trainer

    model = Denoiser(DenoiserConfig(features=(8, 8, 8, 8, 8),
                                    num_middle_blocks=0, aspp_filters=8,
                                    aspp_out=8, norm="group"))
    cfg = TrainConfig(optimizer="adam", log_every=0,
                      profile_dir=str(tmp_path / "trace"),
                      profile_start_step=2, profile_num_steps=2)
    trainer = Trainer(model, cfg, example_fn=denoiser_example)
    pipe = DeviceDataset(synthetic_micrographs(16, 32),
                         PipelineConfig(batch_size=8, crop_size=32))
    state = trainer.init(jnp.zeros((8, 32, 32)))
    trainer.fit(state, pipe, num_steps=6)
    import glob

    traces = glob.glob(str(tmp_path / "trace" / "**" / "*.trace.json*"),
                       recursive=True) + \
        glob.glob(str(tmp_path / "trace" / "**" / "*.xplane.pb"),
                  recursive=True)
    assert traces, "no profiler trace written"


def test_train_bench_measure_tiny_cpu():
    # The ladder harness itself must run anywhere (tiny shapes on CPU).
    from emx.bench.train_bench import measure

    out = measure(s2d=2, batch=4, dtype="bf16", remat=True, steps=2,
                  size=64,
                  config_overrides=dict(features=(8, 8, 8, 8, 8),
                                        num_middle_blocks=1, aspp_filters=8,
                                        aspp_out=8))
    assert out["metric"] == "train_step_img_per_s"
    assert out["value"] > 0 and np.isfinite(out["loss"])
