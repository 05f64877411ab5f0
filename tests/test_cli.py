"""CLI entry-point tests (subprocess, CPU-forced)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "emx.cli", *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )


def test_usage_line():
    r = run_cli()
    assert r.returncode == 2
    assert "train-denoiser" in r.stdout


@pytest.mark.slow
def test_train_denoiser_tiny_and_artifact(tmp_path):
    # One subprocess only (a second resume run would double the ~2 min
    # compile; resume logic is covered by test_fit_checkpoint_and_resume).
    r = run_cli(
        "train-denoiser", "--steps=2", "--batch_size=4", "--crop_size=32",
        "--scale=0.02", f"--model_dir={tmp_path}/run", "--ckpt_every_steps=1",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "trained to step 2" in r.stdout
    assert os.path.exists(tmp_path / "run" / "artifact" / "params.msgpack")
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")


def test_harvest_cli(tmp_path):
    from emx.io.dm import write_dm

    rng = np.random.default_rng(0)
    src = tmp_path / "dm"
    src.mkdir()
    for i in range(2):
        write_dm(str(src / f"a{i}.dm3"),
                 (100 * rng.random((600, 600))).astype(np.float32))
    r = run_cli("harvest", f"--src={src}", f"--out={tmp_path}/out",
                "--size=128")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "reaped 2 micrographs" in r.stdout
    assert os.path.exists(tmp_path / "out" / "manifest_0.jsonl")


def test_ewrec_cli(tmp_path):
    import jax.numpy as jnp

    from emx.io.tiff import write_tiff
    from emx.physics.propagate import propagate_back_to_defocus
    from emx.data.pipeline import synthetic_micrographs

    wave = jnp.asarray(synthetic_micrographs(1, 64, seed=3)[0],
                       jnp.complex64)
    stack_dir = tmp_path / "stack0"
    stack_dir.mkdir()
    for i, df in enumerate([-150.0, 0.0, 150.0]):
        img = np.asarray(jnp.abs(
            propagate_back_to_defocus(wave, df, 0.025)) ** 2)
        write_tiff(str(stack_dir / f"img{i + 1}.tif"), img)
    r = run_cli("ewrec", f"--stack_dir={stack_dir}", "--num_iter=10",
                f"--out={tmp_path}/rec")
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / "rec" / "phase.tif")
    assert "loss:" in r.stdout
