"""Command-line entry points.

One CLI replacing the reference's per-script mains:
  python -m emx.cli train-denoiser --data_dir=... --model_dir=...
  python -m emx.cli train-infilling --data_dir=... --coverage=64
  python -m emx.cli harvest --src=... --out=...
  python -m emx.cli ewrec --stack_dir=...
  python -m emx.cli serve --artifact=... --port=8501
  python -m emx.cli bench
"""

from __future__ import annotations

import dataclasses
import glob
import os
import sys

import jax

from emx.utils.platform import respect_env_platforms

respect_env_platforms()

import jax.numpy as jnp
import numpy as np

from emx.utils.config import Config, config_field


@dataclasses.dataclass
class DenoiserCLIConfig(Config):
    data_dir: str = config_field("", "dir of float32 TIFF crops ('' = synthetic)")
    model_dir: str = config_field("runs/denoiser", "checkpoint/log dir")
    batch_size: int = config_field(8, "global batch")
    crop_size: int = config_field(512, "crop sidelength")
    steps: int = config_field(100_000, "train steps")
    learning_rate: float = config_field(1e-3, "lr")
    grad_accum: int = config_field(1, "grad accumulation factor")
    scale: float = config_field(1.0, "model width multiplier")
    ckpt_every_steps: int = config_field(5000, "checkpoint cadence")
    seed: int = config_field(0, "seed")


def _pipeline(data_dir: str, batch: int, crop: int, seed: int):
    from emx.data.pipeline import DataPipeline, PipelineConfig, synthetic_micrographs

    cfg = PipelineConfig(batch_size=batch, crop_size=crop, seed=seed)
    if data_dir:
        paths = sorted(glob.glob(f"{data_dir}/**/*.tif", recursive=True))
        if not paths:
            raise SystemExit(f"no .tif files under {data_dir}")
        return DataPipeline(paths, cfg)
    return DataPipeline(synthetic_micrographs(max(64, 4 * batch), crop), cfg)


def train_denoiser(argv: list[str]) -> None:
    from emx.data.degrade import denoiser_example
    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.export import save_artifact
    from emx.train import TrainConfig, Trainer
    from emx.train.checkpoints import Checkpointer

    from emx.parallel.mesh import make_mesh_for_batch

    c = DenoiserCLIConfig.from_args(argv)
    mcfg = DenoiserConfig().scaled(c.scale) if c.scale != 1.0 else DenoiserConfig()
    trainer = Trainer(
        Denoiser(mcfg),
        TrainConfig(learning_rate=c.learning_rate, grad_accum=c.grad_accum,
                    model_dir=c.model_dir, ckpt_every_steps=c.ckpt_every_steps,
                    seed=c.seed),
        mesh=make_mesh_for_batch(c.batch_size),
        example_fn=denoiser_example,
    )
    pipe = _pipeline(c.data_dir, c.batch_size, c.crop_size, c.seed)
    state = trainer.init(jnp.zeros((c.batch_size, c.crop_size, c.crop_size)))
    ckpt = Checkpointer(f"{c.model_dir}/ckpt")
    try:
        restored, pipe_state = ckpt.restore(state)
        state = restored
        if pipe_state:
            pipe.load_state_dict(pipe_state)
        print(f"resumed from step {int(state.step)}")
    except FileNotFoundError:
        pass
    state = trainer.fit(state, pipe, c.steps, checkpointer=ckpt)
    save_artifact(f"{c.model_dir}/artifact", "denoiser", mcfg.__dict__,
                  {"params": jax.device_get(state.params)})
    print(f"trained to step {int(state.step)}; artifact at {c.model_dir}/artifact")


@dataclasses.dataclass
class InfillingCLIConfig(Config):
    data_dir: str = config_field("", "dir of float32 TIFF crops ('' = synthetic)")
    model_dir: str = config_field("runs/infilling", "checkpoint/log dir")
    batch_size: int = config_field(4, "global batch")
    crop_size: int = config_field(512, "crop sidelength")
    steps: int = config_field(700_000, "train steps (reference hard stop)")
    coverage: int = config_field(64, "1/coverage of pixels scanned")
    seed: int = config_field(0, "seed")


def train_infilling(argv: list[str]) -> None:
    import functools

    from emx.data.degrade import fixed_scan_mask, infilling_example
    from emx.nn.infilling import InfillingConfig, InfillingGenerator, MultiscaleDiscriminator
    from emx.train.checkpoints import Checkpointer
    from emx.train.gan import GANConfig, GANTrainer

    from emx.parallel.mesh import make_mesh_for_batch

    c = InfillingCLIConfig.from_args(argv)
    mask = fixed_scan_mask((c.crop_size, c.crop_size), 1.0 / c.coverage)
    cfg = InfillingConfig()
    trainer = GANTrainer(
        InfillingGenerator(cfg), MultiscaleDiscriminator(cfg),
        GANConfig(model_dir=c.model_dir, ckpt_every_steps=10_000, seed=c.seed),
        mesh=make_mesh_for_batch(c.batch_size),
        example_fn=functools.partial(infilling_example, mask=mask),
    )
    pipe = _pipeline(c.data_dir, c.batch_size, c.crop_size, c.seed)
    state = trainer.init(jnp.zeros((c.batch_size, c.crop_size, c.crop_size)))
    ckpt = Checkpointer(f"{c.model_dir}/ckpt")
    state = trainer.fit(state, pipe, c.steps, checkpointer=ckpt)
    print(f"trained to step {int(state.step)}")


def harvest(argv: list[str]) -> None:
    @dataclasses.dataclass
    class HarvestConfig(Config):
        src: str = config_field("", "root of .dm3/.dm4 corpus")
        out: str = config_field("harvested", "output dir")
        shard_index: int = config_field(0, "this host's shard")
        shard_count: int = config_field(1, "total shards")
        size: int = config_field(2048, "output sidelength")

    from emx.data.harvest import census, find_dm_files, reap

    c = HarvestConfig.from_args(argv)
    paths = find_dm_files(c.src)
    print("census:", census(paths))
    m = reap(paths, c.out, c.shard_index, c.shard_count, c.size)
    print(f"reaped {len(m)} micrographs -> {c.out}")


def run_ewrec(argv: list[str]) -> None:
    @dataclasses.dataclass
    class EwrecConfig(Config):
        stack_dir: str = config_field("", "dir of focal-series TIFFs")
        wavelength: float = config_field(0.025, "electron wavelength (A)")
        num_iter: int = config_field(50, "GS iterations")
        out: str = config_field("ewrec_out", "output dir")

    from emx.io.tiff import read_tiff, write_tiff
    from emx.recon import EWRECConfig, align_stack, ewrec

    c = EwrecConfig.from_args(argv)
    paths = sorted(glob.glob(f"{c.stack_dir}/*.tif"),
                   key=lambda p: int("".join(ch for ch in p.split("/")[-1]
                                             if ch.isdigit()) or 0))
    if not paths:
        raise SystemExit(f"no TIFFs in {c.stack_dir}")
    stack = jnp.stack([jnp.asarray(read_tiff(p)) for p in paths])
    aligned, shifts = align_stack(stack)
    res = ewrec(aligned, EWRECConfig(wavelength=c.wavelength,
                                     num_iter=c.num_iter))
    # Use the real-valued outputs (complex arrays cannot be fetched on
    # some TPU backends).
    write_tiff(f"{c.out}/amplitude.tif", np.asarray(res["amplitude"]))
    write_tiff(f"{c.out}/phase.tif", np.asarray(res["phase"]))
    print(f"defocuses: {np.asarray(res['defocuses']).round(2).tolist()}")
    print(f"loss: {float(res['loss']):.3e}; wrote {c.out}/amplitude.tif, phase.tif")


def serve(argv: list[str]) -> None:
    @dataclasses.dataclass
    class ServeConfig(Config):
        artifact: str = config_field("", "artifact directory")
        host: str = config_field("127.0.0.1", "bind host")
        port: int = config_field(8501, "bind port")
        max_batch: int = config_field(8, "micro-batch size")
        tile: int = config_field(512, "native tile; other sizes are "
                                 "served via overlapped tiling")
        overlap: int = config_field(80, "tile overlap (px)")

    from emx.serve.server import serve_artifact

    c = ServeConfig.from_args(argv)
    srv = serve_artifact(c.artifact, host=c.host, port=c.port,
                         max_batch=c.max_batch, tile=c.tile,
                         overlap=c.overlap)
    print(f"serving {c.artifact} on {c.host}:{srv.port}")
    import time

    while True:
        time.sleep(3600)


def bench_train(argv):
    """Training-step throughput ladder (emx.bench.train_bench)."""
    from emx.bench.train_bench import LADDER, QUICK, main as run

    run(QUICK if "quick" in argv else LADDER)


def quality(argv):
    """Production-width quality anchoring run (emx.bench.quality_run)."""
    from emx.bench.quality_run import main as run

    a = [x for x in argv if not x.startswith("-")]
    run(a[0] if a else "runs/quality",
        int(a[1]) if len(a) > 1 else 2,
        int(a[2]) if len(a) > 2 else 5000,
        int(a[3]) if len(a) > 3 else 8)


def gan_demo(argv):
    """On-chip GAN dynamics demonstration (emx.bench.gan_demo)."""
    from emx.bench.gan_demo import main as run

    a = [x for x in argv if not x.startswith("-")]
    run(a[0] if a else "runs/gan_demo", int(a[1]) if len(a) > 1 else 560)


def gan_quality(argv):
    """GAN infilling quality anchor (emx.bench.gan_quality)."""
    from emx.bench.gan_quality import main as run

    a = [x for x in argv if not x.startswith("-")]
    run(a[0] if a else "runs/gan_quality",
        int(a[1]) if len(a) > 1 else 20000)


def zoo_ladder(argv):
    """Model-zoo trained-quality ladder (emx.bench.zoo_ladder)."""
    from emx.bench.zoo_ladder import main as run

    a = [x for x in argv if not x.startswith("-")]
    run(a[0] if a else "runs/zoo_ladder",
        int(a[1]) if len(a) > 1 else 1500,
        float(a[2]) if len(a) > 2 else 0.25)


def dqn_autofocus(argv):
    """DQN autofocus training + policy evaluation (emx.bench.dqn_run)."""
    from emx.bench.dqn_run import main as run

    a = [x for x in argv if not x.startswith("-")]
    run(a[0] if a else "runs/dqn_autofocus",
        int(a[1]) if len(a) > 1 else 800)


def quant_check(argv):
    """Quantized-deployment PSNR/throughput check
    (emx.bench.quant_check)."""
    from emx.bench.quant_check import main as run

    a = [x for x in argv if not x.startswith("-")]
    run(a[0] if a else "docs/runs/flagship/artifact.npz",
        a[1] if len(a) > 1 else "runs/quant_check")


def qat_finetune(argv):
    """Quantization-aware finetune of a deployment artifact
    (emx.bench.qat_finetune). `--scope=head|refine|decoder` selects the
    standalone tail-distillation mode (the measured winner; see
    docs/architecture.md) instead of full-model fake-quant."""
    scope = next((x.split("=", 1)[1] for x in argv
                  if x.startswith("--scope=")), None)
    a = [x for x in argv if not x.startswith("-")]
    art = a[0] if a else "docs/runs/flagship/artifact.npz"
    out = a[1] if len(a) > 1 else "runs/qat"
    steps = int(a[2]) if len(a) > 2 else 3000
    gate = float(a[3]) if len(a) > 3 else None
    if scope:
        from emx.bench.qat_finetune import head_distill

        head_distill(art, out, steps, psnr_gate=gate, scope=scope)
    else:
        from emx.bench.qat_finetune import main as run

        run(art, out, steps, psnr_gate=gate)


COMMANDS = {
    "train-denoiser": train_denoiser,
    "train-infilling": train_infilling,
    "harvest": harvest,
    "ewrec": run_ewrec,
    "serve": serve,
    "bench-train": bench_train,
    "quality": quality,
    "gan-demo": gan_demo,
    "gan-quality": gan_quality,
    "zoo-ladder": zoo_ladder,
    "dqn-autofocus": dqn_autofocus,
    "quant-check": quant_check,
    "qat-finetune": qat_finetune,
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in COMMANDS:
        print("usage: python -m emx.cli "
              f"{{{'|'.join(COMMANDS)}}} [--flag=value ...]")
        raise SystemExit(2)
    COMMANDS[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
