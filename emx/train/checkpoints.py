"""Orbax checkpointing: step- and time-periodic saves, deterministic
resume including the data-pipeline cursor.

Upgrades the reference's wall-clock tf.train.Saver pattern
(denoiser-multi-gpu.py:73-75,1218; gan-infilling-100.py:1948) — which
could not resume its np.random input pipeline — and generalises its GAN
collapse rollback (gan-infilling-100.py:1827-1830) via `restore(step=...)`.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from emx.train.engine import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, pipeline_state: dict | None = None,
             wait: bool = False) -> None:
        payload = {"state": state}
        if pipeline_state is not None:
            payload["pipeline"] = {k: np.asarray(v) for k, v in pipeline_state.items()}
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(
        self, target_state: TrainState, step: int | None = None
    ) -> tuple[TrainState, dict | None]:
        """Restore (state, pipeline_state). `target_state` supplies the
        pytree structure/shardings (use Trainer.init's output)."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {"state": target_state, "pipeline": {"epoch": 0, "index": 0}}
        try:
            out = self.manager.restore(step, args=ocp.args.StandardRestore(template))
            pipe = {k: int(v) for k, v in out["pipeline"].items()}
        except Exception:
            out = self.manager.restore(
                step, args=ocp.args.StandardRestore({"state": target_state})
            )
            pipe = None
        return out["state"], pipe

    def rollback(self, target_state: TrainState) -> tuple[TrainState, dict | None]:
        """Restore the most recent checkpoint — the GAN collapse-recovery
        path (reference gan-infilling-100.py:1827-1830)."""
        return self.restore(target_state)

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()
