"""The training engine — one implementation replacing every copy-pasted
reference trainer main() (SURVEY.md §2.3).

TPU-native design decisions vs the reference:
  * ONE fused jitted train step: degradation synthesis, forward, loss,
    backward, gradient accumulation (lax.scan) and the optimizer update
    all execute on-device in a single XLA program. The reference round-trips
    every gradient through host numpy placeholders each step
    (denoiser-multi-gpu.py:1177-1206) — that pattern is deliberately dead.
  * Data parallelism by sharding the global batch over a jax.sharding.Mesh;
    XLA inserts the gradient all-reduce over ICI (no tower loops, no PS).
  * learning rate lives in optax.inject_hyperparams state, so the
    `learning_rate.txt` hot-reload (denoiser-multi-gpu.py:1161-1167)
    swaps it without recompilation.
  * step-based + wall-clock checkpointing via orbax, including the data
    pipeline's (epoch, index) cursor: fully deterministic resume.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from emx.parallel.mesh import batch_sharding, make_mesh, replicated
from emx.train.losses import huberised_mse
from emx.utils.config import Config, config_field, watch_file
from emx.utils.metrics import MetricsLogger, ThroughputMeter


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass
class TrainConfig(Config):
    learning_rate: float = config_field(1e-3, "initial learning rate")
    momentum: float = config_field(0.9, "SGD momentum (nesterov)")
    optimizer: str = config_field("nesterov", "nesterov|adam")
    adam_b1: float = config_field(0.9, "adam beta1")
    grad_clip_norm: float = config_field(0.0, "0 disables clipping")
    weight_decay: float = config_field(0.0, "L2 penalty")
    grad_accum: int = config_field(1, "microbatches per step (reference x5)")
    steps_per_launch: int = config_field(1, "optimizer steps fused into one device launch")
    log_every: int = config_field(100, "steps between metric lines")
    sample_every: int = config_field(0, "dump input/truth/output TIFFs every N steps (0 off)")
    ckpt_every_steps: int = config_field(0, "0 disables step-periodic saves")
    ckpt_every_secs: float = config_field(0.0, "0 disables time-periodic saves")
    model_dir: str = config_field("", "checkpoint/log directory")
    seed: int = config_field(0, "training RNG seed")
    profile_dir: str = config_field(
        "", "write a jax.profiler trace here (SURVEY.md §5 tracing); "
            "empty disables")
    profile_start_step: int = config_field(10, "first traced step")
    profile_num_steps: int = config_field(5, "steps inside the trace")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.optimizer == "nesterov":
        core = optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.learning_rate, momentum=cfg.momentum, nesterov=True
        )
    elif cfg.optimizer == "adam":
        core = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate, b1=cfg.adam_b1
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain.append(core)
    return optax.chain(*chain)


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Return a copy of `opt_state` with every injected 'learning_rate'
    hyperparameter replaced by `lr` (sharding/dtype preserved)."""

    def rec(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            old = hp["learning_rate"]
            val = jnp.asarray(lr, dtype=getattr(old, "dtype", jnp.float32))
            if hasattr(old, "sharding"):
                val = jax.device_put(val, old.sharding)
            return node._replace(hyperparams={**hp, "learning_rate": val})
        if isinstance(node, tuple):
            children = [rec(c) for c in node]
            if type(node) is tuple:
                return tuple(children)
            return node._replace(**dict(zip(node._fields, children)))
        return node

    return rec(opt_state)


class Trainer:
    """Supervised trainer for (input, target)-style models.

    Args:
      model: a flax module whose __call__(x, train=...) returns predictions.
      example_fn: jit-safe (key, clean_img) -> (input, target) degradation
        synthesiser (see emx.data.degrade). If None, batches must already
        be (input, target) tuples.
      loss_fn: (pred, target) -> scalar. Defaults to the reference's
        huberised MSE.
    """

    def __init__(
        self,
        model,
        cfg: TrainConfig,
        mesh=None,
        example_fn: Callable | None = None,
        loss_fn: Callable = huberised_mse,
        probe=None,
    ):
        """`probe` (emx.train.dose_probe.DoseProbe) switches example_fn to
        the 3-argument form (key, img, cum_probs); the CDF is a traced
        step argument, so probe updates never recompile."""
        self.model = model
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.example_fn = example_fn
        self.loss_fn = loss_fn
        self.probe = probe
        if probe is not None and cfg.steps_per_launch > 1:
            raise ValueError("dose probing is incompatible with "
                             "steps_per_launch > 1")
        self.optimizer = make_optimizer(cfg)
        self._step_fn = None
        self._multi_step_fn = None
        self._step_core = None
        self.logger = MetricsLogger(cfg.model_dir or None)
        self._lr_poll = (
            watch_file(os.path.join(cfg.model_dir, "learning_rate.txt"))
            if cfg.model_dir
            else lambda: None
        )

    # ------------------------------------------------------------------
    def init(self, sample_input) -> TrainState:
        key = jax.random.key(self.cfg.seed)
        k_init, k_train = jax.random.split(key)
        x = jnp.asarray(sample_input)
        variables = self.model.init(k_init, x, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            rng=jax.random.key_data(k_train),
        )
        return jax.device_put(state, replicated(self.mesh))

    # ------------------------------------------------------------------
    def _build_step(self):
        cfg = self.cfg
        model, optimizer = self.model, self.optimizer
        example_fn, loss_fn = self.example_fn, self.loss_fn
        probed = self.probe is not None

        def microbatch_loss(params, batch_stats, inputs, targets):
            variables = {"params": params}
            has_bn = bool(jax.tree_util.tree_leaves(batch_stats))
            if has_bn:
                variables["batch_stats"] = batch_stats
                out, updates = model.apply(
                    variables, inputs, train=True, mutable=["batch_stats"]
                )
                new_bs = updates["batch_stats"]
            else:
                out = model.apply(variables, inputs, train=True)
                new_bs = batch_stats
            loss = loss_fn(out, targets)
            if cfg.weight_decay:
                l2 = sum(
                    jnp.sum(p**2) for p in jax.tree_util.tree_leaves(params)
                )
                loss = loss + cfg.weight_decay * 0.5 * l2
            mse = jnp.mean((out - targets) ** 2)
            return loss, (new_bs, mse)

        grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

        def step(state: TrainState, batch, cum_probs=None):
            rng = jax.random.wrap_key_data(state.rng)
            step_key = jax.random.fold_in(rng, state.step)
            if example_fn is not None:
                # Integer-packed corpora (pack_crops dtype=uint8/uint16)
                # upload raw bytes and convert HERE on device: host-side
                # loader traffic drops 2-4x, and every example_fn opens
                # with a per-crop renormalisation (scale0to1 /
                # norm_neg1to1) so the absolute integer scale is moot.
                batch = batch.astype(jnp.float32)
                keys = jax.random.split(step_key, batch.shape[0])
                if probed:
                    inputs, targets = jax.vmap(
                        example_fn, in_axes=(0, 0, None)
                    )(keys, batch, cum_probs)
                else:
                    inputs, targets = jax.vmap(example_fn)(keys, batch)
            else:
                inputs, targets = batch

            if cfg.grad_accum > 1:
                def accum_body(carry, micro):
                    gsum, bs, lsum, msum = carry
                    (loss, (bs, mse)), grads = grad_fn(
                        state.params, bs, micro[0], micro[1]
                    )
                    gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                    return (gsum, bs, lsum + loss, msum + mse), None

                micro_in = jax.tree_util.tree_map(
                    lambda x: x.reshape(cfg.grad_accum, -1, *x.shape[1:]),
                    (inputs, targets),
                )
                zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                (gsum, new_bs, lsum, msum), _ = jax.lax.scan(
                    accum_body, (zeros, state.batch_stats, 0.0, 0.0), micro_in
                )
                grads = jax.tree_util.tree_map(
                    lambda g: g / cfg.grad_accum, gsum
                )
                loss, mse = lsum / cfg.grad_accum, msum / cfg.grad_accum
            else:
                (loss, (new_bs, mse)), grads = grad_fn(
                    state.params, state.batch_stats, inputs, targets
                )

            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            )
            metrics = {"loss": loss, "mse": mse,
                       "grad_norm": optax.global_norm(grads)}
            return new_state, metrics

        self._step_core = step
        return jax.jit(step, donate_argnums=(0,))

    @property
    def step_fn(self):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        return self._step_fn

    @property
    def multi_step_fn(self):
        """(state, batches[K, B, ...]) -> (state, last-step metrics): runs
        K optimizer steps inside ONE XLA program via lax.scan. On
        dispatch-latency-bound setups this multiplies training throughput
        (a single fused launch replaced K host round-trips)."""
        if self._multi_step_fn is None:
            if self._step_fn is None:
                self._step_fn = self._build_step()
            core = self._step_core

            def multi(state, batches):
                state, metrics = jax.lax.scan(core, state, batches)
                last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
                return state, last

            self._multi_step_fn = jax.jit(multi, donate_argnums=(0,))
        return self._multi_step_fn

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        pipeline,
        num_steps: int,
        checkpointer=None,
        eval_fn: Callable | None = None,
        eval_every: int = 0,
    ) -> TrainState:
        cfg = self.cfg
        sharding = batch_sharding(self.mesh)
        batch_size = getattr(getattr(pipeline, "cfg", None), "batch_size", 1)
        meter = ThroughputMeter(batch_size, every=max(1, cfg.log_every))
        last_save = time.monotonic()
        it = iter(pipeline)
        start_step = int(state.step)
        spl = max(1, cfg.steps_per_launch)
        step = start_step
        tracing = False
        while step < num_steps:
            if cfg.profile_dir and not tracing and \
                    step >= cfg.profile_start_step:
                jax.profiler.start_trace(cfg.profile_dir)
                tracing = True
                trace_stop = step + cfg.profile_num_steps
            if spl > 1:
                # One fused launch of `spl` optimizer steps; fit may
                # overshoot num_steps to the next multiple of spl.
                import numpy as _np

                stacked = _np.stack([next(it) for _ in range(spl)])
                batches = jax.device_put(
                    stacked,
                    jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec(None, "data")
                    ),
                )
                state, metrics = self.multi_step_fn(state, batches)
                batch = stacked[-1]  # last host microbatch, for sample dumps
            elif self.probe is not None:
                batch = jax.device_put(next(it), sharding)
                state, metrics = self.step_fn(
                    state, batch, self.probe.device_probs()
                )
            else:
                batch = jax.device_put(next(it), sharding)
                state, metrics = self.step_fn(state, batch)
            step = int(state.step)

            if tracing and step >= trace_stop:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                tracing = False

            if cfg.log_every and step % cfg.log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                tp = meter.update(step)
                if tp:
                    vals.update(tp)
                self.logger.log(step, **vals)

            overrides = self._lr_poll()
            if overrides and "learning_rate" in overrides:
                state = state.replace(
                    opt_state=set_learning_rate(
                        state.opt_state, overrides["learning_rate"]
                    )
                )

            if eval_fn and eval_every and step % eval_every == 0:
                eval_fn(state, step)

            if (cfg.sample_every and cfg.model_dir
                    and step % cfg.sample_every == 0):
                self._dump_samples(state, batch, step)

            if checkpointer is not None:
                due_steps = cfg.ckpt_every_steps and step % cfg.ckpt_every_steps == 0
                due_time = (
                    cfg.ckpt_every_secs
                    and time.monotonic() - last_save > cfg.ckpt_every_secs
                )
                if due_steps or due_time:
                    checkpointer.save(step, state, pipeline.state_dict())
                    last_save = time.monotonic()
        if tracing:
            jax.profiler.stop_trace()
        return state

    def _dump_samples(self, state: TrainState, batch, step: int) -> None:
        """Periodic input/truth/output TIFF triples (reference
        gan-infilling-100.py:1694-1703 saves the same set)."""
        import numpy as np

        from emx.io.tiff import write_tiff
        from emx.utils.image import scale0to1

        try:
            if self.example_fn is not None:
                key = jax.random.fold_in(
                    jax.random.wrap_key_data(state.rng), 0x5A5A5A
                )
                first = jax.tree_util.tree_map(lambda x: x[:1], batch)
                if self.probe is not None:
                    inputs, targets = jax.vmap(
                        self.example_fn, in_axes=(0, 0, None)
                    )(jax.random.split(key, 1), first,
                      self.probe.device_probs())
                else:
                    inputs, targets = jax.vmap(self.example_fn)(
                        jax.random.split(key, 1), first
                    )
            else:
                inputs, targets = (jax.tree_util.tree_map(
                    lambda x: x[:1], b) for b in batch)
            out = self.model.apply(
                {"params": state.params, **(
                    {"batch_stats": state.batch_stats}
                    if jax.tree_util.tree_leaves(state.batch_stats) else {}
                )},
                inputs, train=False,
            )
            d = os.path.join(self.cfg.model_dir, "samples")
            for name, img in (("input", inputs), ("truth", targets),
                              ("output", out)):
                arr = np.asarray(scale0to1(jnp.asarray(img[0])), np.float32)
                write_tiff(os.path.join(d, f"{step}_{name}.tif"), arr)
        except Exception as e:  # sample dumps must never kill training
            self.logger.log(step, sample_dump_error=str(e)[:120])
