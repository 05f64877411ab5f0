"""GAN training engine: fused on-device G+D step with the reference's
adaptive training dynamics driven from a thin host loop.

Reproduces (misc_py/gan-infilling-100.py):
  * generator loss: -log D(fake) + 12 * feature-matching L1 across all
    discriminator activations (:1025-1036)
  * discriminator loss: -log(1 - |label - prob|), adapt-rate scaled,
    + 5e-5 L2 (:1081-1089)
  * label flipping with prob 0.01*(1-p_avg)^7, flipped/real labels
    0.9 + 0.1*u, adapt rate 10*exp(-p)*(1-exp(-p^2)) (:1726-1734)
  * adaptive trainee switching on the window-averaged D(fake) with
    0.3/0.7 bands every trainee_switch_skip_n steps, a forced flip after
    max_num_since_change one-sided windows (:1903-1940), and collapse
    rollback on D(x)==0.5 (:1827-1831)
  * Adam beta1=0.5, grad-norm clips 50 (G) / 15 (D) (:1378-1441)

TPU-native: ONE jitted step evaluates G, D-on-fake and D-on-real with
both gradient sets; which optimizer fires is gated by traced booleans
(`do_gen`, `do_disc`) via masked updates — no recompilation when the host
scheduler flips the trainee (the reference instead crossed the host
boundary 4-6x per iteration with numpy placeholder round-trips,
SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from emx.nn.infilling import multiscale_crops
from emx.parallel.mesh import batch_sharding, make_mesh, replicated
from emx.utils.config import Config, config_field
from emx.utils.metrics import MetricsLogger, ThroughputMeter


class GANState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any
    gen_stats: Any
    disc_params: Any
    disc_stats: Any
    gen_opt: Any
    disc_opt: Any
    rng: jax.Array
    pred_avg: jax.Array        # EMA of D(fake) (p_avg in the reference)
    pred_avg_real: jax.Array   # EMA of 1 - D(real)


@dataclasses.dataclass
class GANConfig(Config):
    gen_lr: float = config_field(2e-4, "generator Adam lr")
    disc_lr: float = config_field(2e-4, "discriminator Adam lr")
    adam_b1: float = config_field(0.5, "Adam beta1 for both nets")
    gen_clip: float = config_field(50.0, "generator grad-norm clip")
    disc_clip: float = config_field(15.0, "discriminator grad-norm clip")
    feature_match_weight: float = config_field(12.0, "natural-statistics L1 weight")
    mse_weight: float = config_field(
        0.0, "direct reconstruction weight in the generator loss "
             "(0 = reference-faithful adv + feature matching only)")
    disc_l2: float = config_field(5e-5, "discriminator L2 penalty")
    ema_decay: float = config_field(0.99, "prediction EMA decay")
    switch_low: float = config_field(0.3, "train G below this D(fake) EMA")
    switch_high: float = config_field(0.7, "train D above this D(fake) EMA")
    trainee_switch_skip_n: int = config_field(
        1, "decide the trainee every N steps on the window-averaged D(fake) "
           "(reference gan-infilling-100.py:1903-1906)")
    max_num_since_change: int = config_field(
        0, "force a trainee flip after this many consecutive one-sided "
           "decision windows so neither net starves (reference "
           "max_num_since_training_change :1922-1925; 0 disables)")
    collapse_eps: float = config_field(1e-6, "|D-0.5| collapse detector")
    log_every: int = config_field(100, "metric cadence")
    ckpt_every_steps: int = config_field(0, "0 disables")
    model_dir: str = config_field("", "log/checkpoint dir")
    seed: int = config_field(0, "RNG seed")
    lr_decay_start: int = config_field(350_000, "staircase decay start step")
    lr_decay_every: int = config_field(50_000, "decay interval")
    lr_decay_frac: float = config_field(0.125, "fraction removed per interval")
    max_steps: int = config_field(700_000, "reference hard stop")


def _flip_prob(p_avg):
    return 0.01 * (1.0 - p_avg) ** 7


def _adapt_rate(p_avg):
    return 10.0 * jnp.exp(-p_avg) * (1.0 - jnp.exp(-p_avg * p_avg))


class GANTrainer:
    def __init__(
        self,
        generator,
        discriminator,
        cfg: GANConfig,
        mesh=None,
        example_fn: Callable | None = None,
    ):
        self.gen = generator
        self.disc = discriminator
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.example_fn = example_fn
        self.gen_opt = optax.chain(
            optax.clip_by_global_norm(cfg.gen_clip),
            optax.inject_hyperparams(optax.adam)(cfg.gen_lr, b1=cfg.adam_b1),
        )
        self.disc_opt = optax.chain(
            optax.clip_by_global_norm(cfg.disc_clip),
            optax.inject_hyperparams(optax.adam)(cfg.disc_lr, b1=cfg.adam_b1),
        )
        self.logger = MetricsLogger(cfg.model_dir or None)
        self._step_fn = None

    # ------------------------------------------------------------------
    def init(self, sample_batch) -> GANState:
        key = jax.random.key(self.cfg.seed)
        k_g, k_d, k_ex, k_train = jax.random.split(key, 4)
        x = jnp.asarray(sample_batch)
        if self.example_fn is not None:
            keys = jax.random.split(k_ex, x.shape[0])
            lq, truth = jax.vmap(self.example_fn)(keys, x)
        else:
            lq, truth = x, x
        gen_vars = self.gen.init(k_g, lq, train=False)
        fake = self.gen.apply(gen_vars, lq, train=False)
        crops = multiscale_crops(k_d, fake)
        disc_vars = self.disc.init(k_d, crops, train=False)
        state = GANState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_vars["params"],
            gen_stats=gen_vars.get("batch_stats", FrozenDict()),
            disc_params=disc_vars["params"],
            disc_stats=disc_vars.get("batch_stats", FrozenDict()),
            gen_opt=self.gen_opt.init(gen_vars["params"]),
            disc_opt=self.disc_opt.init(disc_vars["params"]),
            rng=jax.random.key_data(k_train),
            pred_avg=jnp.asarray(0.5),
            pred_avg_real=jnp.asarray(0.5),
        )
        return jax.device_put(state, replicated(self.mesh))

    # ------------------------------------------------------------------
    def _apply(self, model, params, stats, *args, train):
        variables = {"params": params}
        has_bn = bool(jax.tree_util.tree_leaves(stats))
        if has_bn:
            variables["batch_stats"] = stats
            out, updates = model.apply(variables, *args, train=train,
                                       mutable=["batch_stats"])
            return out, updates["batch_stats"]
        return model.apply(variables, *args, train=train), stats

    def _build_step(self):
        cfg = self.cfg
        example_fn = self.example_fn

        def step(state: GANState, batch, do_gen, do_disc):
            rng = jax.random.wrap_key_data(state.rng)
            k = jax.random.fold_in(rng, state.step)
            k_ex, k_cf, k_cr, k_flip_f, k_flip_r, k_lab = jax.random.split(k, 6)

            if example_fn is not None:
                # Device-side cast: integer-packed corpora upload raw
                # (see emx.train.engine step / emx.data.harvest.pack_crops).
                batch = batch.astype(jnp.float32)
                keys = jax.random.split(k_ex, batch.shape[0])
                lq, truth = jax.vmap(example_fn)(keys, batch)
            else:
                lq, truth = batch

            # ---------------- generator loss ----------------
            def gen_loss(gp):
                fake, new_gstats = self._apply(
                    self.gen, gp, state.gen_stats, lq, train=True
                )
                crops_f = multiscale_crops(k_cf, fake)
                crops_r = multiscale_crops(k_cf, truth)
                (p_fake, feats_f), _ = self._apply(
                    self.disc, state.disc_params, state.disc_stats, crops_f,
                    train=False,
                )
                (p_real, feats_r), _ = self._apply(
                    self.disc, state.disc_params, state.disc_stats, crops_r,
                    train=False,
                )
                fm = sum(
                    jnp.mean(jnp.abs(a - b)) for a, b in zip(feats_f, feats_r)
                )
                adv = -jnp.log(jnp.clip(jnp.mean(p_fake), 1e-8, 1.0))
                mse = jnp.mean((fake - truth) ** 2)
                # mse_weight defaults to 0: the reference generator loss
                # is adv + feature matching only (gan-infilling-100.py:
                # 1025-1036). A small direct reconstruction term speeds
                # PSNR convergence within a bounded training budget.
                loss = adv + cfg.feature_match_weight * fm \
                    + cfg.mse_weight * mse
                return loss, (new_gstats, fake, jnp.mean(p_fake), mse)

            (g_loss, (new_gstats, fake, p_fake_mean, mse)), g_grads = (
                jax.value_and_grad(gen_loss, has_aux=True)(state.gen_params)
            )

            # ---------------- discriminator loss ----------------
            flip_f = jax.random.uniform(k_flip_f) < _flip_prob(state.pred_avg)
            flip_r = jax.random.uniform(k_flip_r) < _flip_prob(state.pred_avg_real)
            u = jax.random.uniform(k_lab)
            smooth = 0.9 + 0.1 * u - 1e-8
            fake_label = jnp.where(flip_f, smooth, 1e-8)
            real_label = jnp.where(flip_r, 1e-8, smooth)
            adapt = jnp.where(flip_f, 1.0, _adapt_rate(state.pred_avg))

            def disc_loss(dp):
                (p_f, _), new_dstats = self._apply(
                    self.disc, dp, state.disc_stats,
                    multiscale_crops(k_cf, jax.lax.stop_gradient(fake)),
                    train=True,
                )
                (p_r, _), new_dstats = self._apply(
                    self.disc, dp, new_dstats,
                    multiscale_crops(k_cr, truth), train=True,
                )
                p_f, p_r = jnp.mean(p_f), jnp.mean(p_r)
                lf = -jnp.log(jnp.clip(1.0 - jnp.abs(fake_label - p_f),
                                       1e-8, 1.0 - 1e-8))
                lr_ = -jnp.log(jnp.clip(1.0 - jnp.abs(real_label - p_r),
                                        1e-8, 1.0 - 1e-8))
                l2 = sum(jnp.sum(p**2)
                         for p in jax.tree_util.tree_leaves(dp))
                loss = adapt * lf + lr_ + cfg.disc_l2 * 0.5 * l2
                return loss, (new_dstats, p_f, p_r)

            (d_loss, (new_dstats, p_f, p_r)), d_grads = (
                jax.value_and_grad(disc_loss, has_aux=True)(state.disc_params)
            )

            # ---------------- gated updates ----------------
            # Both optimizers run every step; `do_gen`/`do_disc` gates mask
            # the update and freeze the optimizer state, so trainee switching
            # never recompiles.
            g_updates, g_new_opt = self.gen_opt.update(
                g_grads, state.gen_opt, state.gen_params
            )
            g_updates = jax.tree_util.tree_map(
                lambda upd: jnp.where(do_gen, upd, jnp.zeros_like(upd)), g_updates
            )
            g_new_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_gen, new, old), g_new_opt,
                state.gen_opt,
            )
            new_gen_params = optax.apply_updates(state.gen_params, g_updates)

            d_updates, d_new_opt = self.disc_opt.update(
                d_grads, state.disc_opt, state.disc_params
            )
            d_updates = jax.tree_util.tree_map(
                lambda upd: jnp.where(do_disc, upd, jnp.zeros_like(upd)), d_updates
            )
            d_new_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_disc, new, old), d_new_opt,
                state.disc_opt,
            )
            new_disc_params = optax.apply_updates(state.disc_params, d_updates)

            # Prediction EMAs (reference :1906-1915).
            new_pred_avg = cfg.ema_decay * state.pred_avg + (
                1 - cfg.ema_decay
            ) * p_fake_mean
            new_pred_avg_real = cfg.ema_decay * state.pred_avg_real + (
                1 - cfg.ema_decay
            ) * (1.0 - p_r)

            new_state = state.replace(
                step=state.step + 1,
                gen_params=new_gen_params,
                gen_stats=new_gstats,
                disc_params=new_disc_params,
                disc_stats=new_dstats,
                gen_opt=g_new_opt,
                disc_opt=d_new_opt,
                pred_avg=new_pred_avg,
                pred_avg_real=new_pred_avg_real,
            )
            metrics = {
                "gen_loss": g_loss,
                "disc_loss": d_loss,
                "d_fake": p_fake_mean,
                "d_fake_after": p_f,
                "d_real": p_r,
                "mse": mse,
            }
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,))

    @property
    def step_fn(self):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        return self._step_fn

    # ------------------------------------------------------------------
    def lr_at(self, step: int) -> float:
        """Staircase decay: from lr to 0 in lr_decay_frac steps after
        lr_decay_start (reference :1635-1642)."""
        cfg = self.cfg
        if step < cfg.lr_decay_start:
            return cfg.gen_lr
        n = 1 + (step - cfg.lr_decay_start) // cfg.lr_decay_every
        return max(0.0, cfg.gen_lr * (1.0 - cfg.lr_decay_frac * n))

    def fit(
        self,
        state: GANState,
        pipeline,
        num_steps: int,
        checkpointer=None,
        eval_fn=None,
        eval_every: int = 0,
    ) -> GANState:
        """Host loop: adaptive trainee switching + collapse rollback.
        `eval_fn(state, step)` runs every `eval_every` steps — the
        reference's val pass every val_skip_n iterations
        (gan-infilling-100.py:123,1834-1901)."""
        cfg = self.cfg
        sharding = batch_sharding(self.mesh)
        batch_size = getattr(getattr(pipeline, "cfg", None), "batch_size", 1)
        meter = ThroughputMeter(batch_size, every=max(1, cfg.log_every))
        train_gen = True
        num_since_change = 0
        window_pred = 0.0
        window_n = 0
        forced_switches = 0
        rollbacks = 0
        it = iter(pipeline)
        for _ in range(int(state.step), num_steps):
            batch = jax.device_put(next(it), sharding)
            state, metrics = self.step_fn(
                state, batch, jnp.asarray(train_gen), jnp.asarray(not train_gen)
            )
            step = int(state.step)
            d_fake = float(metrics["d_fake"])
            d_real = float(metrics["d_real"])

            # Collapse rollback (reference :1827-1831).
            if checkpointer is not None and abs(d_real - 0.5) < cfg.collapse_eps \
                    and abs(d_fake - 0.5) < cfg.collapse_eps and step > 10:
                try:
                    state, _ = checkpointer.rollback(state)
                    rollbacks += 1
                    self.logger.log(step, rollback=float(rollbacks))
                    continue
                except FileNotFoundError:
                    pass

            # Trainee switching every trainee_switch_skip_n steps on the
            # window-averaged D(fake) (reference :1903-1940), with a forced
            # flip after max_num_since_change consecutive one-sided windows
            # so neither net starves (reference :1922-1925).
            window_pred += d_fake
            window_n += 1
            if window_n >= max(1, cfg.trainee_switch_skip_n):
                avg_pred = window_pred / window_n
                window_pred, window_n = 0.0, 0
                if cfg.max_num_since_change and \
                        num_since_change >= cfg.max_num_since_change:
                    num_since_change = 1
                    train_gen = not train_gen
                    forced_switches += 1
                elif avg_pred < cfg.switch_low:
                    num_since_change = num_since_change + 1 if train_gen else 0
                    train_gen = True
                elif avg_pred > cfg.switch_high:
                    num_since_change = 0 if train_gen else num_since_change + 1
                    train_gen = False
                else:
                    num_since_change = 0
                    train_gen = not train_gen

            if cfg.log_every and step % cfg.log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                vals["train_gen"] = float(train_gen)
                vals["num_since_change"] = float(num_since_change)
                if forced_switches:
                    vals["forced_switches"] = float(forced_switches)
                tp = meter.update(step)
                if tp:
                    vals.update(tp)
                self.logger.log(step, **vals)

            if eval_fn and eval_every and step % eval_every == 0:
                eval_fn(state, step)

            if checkpointer is not None and cfg.ckpt_every_steps and \
                    step % cfg.ckpt_every_steps == 0:
                checkpointer.save(step, state, pipeline.state_dict())
        return state
