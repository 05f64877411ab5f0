"""Per-dose-bin adaptive loss probing.

Rebuilds the reference's dynamic training-dose adjustment
(misc_py/encoder-decoder.py get_training_probs:939-959 and the eval loop
:1042-1052): the validation loss is measured separately at each of
`num_bins` Poisson dose means; the per-bin loss *improvements* since the
previous probe (boxcar-smoothed, clamped at 0, floored at 5% of the max)
become a cumulative sampling distribution, and training examples draw
their dose by inverse-CDF from it — training concentrates on the dose
regimes where the model is currently learning fastest.

TPU-native split: the probe state (previous losses, CDF) lives on host —
it changes every eval, not every step — while dose *sampling* is a pure
traced function of (key, cum_probs); the CDF enters the jitted train
step as a traced argument so updating it never recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from emx.data.degrade import poisson_dose, sample_dose_scale
from emx.utils.image import flip_rotate, sanitize, scale0to1


def moving_average(values: np.ndarray, window: int) -> np.ndarray:
    """Boxcar smoothing, 'same' length (reference movingAverage:930-935)."""
    if window <= 1:
        return np.asarray(values, np.float32)
    w = np.repeat(1.0, window) / window
    return np.convolve(values, w, "same").astype(np.float32)


def training_probs(prev_losses, new_losses, smoothing: int = 5,
                   floor: float = 0.05) -> np.ndarray:
    """Cumulative per-bin sampling probabilities from two loss probes
    (reference get_training_probs:938-956): positive smoothed
    improvements + a `floor`*max offset, normalised cumsum."""
    diffs = moving_average(prev_losses, smoothing) - moving_average(
        new_losses, smoothing)
    diffs = np.maximum(diffs, 0.0)
    max_diff = float(np.max(diffs))
    if max_diff == 0.0:
        max_diff = 1.0
    diffs = diffs + floor * max_diff
    cum = np.cumsum(diffs)
    return (cum / cum[-1]).astype(np.float32)


def sample_dose(key: jax.Array, cum_probs: jax.Array,
                dose_means: jax.Array) -> jax.Array:
    """Inverse-CDF draw of a dose mean; jit/vmap-safe."""
    u = jax.random.uniform(key)
    idx = jnp.searchsorted(cum_probs, u, side="left")
    return dose_means[jnp.clip(idx, 0, dose_means.shape[0] - 1)]


def probed_denoiser_example(key: jax.Array, img: jax.Array,
                            cum_probs: jax.Array, dose_means: jax.Array):
    """denoiser_example (emx.data.degrade) with the dose drawn from the
    probe's CDF instead of 25+Exp(75)."""
    k_aug, k_dose, k_noise = jax.random.split(key, 3)
    img = scale0to1(sanitize(img))
    img = flip_rotate(img, jax.random.randint(k_aug, (), 0, 8))
    scale = sample_dose(k_dose, cum_probs, dose_means)
    lq = poisson_dose(k_noise, img, scale)
    target = img * (jnp.mean(lq) / jnp.maximum(jnp.mean(img), 1e-12))
    return lq, target


class DoseProbe:
    """Host-side probe state + jitted per-bin evaluation.

    Usage with the Trainer (see emx.train.engine):
        probe = DoseProbe(num_bins=20)
        trainer = Trainer(model, cfg, example_fn=probe.example_fn,
                          probe=probe)
        trainer.fit(state, pipe, steps,
                    eval_fn=probe.make_eval_hook(trainer, val_images),
                    eval_every=500)
    """

    def __init__(self, num_bins: int = 20, dose_min: float = 25.0,
                 dose_max: float = 400.0, smoothing: int = 5,
                 floor: float = 0.05):
        self.dose_means = np.linspace(dose_min, dose_max, num_bins).astype(
            np.float32)
        self.smoothing = smoothing
        self.floor = floor
        self.prev_losses: np.ndarray | None = None
        # Uniform CDF until two probes exist.
        self.cum_probs = (np.arange(1, num_bins + 1) / num_bins).astype(
            np.float32)
        self._eval_fn = None

    # -- traced-side ------------------------------------------------------
    @property
    def example_fn(self):
        dose_means = jnp.asarray(self.dose_means)

        def fn(key, img, cum_probs):
            return probed_denoiser_example(key, img, cum_probs, dose_means)

        return fn

    def device_probs(self) -> jnp.ndarray:
        return jnp.asarray(self.cum_probs)

    # -- host-side --------------------------------------------------------
    def update(self, losses) -> np.ndarray:
        """Feed a new per-bin loss probe; returns the refreshed CDF."""
        losses = np.asarray(losses, np.float32)
        if self.prev_losses is not None:
            self.cum_probs = training_probs(
                self.prev_losses, losses, self.smoothing, self.floor)
        self.prev_losses = losses
        return self.cum_probs

    def make_eval_hook(self, trainer, val_images, loss_fn=None):
        """eval_fn(state, step) for Trainer.fit: measures the val loss at
        every dose bin in ONE jitted program (bins vmapped, fixed dose per
        bin — the reference ran numMeans x numDynamicGrad separate
        sess.run probes) and updates the CDF."""
        from emx.train.losses import huberised_mse

        loss_fn = loss_fn or huberised_mse
        model = trainer.model
        dose_means = jnp.asarray(self.dose_means)
        val = jnp.asarray(val_images)

        @jax.jit
        def probe_losses(params, batch_stats, key):
            variables = {"params": params}
            if jax.tree_util.tree_leaves(batch_stats):
                variables["batch_stats"] = batch_stats

            def bin_loss(dose, k):
                def one(kk, img):
                    img = scale0to1(sanitize(img))
                    lq = poisson_dose(kk, img, dose)
                    tgt = img * (jnp.mean(lq) /
                                 jnp.maximum(jnp.mean(img), 1e-12))
                    return lq, tgt

                lq, tgt = jax.vmap(one)(
                    jax.random.split(k, val.shape[0]), val)
                out = model.apply(variables, lq, train=False)
                return loss_fn(out, tgt)

            keys = jax.random.split(key, dose_means.shape[0])
            return jax.vmap(bin_loss)(dose_means, keys)

        def hook(state, step):
            losses = probe_losses(state.params, state.batch_stats,
                                  jax.random.key(step))
            self.update(np.asarray(losses))
            if getattr(trainer, "logger", None) is not None:
                trainer.logger.log(step,
                                   dose_probe_max=float(np.max(losses)),
                                   dose_probe_min=float(np.min(losses)))

        return hook
