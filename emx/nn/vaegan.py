"""Nested VAE-GAN ("VAE-GAN-in-VAE-GAN") representation learner.

Capability rebuild of reference misc_py/ga-vae.py (1859 LoC): an outer
encoder/decoder autoencodes the micrograph; an inner VAE bottlenecks the
outer code; a spectral-normalised critic provides a Wasserstein loss with
gradient penalty; a siamese encoder enforces that augmented views (D4 /
polar warp / cutout) embed together; losses are combined with the
reference weights (ga-vae.py:852-870: wass 1, gp 10, rot-invariance 1,
siamese 1, mse 1).

TPU-native: one fused train step updates all six parameter groups
(ga-vae used six separate optimizers with placeholder lr/beta feeds).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from emx.nn.blocks import Norm, SepConvBlock, relu6


# ---------------------------------------------------------------------------
# Spectral normalization (ga-vae.py:79-113) — power iteration on a stored u.
# ---------------------------------------------------------------------------
class SNDense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features))
        u = self.variable("spectral", "u",
                          lambda: jax.random.normal(jax.random.key(0),
                                                    (self.features,)))
        v = w @ u.value
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u_new = w.T @ v
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
        sigma = v @ w @ u_new
        if not self.is_initializing() and self.is_mutable_collection("spectral"):
            u.value = jax.lax.stop_gradient(u_new)
        return x @ (w / jnp.maximum(sigma, 1e-12))


class SNConv(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        kmat = k.reshape(-1, self.features)
        u = self.variable("spectral", "u",
                          lambda: jax.random.normal(jax.random.key(0),
                                                    (self.features,)))
        v = kmat @ u.value
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u_new = kmat.T @ v
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
        sigma = v @ kmat @ u_new
        if not self.is_initializing() and self.is_mutable_collection("spectral"):
            u.value = jax.lax.stop_gradient(u_new)
        k_sn = k / jnp.maximum(sigma, 1e-12)
        return jax.lax.conv_general_dilated(
            x, k_sn, (self.strides, self.strides), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


@dataclasses.dataclass(frozen=True)
class VAEGANConfig:
    enc_features: tuple[int, ...] = (64, 128, 256, 512)
    inner_latent: int = 64
    dec_features: tuple[int, ...] = (256, 128, 64, 32)
    critic_features: tuple[int, ...] = (64, 128, 256, 512)
    siamese_dim: int = 64
    norm: str = "instance"
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls) -> "VAEGANConfig":
        return cls(enc_features=(8, 8, 16), inner_latent=8,
                   dec_features=(8, 8, 8), critic_features=(8, 8),
                   siamese_dim=8)


class OuterEncoder(nn.Module):
    config: VAEGANConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        if x.ndim == 3:
            x = x[..., None]
        h = x.astype(cfg.dtype)
        for f in cfg.enc_features:
            h = SepConvBlock(f, strides=2, norm=cfg.norm, dtype=cfg.dtype)(
                h, train
            )
        return h  # (B, h/2^k, w/2^k, C) outer code


class InnerVAE(nn.Module):
    """VAE over the pooled outer code: returns (z, mu, logvar, recon_code)."""

    config: VAEGANConfig

    @nn.compact
    def __call__(self, code, key, train: bool = False):
        cfg = self.config
        pooled = jnp.mean(code, axis=(1, 2))
        mu = nn.Dense(cfg.inner_latent)(pooled)
        logvar = nn.Dense(cfg.inner_latent)(pooled)
        eps = jax.random.normal(key, mu.shape)
        z = mu + jnp.exp(0.5 * logvar) * eps if train else mu
        up = nn.Dense(code.shape[-1])(z)
        recon_code = code + up[:, None, None, :]  # re-inject through latent
        return z, mu, logvar, recon_code


class OuterDecoder(nn.Module):
    config: VAEGANConfig

    @nn.compact
    def __call__(self, code, train: bool = False):
        cfg = self.config
        h = code
        for f in cfg.dec_features:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), method="linear")
            h = nn.Conv(f, (3, 3), padding="SAME", dtype=cfg.dtype)(h)
            h = Norm(cfg.norm, dtype=cfg.dtype)(h, train)
            h = relu6(h)
        out = nn.Conv(1, (3, 3), padding="SAME", dtype=cfg.dtype)(h)
        return jax.nn.sigmoid(out.astype(jnp.float32))


class SpectralCritic(nn.Module):
    """Wasserstein critic with spectral-normalised convs (ga-vae
    discriminator_architecture:572-708)."""

    config: VAEGANConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        if x.ndim == 3:
            x = x[..., None]
        h = x
        for f in cfg.critic_features:
            h = SNConv(f, strides=2)(h)
            h = nn.leaky_relu(h, 0.2)
        h = jnp.mean(h, axis=(1, 2))
        return SNDense(1)(h)[..., 0]


class SiameseEncoder(nn.Module):
    config: VAEGANConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        if x.ndim == 3:
            x = x[..., None]
        h = x.astype(cfg.dtype)
        for f in cfg.enc_features[:3]:
            h = SepConvBlock(f, strides=2, norm=cfg.norm, dtype=cfg.dtype)(
                h, train
            )
        return nn.Dense(cfg.siamese_dim)(jnp.mean(h, axis=(1, 2)))


class NestedVAEGAN(nn.Module):
    config: VAEGANConfig = VAEGANConfig.tiny()

    def setup(self):
        self.outer_enc = OuterEncoder(self.config)
        self.inner = InnerVAE(self.config)
        self.outer_dec = OuterDecoder(self.config)
        self.siamese = SiameseEncoder(self.config)

    def __call__(self, x, key, train: bool = False):
        code = self.outer_enc(x, train)
        z, mu, logvar, recon_code = self.inner(code, key, train)
        recon = self.outer_dec(recon_code, train)
        if x.ndim == 3:
            recon = recon[..., 0]
        # Touch the siamese branch so init creates its params too.
        emb = self.siamese(x, train)
        return {"recon": recon, "z": z, "mu": mu, "logvar": logvar,
                "embedding": emb}

    def embed(self, x, train: bool = False):
        return self.siamese(x, train)


def kl_divergence(mu, logvar):
    return -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))


def gradient_penalty(critic_fn, key, real, fake):
    """WGAN-GP interpolation penalty (ga-vae gp weight 10)."""
    eps = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
    mix = eps * real + (1 - eps) * fake

    def per_sample(xi):
        return critic_fn(xi[None])[0]

    grads = jax.vmap(jax.grad(per_sample))(mix)
    norms = jnp.sqrt(jnp.sum(grads**2, axis=tuple(range(1, grads.ndim))) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def polar_warp(img: jax.Array) -> jax.Array:
    """Cartesian -> polar resample about the image centre (the ga-vae
    rotation-invariance augmentation; reference misc_py/cart-to-polar.py)."""
    n = img.shape[-1]
    r = jnp.linspace(0, n / 2 - 1, n)
    theta = jnp.linspace(0, 2 * jnp.pi, n, endpoint=False)
    rr, tt = jnp.meshgrid(r, theta, indexing="ij")
    ys = n / 2 + rr * jnp.sin(tt)
    xs = n / 2 + rr * jnp.cos(tt)
    y0 = jnp.clip(ys.astype(jnp.int32), 0, n - 1)
    x0 = jnp.clip(xs.astype(jnp.int32), 0, n - 1)
    return img[..., y0, x0]


def cutout(key: jax.Array, img: jax.Array, frac: float = 0.25) -> jax.Array:
    """Random square cutout filled with the image mean."""
    n = img.shape[-1]
    s = max(1, int(frac * n))
    ky, kx = jax.random.split(key)
    y = jax.random.randint(ky, (), 0, n - s + 1)
    x = jax.random.randint(kx, (), 0, n - s + 1)
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    mask = (rows >= y) & (rows < y + s) & (cols >= x) & (cols < x + s)
    return jnp.where(mask, jnp.mean(img), img)


@dataclasses.dataclass
class VAEGANLossWeights:
    wass: float = 1.0
    gp: float = 10.0
    kl: float = 1.0
    rot_invar: float = 1.0
    siamese: float = 1.0
    mse: float = 1.0


def vaegan_losses(
    model: NestedVAEGAN,
    variables,
    critic: SpectralCritic,
    critic_vars,
    batch: jax.Array,
    key: jax.Array,
    weights: VAEGANLossWeights = VAEGANLossWeights(),
):
    """All generator-side losses of the reference experiment()
    (ga-vae.py:852-1050), evaluated in one pass."""
    k_vae, k_aug, k_gp = jax.random.split(key, 3)
    out = model.apply(variables, batch, k_vae, train=True,
                      rngs={"params": k_vae})
    recon = out["recon"]

    mse = jnp.mean((recon - batch) ** 2)
    kl = kl_divergence(out["mu"], out["logvar"])

    def critic_fn(x):
        return critic.apply(critic_vars, x)

    wass = -jnp.mean(critic_fn(recon))
    gp = gradient_penalty(critic_fn, k_gp, batch, recon)

    # Rotation invariance: polar warp of input embeds like the input.
    emb = model.apply(variables, batch, method=NestedVAEGAN.embed)
    emb_rot = model.apply(variables, jnp.rot90(batch, 1, (-2, -1)),
                          method=NestedVAEGAN.embed)
    rot_invar = jnp.mean((emb - emb_rot) ** 2)

    # Siamese: cutout view embeds like the clean view.
    keys = jax.random.split(k_aug, batch.shape[0])
    cut = jax.vmap(cutout)(keys, batch)
    emb_cut = model.apply(variables, cut, method=NestedVAEGAN.embed)
    siamese = jnp.mean((emb - emb_cut) ** 2)

    total = (weights.mse * mse + weights.kl * kl + weights.wass * wass
             + weights.rot_invar * rot_invar + weights.siamese * siamese)
    parts = {"mse": mse, "kl": kl, "wass": wass, "gp": gp,
             "rot_invar": rot_invar, "siamese": siamese}
    return total, parts
