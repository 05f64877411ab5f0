"""Latent-GAN autoencoder: encode a micrograph to a compact FC latent,
decode back, train adversarially with the multiscale discriminator plus
reconstruction loss.

Intent-level rebuild of the reference latent family
(machine_learning/usupervised_latency.py generator_architecture:205-455 —
strided separable encoder to 4x4 at 2048 features, global-average FC
bottleneck with tanh+dropout, resize-conv decoder; leaky-relu activations;
the .pyw variant adds instance norm). The reference file repeatedly
overwrites `enc` with convs of the raw input (research-code bug); the
obviously-intended sequential encoder is implemented here.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from emx.nn.blocks import Norm, SepConvBlock


@dataclasses.dataclass(frozen=True)
class LatentAEConfig:
    enc_features: tuple[int, ...] = (32, 64, 128, 256, 512, 768, 1024)
    head_features: tuple[int, int] = (1536, 2048)
    latent_dim: int = 64
    dec_features: tuple[int, ...] = (512, 256, 128, 64, 32, 16, 16)
    dropout_rate: float = 0.25
    norm: str = "instance"
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls) -> "LatentAEConfig":
        return cls(enc_features=(8, 8, 16), head_features=(16, 16),
                   latent_dim=8, dec_features=(8, 8, 8))


class LatentEncoder(nn.Module):
    config: LatentAEConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        if x.ndim == 3:
            x = x[..., None]
        h = x.astype(cfg.dtype)
        act = lambda t: nn.leaky_relu(t, 0.2)
        for f in cfg.enc_features:
            h = SepConvBlock(f, strides=2, norm=cfg.norm, activation=act,
                             dtype=cfg.dtype)(h, train)
        for f in cfg.head_features:
            h = SepConvBlock(f, norm=cfg.norm, activation=act,
                             dtype=cfg.dtype)(h, train)
        pooled = jnp.mean(h, axis=(1, 2))
        z = jnp.tanh(nn.Dense(cfg.latent_dim, dtype=cfg.dtype)(pooled))
        if train and cfg.dropout_rate > 0:
            z = nn.Dropout(cfg.dropout_rate, deterministic=not train)(z)
        return z.astype(jnp.float32)


class LatentDecoder(nn.Module):
    config: LatentAEConfig

    @nn.compact
    def __call__(self, z, train: bool = False):
        cfg = self.config
        base = 4
        c0 = cfg.dec_features[0]
        h = nn.Dense(base * base * c0, dtype=cfg.dtype)(z.astype(cfg.dtype))
        h = nn.leaky_relu(h.reshape(z.shape[0], base, base, c0), 0.2)
        for f in cfg.dec_features:
            b, hh, ww, _ = h.shape
            h = jax.image.resize(h, (b, 2 * hh, 2 * ww, h.shape[-1]),
                                 method="linear").astype(cfg.dtype)
            h = nn.Conv(f, (3, 3), padding="SAME", dtype=cfg.dtype)(h)
            h = Norm(cfg.norm, dtype=cfg.dtype)(h, train)
            h = nn.leaky_relu(h, 0.2)
        out = nn.Conv(1, (3, 3), padding="SAME", dtype=cfg.dtype)(h)
        return jnp.tanh(out.astype(jnp.float32))


class LatentAutoencoder(nn.Module):
    """encode -> decode; output resolution = 4 * 2^len(dec_features)."""

    config: LatentAEConfig = LatentAEConfig()

    def setup(self):
        self.encoder = LatentEncoder(self.config)
        self.decoder = LatentDecoder(self.config)

    def __call__(self, x, train: bool = False):
        squeeze = x.ndim == 3
        z = self.encoder(x, train)
        out = self.decoder(z, train)
        return out[..., 0] if squeeze else out

    def encode(self, x, train: bool = False):
        return self.encoder(x, train)

    def decode(self, z, train: bool = False):
        return self.decoder(z, train)
