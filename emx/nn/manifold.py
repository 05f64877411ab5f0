"""Shared-manifold domain translator (TEM <-> STEM).

Capability rebuild of reference misc_py/shared_manifold.pyw (1806 LoC):
per-domain Distiller (encoder into a shared code space) + Generator
(decoder from shared code back to a domain), two per-domain
discriminators, and "confuser" heads that adversarially remove domain
information from the shared code (shared_manifold.pyw:945-1035). Losses:
within-domain reconstruction (distillation MSE), cross-domain adversarial
terms, and confusion entropy.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from emx.nn.blocks import Norm, SepConvBlock, relu6


@dataclasses.dataclass(frozen=True)
class ManifoldConfig:
    enc_features: tuple[int, ...] = (32, 64, 128)
    code_features: int = 128
    dec_features: tuple[int, ...] = (64, 32)
    disc_features: tuple[int, ...] = (32, 64, 128)
    norm: str = "instance"
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls) -> "ManifoldConfig":
        return cls(enc_features=(8, 8), code_features=8,
                   dec_features=(8,), disc_features=(8, 8))


class Distiller(nn.Module):
    """Domain encoder into the shared manifold code."""

    config: ManifoldConfig

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
        h = nn.Conv(cfg.code_features, (1, 1), dtype=cfg.dtype)(h)
        return jnp.tanh(h.astype(jnp.float32))


class DomainGenerator(nn.Module):
    """Decoder from the shared code into one domain."""

    config: ManifoldConfig

    @nn.compact
    def __call__(self, code, train: bool = False):
        cfg = self.config
        h = code.astype(cfg.dtype)
        ups = len(cfg.enc_features)
        feats = list(cfg.dec_features) + [cfg.dec_features[-1]] * ups
        for i in range(ups):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), method="linear")
            h = nn.Conv(feats[i], (3, 3), padding="SAME", dtype=cfg.dtype)(h)
            h = Norm(cfg.norm, dtype=cfg.dtype)(h, train)
            h = relu6(h)
        out = nn.Conv(1, (3, 3), padding="SAME", dtype=cfg.dtype)(h)
        return jax.nn.sigmoid(out.astype(jnp.float32))[..., 0]


class DomainDiscriminator(nn.Module):
    config: ManifoldConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        if x.ndim == 3:
            x = x[..., None]
        h = x.astype(cfg.dtype)
        for f in cfg.disc_features:
            h = SepConvBlock(f, strides=2, norm=cfg.norm, dtype=cfg.dtype)(
                h, train
            )
        return jax.nn.sigmoid(
            nn.Dense(1)(jnp.mean(h, axis=(1, 2))).astype(jnp.float32)
        )[..., 0]


class Confuser(nn.Module):
    """Predicts which domain a shared code came from; the distillers are
    trained to defeat it (domain-confusion heads,
    shared_manifold.pyw:945-1035)."""

    config: ManifoldConfig

    @nn.compact
    def __call__(self, code):
        h = jnp.mean(code, axis=(1, 2))
        h = nn.relu(nn.Dense(64)(h))
        return jax.nn.sigmoid(nn.Dense(1)(h).astype(jnp.float32))[..., 0]


class SharedManifoldTranslator(nn.Module):
    """Bundles both domains: translate A->B via distill_a + gen_b."""

    config: ManifoldConfig = ManifoldConfig.tiny()

    def setup(self):
        self.distill_a = Distiller(self.config)
        self.distill_b = Distiller(self.config)
        self.gen_a = DomainGenerator(self.config)
        self.gen_b = DomainGenerator(self.config)
        self.confuser = Confuser(self.config)

    def __call__(self, a, b, train: bool = False):
        code_a = self.distill_a(a, train)
        code_b = self.distill_b(b, train)
        return {
            "recon_a": self.gen_a(code_a, train),
            "recon_b": self.gen_b(code_b, train),
            "a_to_b": self.gen_b(code_a, train),
            "b_to_a": self.gen_a(code_b, train),
            "code_a": code_a,
            "code_b": code_b,
            "domain_pred_a": self.confuser(code_a),
            "domain_pred_b": self.confuser(code_b),
        }


def manifold_losses(out: dict, a: jax.Array, b: jax.Array) -> dict:
    """Distillation + confusion losses. The confuser itself is trained on
    a separate BCE; the distillers receive `confusion` (entropy toward
    0.5) — returned separately for the two optimizers."""
    recon = jnp.mean((out["recon_a"] - a) ** 2) + jnp.mean(
        (out["recon_b"] - b) ** 2
    )
    eps = 1e-7
    pa = jnp.clip(out["domain_pred_a"], eps, 1 - eps)
    pb = jnp.clip(out["domain_pred_b"], eps, 1 - eps)
    confuser_bce = -jnp.mean(jnp.log(1 - pa)) - jnp.mean(jnp.log(pb))
    confusion = jnp.mean((pa - 0.5) ** 2) + jnp.mean((pb - 0.5) ** 2)
    return {"recon": recon, "confuser_bce": confuser_bce,
            "confusion": confusion}
