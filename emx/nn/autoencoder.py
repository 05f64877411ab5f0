"""Autoencoder family.

  * SmallAutoencoder — 160^2-crop conv autoencoder: three stride-2
    separable convs (64/128/256), 16-channel 1x1-bottleneck stage, three
    transpose-conv ups, 3x3 head with instance-norm output
    (reference misc_py/autoencoder.py architecture:83-176).
  * XceptionAutoencoder — aligned-Xception entry/middle/exit encoder +
    ASPP + deep decoder to the full resolution
    (reference misc_py/modified_Xception.py:194-655,
    modified_aligned_xception.py:1-426).
  * UnsupervisedEmbedder — Xception trunk -> GAP -> 2 FC4096 -> N-way
    softmax embedding trained with the batch-paired cosine-similarity
    metric loss (reference misc_py/unsupervised_Xception.py:435-457,
    677-727).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from emx.nn.blocks import ASPP, Norm, SepConvBlock, XceptionMiddleBlock, relu6


@dataclasses.dataclass(frozen=True)
class SmallAEConfig:
    features: tuple[int, int, int] = (64, 128, 256)
    bottleneck: int = 16
    norm: str = "batch"
    dtype: Any = jnp.float32


class SmallAutoencoder(nn.Module):
    config: SmallAEConfig = SmallAEConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        squeeze = x.ndim == 3
        if squeeze:
            x = x[..., None]
        x = x.astype(cfg.dtype)
        kw = dict(norm=cfg.norm, dtype=cfg.dtype)
        h = x
        for f in cfg.features:
            h = SepConvBlock(f, strides=2, **kw)(h, train)
        h = SepConvBlock(cfg.bottleneck, **kw)(h, train)
        from emx.nn.blocks import DeconvBlock

        for f in reversed(cfg.features):
            h = DeconvBlock(f, norm=cfg.norm, mode="transpose",
                            dtype=cfg.dtype)(h, train)
        out = nn.Conv(1, (3, 3), padding="SAME", dtype=cfg.dtype)(h)
        out = Norm("instance", dtype=cfg.dtype)(out).astype(jnp.float32)
        return out[..., 0] if squeeze else out

    def encode(self, variables, x):
        """Bottleneck features for retrieval/clustering workflows."""
        # Rebuild encoder path only via capture of intermediates.
        _, state = self.apply(variables, x, train=False,
                              capture_intermediates=True)
        inters = state["intermediates"] if "intermediates" in state else state
        return inters


@dataclasses.dataclass(frozen=True)
class XceptionAEConfig:
    entry_features: tuple[int, ...] = (128, 256, 728)
    num_middle_blocks: int = 16
    exit_features: tuple[int, int] = (728, 1024)
    aspp_out: int = 256
    decoder_features: tuple[int, ...] = (256, 128, 64, 32)
    norm: str = "group"
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls) -> "XceptionAEConfig":
        return cls(entry_features=(8, 12, 16), num_middle_blocks=1,
                   exit_features=(16, 16), aspp_out=8,
                   decoder_features=(8, 8))


class XceptionAutoencoder(nn.Module):
    config: XceptionAEConfig = XceptionAEConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        squeeze = x.ndim == 3
        if squeeze:
            x = x[..., None]
        x = x.astype(cfg.dtype)
        kw = dict(norm=cfg.norm, dtype=cfg.dtype)

        # Entry flow: stem + strided residual blocks.
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=cfg.dtype)(x)
        h = Norm(cfg.norm, dtype=cfg.dtype)(h, train)
        h = relu6(h)
        h = SepConvBlock(64, **kw)(h, train)
        for f in cfg.entry_features:
            a = SepConvBlock(f, **kw)(h, train)
            a = SepConvBlock(f, **kw)(a, train)
            a = SepConvBlock(f, strides=2, **kw)(a, train)
            res = nn.Conv(f, (1, 1), strides=(2, 2), dtype=cfg.dtype)(h)
            h = a + res

        # Middle flow.
        for _ in range(cfg.num_middle_blocks):
            h = XceptionMiddleBlock(cfg.entry_features[-1], **kw)(h, train)

        # Exit flow.
        f0, f1 = cfg.exit_features
        a = SepConvBlock(f0, **kw)(h, train)
        a = SepConvBlock(f1, strides=2, **kw)(a, train)
        res = nn.Conv(f1, (1, 1), strides=(2, 2), dtype=cfg.dtype)(h)
        h = a + res

        h = ASPP(f1, cfg.aspp_out, norm=cfg.norm, dtype=cfg.dtype)(h, train)

        # Decoder back to full resolution: one up per downsample
        # (stem stride-2 + each entry block + exit block).
        from emx.nn.blocks import DeconvBlock

        num_ups = 1 + len(cfg.entry_features) + 1
        feats = list(cfg.decoder_features)
        while len(feats) < num_ups:
            feats.append(feats[-1])
        for f in feats[:num_ups]:
            h = DeconvBlock(f, norm=cfg.norm, mode="transpose",
                            dtype=cfg.dtype)(h, train)
        out = nn.Conv(1, (3, 3), padding="SAME", dtype=cfg.dtype)(h)
        out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
        return out[..., 0] if squeeze else out


@dataclasses.dataclass(frozen=True)
class EmbedderConfig:
    entry_features: tuple[int, ...] = (128, 256, 728)
    num_middle_blocks: int = 8
    fc_features: int = 4096
    embedding_dim: int = 30
    norm: str = "group"
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls) -> "EmbedderConfig":
        return cls(entry_features=(8, 12, 16), num_middle_blocks=1,
                   fc_features=32, embedding_dim=6)


class UnsupervisedEmbedder(nn.Module):
    config: EmbedderConfig = EmbedderConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 features: bool = False) -> jax.Array:
        cfg = self.config
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(cfg.dtype)
        kw = dict(norm=cfg.norm, dtype=cfg.dtype)
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=cfg.dtype)(x)
        h = relu6(Norm(cfg.norm, dtype=cfg.dtype)(h, train))
        for f in cfg.entry_features:
            a = SepConvBlock(f, **kw)(h, train)
            a = SepConvBlock(f, strides=2, **kw)(a, train)
            res = nn.Conv(f, (1, 1), strides=(2, 2), dtype=cfg.dtype)(h)
            h = a + res
        for _ in range(cfg.num_middle_blocks):
            h = XceptionMiddleBlock(cfg.entry_features[-1], **kw)(h, train)
        h = jnp.mean(h, axis=(1, 2))
        h = nn.relu(nn.Dense(cfg.fc_features, dtype=cfg.dtype)(h))
        h = nn.relu(nn.Dense(cfg.fc_features, dtype=cfg.dtype)(h))
        if features:
            # Penultimate FC features: the retrieval representation
            # (the 30-way softmax head collapses rank; standard practice
            # evaluates the layer below it).
            return h.astype(jnp.float32)
        logits = nn.Dense(cfg.embedding_dim, dtype=cfg.dtype)(h)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def embedder_metric_loss(embeddings: jax.Array) -> jax.Array:
    """Batch-paired cosine similarity minus median dissimilarity
    (reference unsupervised_Xception.py:677-727): consecutive pairs
    (2i, 2i+1) are two crops of the same micrograph — pull their
    embeddings together while pushing apart the median off-pair
    similarity."""
    e = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-8
    )
    sim = e @ e.T
    n = e.shape[0]
    idx = jnp.arange(n // 2)
    pair_sim = sim[2 * idx, 2 * idx + 1]
    mask = jnp.ones_like(sim, dtype=bool)
    mask = mask.at[2 * idx, 2 * idx + 1].set(False)
    mask = mask.at[2 * idx + 1, 2 * idx].set(False)
    mask = mask & ~jnp.eye(n, dtype=bool)
    off = jnp.where(mask, sim, jnp.nan)
    med_off = jnp.nanmedian(off)
    return jnp.mean(1.0 - pair_sim) + jnp.maximum(med_off, 0.0)
