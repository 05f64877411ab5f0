"""Partial-scan infilling GAN (spiral/grid 1/64 and 1/100 coverage).

Rebuild of the reference's generator/discriminator family
(misc_py/gan-infilling-100.py generator_architecture:250-374,
discriminator_architecture:376-708; misc_py/stem_infilling-100.py):

Generator: 7x7 separable stem -> stride-2 encoder -> residual
network-in-network global path (3 stride-2 downs to 1/16 res, 8 Xception
middle blocks at 768 features, 3 resize-conv ups) -> 3 local Xception
enhancer blocks -> resize-conv up to full res -> 3x3 conv head ->
instance norm -> tanh (outputs in [-1, 1], matching the -1 mask fill).

Discriminator: three heads (small/medium/large) over multiscale random
crops, each 5 stride-2 separable convs (32..512) -> GAP -> dense logit;
`features` returns intermediate activations for the feature-matching
"natural statistics" L1 loss (gan-infilling-100.py:1025-1036).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from emx.nn.blocks import Norm, SepConvBlock, XceptionMiddleBlock, relu6


@dataclasses.dataclass(frozen=True)
class InfillingConfig:
    gen_features: tuple[int, int, int, int] = (32, 64, 64, 32)
    nin_down: tuple[int, int, int] = (128, 256, 768)
    nin_up: tuple[int, int, int] = (256, 128, 64)
    num_global_blocks: int = 8
    num_local_blocks: int = 3
    disc_features: tuple[int, ...] = (32, 64, 128, 256, 512)
    norm: str = "group"  # reference uses batch norm; group is batch-size-proof
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls) -> "InfillingConfig":
        return cls(gen_features=(8, 8, 8, 8), nin_down=(8, 8, 16),
                   nin_up=(8, 8, 8), num_global_blocks=1, num_local_blocks=1,
                   disc_features=(8, 8, 16))


def _resize_conv(x, features, norm, dtype, train):
    """Resize-conv upsample (avoids checkerboard artifacts of transpose
    conv; the reference's deconv_block with new_size does the same)."""
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear").astype(dtype)
    x = nn.Conv(features, (3, 3), padding="SAME", dtype=dtype)(x)
    x = Norm(norm, dtype=dtype)(x, train)
    return relu6(x)


class InfillingGenerator(nn.Module):
    config: InfillingConfig = InfillingConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        kw = dict(norm=cfg.norm, dtype=cfg.dtype)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[..., None]
        x = x.astype(cfg.dtype)

        g0, g1, g2, g3 = cfg.gen_features
        # 7x7 stem (implemented as a large-kernel depthwise + pointwise).
        cin = x.shape[-1]
        h = nn.Conv(cin, (7, 7), padding="SAME", feature_group_count=cin,
                    dtype=cfg.dtype)(x)
        h = nn.Conv(g0, (1, 1), dtype=cfg.dtype)(h)
        h = Norm(cfg.norm, dtype=cfg.dtype)(h, train)
        h = relu6(h)
        enc = SepConvBlock(g1, strides=2, **kw)(h, train)  # 1/2 res

        # Global network-in-network path (residual).
        nin = enc
        for f in cfg.nin_down:
            nin = SepConvBlock(f, strides=2, **kw)(nin, train)  # -> 1/16
        for _ in range(cfg.num_global_blocks):
            nin = XceptionMiddleBlock(cfg.nin_down[-1], **kw)(nin, train)
        for f in cfg.nin_up:
            nin = _resize_conv(nin, f, cfg.norm, cfg.dtype, train)  # -> 1/2
        # Project to enc width if needed, then residual add.
        if nin.shape[-1] != enc.shape[-1]:
            nin = nn.Conv(enc.shape[-1], (1, 1), dtype=cfg.dtype)(nin)
        enc = enc + nin

        for _ in range(cfg.num_local_blocks):
            enc = XceptionMiddleBlock(g2, **kw)(enc, train)

        enc = _resize_conv(enc, g3, cfg.norm, cfg.dtype, train)  # full res
        enc = SepConvBlock(g3, **kw)(enc, train)

        out = nn.Conv(1, (3, 3), padding="SAME", dtype=cfg.dtype)(enc)
        out = Norm("instance", dtype=cfg.dtype)(out)
        out = jnp.tanh(out.astype(jnp.float32))
        return out[..., 0] if squeeze else out


class _DiscriminatorHead(nn.Module):
    features: tuple[int, ...]
    norm: str
    dtype: Any
    prepool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = []
        if self.prepool:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        for f in self.features:
            x = SepConvBlock(f, strides=2, norm=self.norm, dtype=self.dtype)(
                x, train
            )
            taps.append(x)
        pooled = jnp.mean(x, axis=(1, 2))
        logit = nn.Dense(1, dtype=self.dtype)(pooled)
        return logit[..., 0].astype(jnp.float32), taps


class MultiscaleDiscriminator(nn.Module):
    """Heads over (small, medium, large) crops. Returns (prob, features):
    prob = sigmoid(max of head logits) (reference sigmoid-of-max readout,
    gan-infilling-100.py:698-708), features = all intermediate activations."""

    config: InfillingConfig = InfillingConfig()

    @nn.compact
    def __call__(self, crops, train: bool = False):
        cfg = self.config
        small, medium, large = crops

        def to4d(t):
            return t[..., None] if t.ndim == 3 else t

        l_small, f_small = _DiscriminatorHead(
            cfg.disc_features, cfg.norm, cfg.dtype, name="small"
        )(to4d(small), train)
        l_medium, f_medium = _DiscriminatorHead(
            cfg.disc_features, cfg.norm, cfg.dtype, prepool=True, name="medium"
        )(to4d(medium), train)
        l_large, f_large = _DiscriminatorHead(
            cfg.disc_features, cfg.norm, cfg.dtype, name="large"
        )(to4d(large), train)
        logits = jnp.stack([l_small, l_medium, l_large], axis=-1)
        prob = jax.nn.sigmoid(jnp.max(logits, axis=-1))
        return prob, f_small + f_medium + f_large


def multiscale_crops(key: jax.Array, img: jax.Array, cropsize: int | None = None):
    """Random multiscale crops for the discriminator
    (reference get_multiscale_crops, gan-infilling-100.py:957-980):
    reflect-pad by 3/4 size, then random crops at 1/4, 1/2 and 3/4 scale,
    the large one resized down to 1/4 scale."""
    if img.ndim == 3:
        img = img[..., None]
    b, h, w, c = img.shape
    n = cropsize or h
    pad = (3 * n) // 4
    padded = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="reflect")

    def rand_crop(k, size):
        ky, kx = jax.random.split(k)
        y = jax.random.randint(ky, (), 0, padded.shape[1] - size + 1)
        x = jax.random.randint(kx, (), 0, padded.shape[2] - size + 1)
        return jax.lax.dynamic_slice(padded, (0, y, x, 0), (b, size, size, c))

    k1, k2, k3 = jax.random.split(key, 3)
    small = rand_crop(k1, n // 4)
    medium = rand_crop(k2, n // 2)
    large = rand_crop(k3, (3 * n) // 4)
    large = jax.image.resize(large, (b, n // 4, n // 4, c), method="linear")
    return small, medium, large
