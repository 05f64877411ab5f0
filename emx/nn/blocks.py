"""Reusable flax building blocks for the model zoo.

The reference's per-script block vocabulary (conv_block, strided_conv_block
= separable atrous conv, deconv_block, aspp_block, xception_middle_block —
misc_py/denoiser-multi-gpu.py:200-395) rebuilt once as flax modules, NHWC,
with a configurable norm:

  * 'batch'    — cross-replica BatchNorm (axis_name pmean over the mesh's
                 data axis replaces the reference's "only tower 0 updates
                 BN" hack, denoiser-multi-gpu.py:701-707)
  * 'group'    — GroupNorm: batch-independent, no moving stats, the
                 TPU-preferred default for the tiny batches these models use
  * 'instance' — per-image norm (used by the latent-GAN family,
                 machine_learning/unsupervised_latency.pyw)

Compute dtype is configurable (bfloat16 on TPU); params stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class Norm(nn.Module):
    kind: str = "batch"
    axis_name: str | None = None  # cross-replica axis for batch stats
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
            )(x)
        if self.kind == "group":
            groups = min(32, x.shape[-1])
            while x.shape[-1] % groups:
                groups -= 1
            return nn.GroupNorm(num_groups=groups, dtype=self.dtype)(x)
        if self.kind == "instance":
            return nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)
        if self.kind == "none":
            return x
        raise ValueError(f"unknown norm kind {self.kind!r}")


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class ConvBlock(nn.Module):
    """Conv -> norm -> relu6 (reference conv_block_not_sep)."""

    features: int
    kernel: int = 3
    strides: int = 1
    norm: str = "batch"
    axis_name: str | None = None
    activation: Callable = relu6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        x = Norm(self.norm, self.axis_name, self.dtype)(x, train)
        return self.activation(x)


class SepConvBlock(nn.Module):
    """Depthwise(3x3, stride, dilation) -> pointwise(1x1) -> norm -> relu6.

    The reference's strided_conv_block (slim.separable_convolution2d with
    rate/stride, denoiser-multi-gpu.py:249-275). One norm per block — the
    reference's redundant double BatchNorm is intentionally not reproduced.
    """

    features: int
    strides: int = 1
    rate: int = 1
    norm: str = "batch"
    axis_name: str | None = None
    activation: Callable = relu6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        x = nn.Conv(
            cin,
            (3, 3),
            strides=(self.strides, self.strides),
            padding="SAME",
            kernel_dilation=(self.rate, self.rate),
            feature_group_count=cin,
            dtype=self.dtype,
        )(x)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        x = Norm(self.norm, self.axis_name, self.dtype)(x, train)
        return self.activation(x)


class DeconvBlock(nn.Module):
    """2x upsample -> norm -> relu6 (reference deconv_block).

    `mode='resize_sep'` (default) is bilinear resize + separable conv —
    the TPU-efficient, checkerboard-free upsampler (transpose convs lower
    to input-dilated convs on TPU and dominated the profile);
    `mode='transpose'` reproduces the reference's ConvTranspose."""

    features: int
    norm: str = "batch"
    axis_name: str | None = None
    mode: str = "resize_sep"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.mode == "transpose":
            x = nn.ConvTranspose(
                self.features, (3, 3), strides=(2, 2), padding="SAME",
                dtype=self.dtype,
            )(x)
            x = Norm(self.norm, self.axis_name, self.dtype)(x, train)
            return relu6(x)
        b = x.shape[:-3]
        h, w, c = x.shape[-3:]
        x = jax.image.resize(
            x, (*b, 2 * h, 2 * w, c), method="linear"
        ).astype(self.dtype)
        return SepConvBlock(
            self.features, norm=self.norm, axis_name=self.axis_name,
            dtype=self.dtype,
        )(x, train)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling with image-level features
    (reference aspp_block, denoiser-multi-gpu.py:291-361): 1x1 conv +
    three dilated 3x3 convs (rates 6/12/18) + avg-pooled image-level
    1x1 conv upsampled back, concatenated then projected.

    `separable=True` (default) uses dilated depthwise+pointwise branches —
    9x fewer branch FLOPs on the MXU, the DeepLabv3+ formulation the
    reference's encoder already uses everywhere else; False reproduces
    the reference's full dilated convs."""

    filters: int = 728
    out_features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    norm: str = "batch"
    axis_name: str | None = None
    separable: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[-3], x.shape[-2]
        norm_args = dict(norm=self.norm, axis_name=self.axis_name, dtype=self.dtype)
        branches = [ConvBlock(self.filters, kernel=1, **norm_args)(x, train)]
        for rate in self.rates:
            if self.separable:
                branches.append(
                    SepConvBlock(self.filters, rate=rate, **norm_args)(x, train)
                )
                continue
            b = nn.Conv(
                self.filters,
                (3, 3),
                padding="SAME",
                kernel_dilation=(rate, rate),
                dtype=self.dtype,
            )(x)
            b = Norm(self.norm, self.axis_name, self.dtype)(b, train)
            branches.append(relu6(b))
        pooled = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        pooled = nn.Conv(self.filters, (1, 1), dtype=self.dtype)(pooled)
        pooled = jax.image.resize(
            pooled, (*pooled.shape[:-3], *size, pooled.shape[-1]), method="linear"
        )
        pooled = Norm(self.norm, self.axis_name, self.dtype)(pooled, train)
        branches.append(relu6(pooled))
        cat = jnp.concatenate(branches, axis=-1)
        return ConvBlock(self.out_features, kernel=1, **norm_args)(cat, train)


class XceptionMiddleBlock(nn.Module):
    """Three separable convs + identity residual (reference
    xception_middle_block, denoiser-multi-gpu.py:375-390)."""

    features: int
    norm: str = "batch"
    axis_name: str | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for _ in range(3):
            h = SepConvBlock(
                self.features, norm=self.norm, axis_name=self.axis_name,
                dtype=self.dtype,
            )(h, train)
        return h + x
