"""Profile MLP over the image-statistics compendium.

Rebuild of reference misc_py/profiles.py:1-211 (+ profiles_miner.py,
profile_trainvaltest_split.py): a small MLP over the per-image statistic
vector (emx.physics.image_stats), with feature equalisation by the
empirical-CDF redistributors (emx.analysis.pearson.moment_redistributor).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ProfileMLPConfig:
    hidden: tuple[int, ...] = (256, 256, 128)
    out_dim: int = 1
    dropout: float = 0.1
    dtype: Any = jnp.float32


class ProfileMLP(nn.Module):
    config: ProfileMLPConfig = ProfileMLPConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        h = x.astype(cfg.dtype)
        for f in cfg.hidden:
            h = nn.Dense(f, dtype=cfg.dtype)(h)
            h = nn.relu(h)
            if cfg.dropout and train:
                h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        return nn.Dense(cfg.out_dim, dtype=cfg.dtype)(h).astype(jnp.float32)


def stats_to_feature_vector(stats: dict[str, jax.Array]) -> jax.Array:
    """Flatten an emx.physics.image_stats dict to a fixed-order vector."""
    from emx.physics.stats import STAT_NAMES

    return jnp.stack([jnp.asarray(stats[k], jnp.float32) for k in STAT_NAMES],
                     axis=-1)


class FeatureEqualizer:
    """Per-feature empirical-CDF equalisation (profiles_miner.py)."""

    def __init__(self, feature_matrix: np.ndarray, num_bins: int = 100):
        from emx.analysis.pearson import moment_redistributor

        self.redistributors = [
            moment_redistributor(feature_matrix[:, i], num_bins)
            for i in range(feature_matrix.shape[1])
        ]

    def __call__(self, features: np.ndarray) -> np.ndarray:
        features = np.atleast_2d(np.asarray(features, np.float64))
        cols = [
            r["transform"](features[:, i])
            for i, r in enumerate(self.redistributors)
        ]
        return np.stack(cols, axis=1).astype(np.float32)
