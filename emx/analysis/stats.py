"""Analysis statistics: image entropy, Gram matrices, Gram histograms.

Rebuilds misc_py/entropy.py (Shannon entropy over intensity histograms)
and misc_py/img_stats.py + gram_hist.py (feature Gram matrices used to
characterise micrograph texture) as pure JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shannon_entropy(img: jax.Array, num_bins: int = 256) -> jax.Array:
    """Entropy (bits) of the intensity histogram (misc_py/entropy.py)."""
    img = img.astype(jnp.float32)
    lo = jnp.min(img)
    hi = jnp.max(img)
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((img - lo) / span * num_bins).astype(jnp.int32),
                   0, num_bins - 1)
    counts = jax.ops.segment_sum(
        jnp.ones(img.size), idx.reshape(-1), num_segments=num_bins
    )
    p = counts / img.size
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-12)), 0.0))


def gram_matrix(features: jax.Array, normalize: bool = True) -> jax.Array:
    """Gram matrix of a (H, W, C) feature map (misc_py/img_stats.py)."""
    h, w, c = features.shape
    flat = features.reshape(h * w, c)
    g = flat.T @ flat
    return g / (h * w * c) if normalize else g


def gram_histogram(features: jax.Array, num_bins: int = 100):
    """Histogram of Gram-matrix entries (misc_py/gram_hist.py)."""
    g = gram_matrix(features).reshape(-1)
    lo, hi = jnp.min(g), jnp.max(g)
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((g - lo) / span * num_bins).astype(jnp.int32),
                   0, num_bins - 1)
    counts = jax.ops.segment_sum(
        jnp.ones(g.size), idx, num_segments=num_bins
    )
    edges = lo + span * jnp.arange(num_bins + 1) / num_bins
    return counts, edges
