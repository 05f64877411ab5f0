"""Spatial context parallelism: process ONE huge micrograph across the
mesh by sharding its rows, exchanging halo strips over ICI.

The reference scales image extent by host-side overlapped tiling
(machine_learning/denoiser.py:653-682). The TPU-native equivalent
(SURVEY.md §5 "long-context" analog — the 2-D image counterpart of
ring/context parallelism): shard the H axis of the image over the
'spatial' mesh axis, `jax.lax.ppermute` edge strips to neighbours so each
shard computes with full context, then crop the halo. Exact whenever the
model's receptive-field radius <= halo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def exchange_halo(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Inside shard_map: prepend/append `halo` rows from the previous/next
    shard along axis 0 (edge shards reflect-pad instead). x: (h, w)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_strip = x[:halo]     # my top rows -> successor's bottom halo
    bot_strip = x[-halo:]    # my bottom rows -> predecessor's top halo

    # Shift strips around the (non-wrapping) chain.
    from_prev = jax.lax.ppermute(
        bot_strip, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_next = jax.lax.ppermute(
        top_strip, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    # Edge shards have no neighbour: reflect own rows (matches the
    # behaviour of SAME padding closely enough for restoration nets).
    reflect_top = x[1 : halo + 1][::-1]
    reflect_bot = x[-halo - 1 : -1][::-1]
    top = jnp.where(idx == 0, reflect_top, from_prev)
    bot = jnp.where(idx == n - 1, reflect_bot, from_next)
    return jnp.concatenate([top, x, bot], axis=0)


def spatial_apply(
    apply_fn,
    img: jax.Array,
    mesh: Mesh,
    halo: int = 64,
    axis_name: str = "spatial",
    grid: int = 1,
):
    """Apply `apply_fn((h, w) -> (h, w))` to a huge image sharded over
    `axis_name`.

    `halo` should cover the model's effective receptive-field radius
    (DenoiserConfig.receptive_field_radius() is the hard upper bound;
    the reference's 80 px tiling overlap is the practical anchor).

    `grid` is the model's alignment unit (DenoiserConfig.halo_grid():
    space_to_depth x total stride). The halo is rounded UP to a multiple
    of it so every shard's strided-conv grid coincides with the global
    grid, and the image height is reflect-padded up to a multiple of
    n x grid — arbitrary heights work, not just exact divisors.
    """
    n = mesh.shape[axis_name]
    h = img.shape[0]
    if grid > 1:
        halo = -(-halo // grid) * grid
    unit = n * max(1, grid)
    h_pad = -(-h // unit) * unit
    pad = h_pad - h
    if pad:
        if pad > h:
            raise ValueError(
                f"image height {h} too small for {n}x{grid} padding unit")
        img = jnp.concatenate([img, img[h - pad:][::-1]], axis=0)
    if halo >= h_pad // n:
        raise ValueError(
            f"halo {halo} must be smaller than the shard height "
            f"{h_pad // n} — use fewer spatial shards or a bigger image")

    from jax.experimental.shard_map import shard_map

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(axis_name, None),
    )
    def run(shard):
        padded = exchange_halo(shard, halo, axis_name)
        out = apply_fn(padded)
        return out[halo:-halo]

    out = run(img)
    return out[:h] if pad else out


def spatial_sharded_image(img, mesh: Mesh, axis_name: str = "spatial"):
    """Place a big image on the mesh sharded by rows."""
    return jax.device_put(img, NamedSharding(mesh, P(axis_name, None)))


def halo_denoise(
    model,
    variables,
    img: jax.Array,
    mesh: Mesh,
    halo: int | None = None,
    axis_name: str = "spatial",
):
    """Denoise ONE huge micrograph across the mesh — the multi-chip
    serving path for images too large for a single device (the TPU-native
    replacement for host-side tiling, SURVEY.md §5 long-context analog).

    Wires the Denoiser's own geometry in: the halo defaults to the
    reference's 80 px tiling overlap and both the halo and the shard
    heights are aligned to model.config.halo_grid() by spatial_apply, so
    any s2d / any image height works. Validated against TiledApplier in
    tests/test_parallel_ops.py."""
    cfg = model.config
    grid = cfg.halo_grid()
    if halo is None:
        halo = max(80, grid)

    def apply_fn(x):
        return model.apply(variables, x[None], train=False)[0]

    return spatial_apply(apply_fn, img, mesh, halo=halo,
                         axis_name=axis_name, grid=grid)
