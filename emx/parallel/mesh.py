"""Device-mesh construction and sharding rules.

The TPU-native replacement for the reference's in-graph tower replication
and parameter-server placement (misc_py/denoiser-multi-gpu.py:603-631,
680-707): one `jax.sharding.Mesh`, batches sharded over the 'data' axis,
gradients averaged by XLA all-reduce over ICI, parameters replicated (or
FSDP-sharded over 'data' for the larger generators).

Axis conventions:
  data    — data parallelism (batch dimension)
  spatial — spatial context parallelism for big-micrograph halo convs
            (emx.parallel.halo)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int | None = None,
    spatial: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, spatial) mesh. Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // spatial
    if data * spatial != n:
        raise ValueError(f"mesh {data}x{spatial} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, ("data", "spatial"))


def make_mesh_for_batch(batch_size: int, spatial: int = 1,
                        devices: list | None = None) -> Mesh:
    """Largest 'data' axis that both divides `batch_size` and fits the
    device count — lets small debug batches run on big meshes."""
    import math

    devices = devices if devices is not None else jax.devices()
    n = len(devices) // spatial
    data = math.gcd(batch_size, n)
    return make_mesh(data=data, spatial=spatial, devices=devices[: data * spatial])


def batch_sharding(mesh: Mesh, spatial_dims: int = 0) -> NamedSharding:
    """Sharding for a batch array: batch dim over 'data' — and over 'dcn'
    too on pod meshes (emx.parallel.distributed.make_pod_mesh), so
    data parallelism spans slices: gradient all-reduces run over ICI
    within a slice first and only slice-partials cross DCN. Optionally
    the leading spatial (H) dim goes over 'spatial' for halo-parallel
    images."""
    batch_axes = tuple(a for a in ("dcn", "data") if a in mesh.axis_names)
    if not batch_axes:
        raise ValueError(f"mesh has no batch axis: {mesh.axis_names}")
    spec_batch = batch_axes if len(batch_axes) > 1 else batch_axes[0]
    if spatial_dims:
        return NamedSharding(mesh, P(spec_batch, "spatial"))
    return NamedSharding(mesh, P(spec_batch))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along the batch dim."""
    return jax.device_put(batch, batch_sharding(mesh))
