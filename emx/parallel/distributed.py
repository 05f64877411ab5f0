"""Multi-host initialisation and cross-slice data parallelism.

The reference has no multi-node backend at all (SURVEY.md §2.4 — its
"distributed harvest" is ten copy-pasted MATLAB scripts). Here:

  * `initialize()` wraps jax.distributed.initialize for multi-host TPU
    pods (coordinator discovery via env or explicit args).
  * `make_pod_mesh()` builds a (dcn_data, ici_data, spatial) mesh whose
    inner axes map onto ICI within a slice and the outer axis onto DCN
    across slices, so gradient all-reduces ride ICI first and only the
    slice-level partial results cross DCN
    (jax.experimental.mesh_utils.create_hybrid_device_mesh).
  * `host_batch_slice()` computes which examples this host should load —
    the loader-side contract for jax.make_array_from_process_local_data.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialise multi-host JAX. No-ops when single-process (the common
    dev path) or when already initialised."""
    if num_processes in (None, 1) and "JAX_NUM_PROCESSES" not in os.environ \
            and coordinator_address is None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialised
        if "already" not in str(e).lower():
            raise


def make_pod_mesh(
    dcn_data: int | None = None,
    spatial: int = 1,
) -> Mesh:
    """Mesh over all pod devices: ('dcn', 'data', 'spatial') with 'dcn'
    spanning slices (DCN) and 'data' x 'spatial' within a slice (ICI)."""
    from jax.experimental import mesh_utils

    n_slices = dcn_data if dcn_data is not None else max(
        1, jax.process_count()
    )
    per_slice = jax.device_count() // n_slices
    if n_slices == 1 or jax.process_count() == 1:
        # Single process (or single slice): plain reshape — hybrid mesh
        # construction needs real process boundaries to place 'dcn' on.
        devices = np.asarray(jax.devices()).reshape(
            n_slices, per_slice // spatial, spatial
        )
    else:
        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, per_slice // spatial, spatial),
                dcn_mesh_shape=(n_slices, 1, 1),
            )
        except ValueError:
            # Devices without slice_index (e.g. multi-process CPU in
            # tests): group by process so 'dcn' spans process boundaries.
            devs = sorted(
                jax.devices(),
                # Explicit None check: slice_index == 0 is a valid slice,
                # not a missing attribute (ADVICE r2).
                key=lambda d: (
                    d.slice_index
                    if getattr(d, "slice_index", None) is not None
                    else d.process_index,
                    d.id,
                ),
            )
            devices = np.asarray(devs).reshape(
                n_slices, per_slice // spatial, spatial
            )
    return Mesh(devices, ("dcn", "data", "spatial"))


def host_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's share of the global batch."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return start, per_host
