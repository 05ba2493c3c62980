"""Multi-host topology: jax.distributed init + (dcn, ici) mesh construction.

The reference has no multi-node story at all — rayon shared memory is its
entire backend (SURVEY.md §5.8) — so this layer is TPU-native surface with
no Rust counterpart: process initialization for multi-host runs and the
standard two-level mesh (a slow DCN axis across hosts, a fast ICI axis
within a slice) that JAX collectives ride.

Data-parallel kernels (the sharded NTT/MSM) treat the two axes as one
flattened data axis — `PartitionSpec(("dcn", "ici"))` — with collectives
named over the tuple; XLA lowers the intra-host portion onto ICI and only
the cross-host residual onto DCN.  Single-process multi-device (including
the CPU-mesh test rig) is the degenerate case with a DCN axis of size 1+
local process count.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

DCN_AXIS = "dcn"
ICI_AXIS = "ici"
DATA_AXES = (DCN_AXIS, ICI_AXIS)


def init_distributed() -> bool:
    """Initialize jax.distributed from standard env (no-op single-process).

    Returns True when a multi-process runtime was initialized.  Reads the
    conventional JAX coordination variables (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); absent those, the process is
    treated as standalone.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )
    return True


def make_mesh(num_hosts: int | None = None, devices=None) -> Mesh:
    """(dcn, ici) mesh over all devices.

    `num_hosts` overrides the DCN extent (it must divide the device count);
    by default it is jax.process_count() — 1 in single-process runs, so the
    whole mesh is one ICI slice.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    hosts = num_hosts if num_hosts is not None else jax.process_count()
    assert devs.size % hosts == 0, f"{devs.size} devices over {hosts} hosts"
    return Mesh(devs.reshape(hosts, devs.size // hosts), DATA_AXES)


def axis_size(mesh: Mesh, axis) -> int:
    """Extent of a (possibly tuple) mesh axis."""
    if isinstance(axis, (tuple, list)):
        out = 1
        for a in axis:
            out *= mesh.shape[a]
        return out
    return mesh.shape[axis]


def axis_flat_index(axis):
    """Flattened device index along a (possibly tuple) data axis — usable
    inside shard_map (row-major over the tuple's axes, matching how a
    tuple axis shards an array)."""
    import jax

    if isinstance(axis, (tuple, list)):
        idx = jax.lax.axis_index(axis[0])
        for a in axis[1:]:
            idx = idx * jax.lax.axis_size(a) + jax.lax.axis_index(a)
        return idx
    return jax.lax.axis_index(axis)
