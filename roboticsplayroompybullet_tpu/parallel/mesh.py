"""Device-mesh construction + sharding helpers.

The reference is single-process, single-physics-client (SURVEY.md §2.3;
reference environments.py:54-57 "currently only supports one instance").
Its latent multi-instance hook — the per-instance `offset`
(environments.py:456-466) — inverts on TPU into real data parallelism:
env/rollout batches are sharded over a `jax.sharding.Mesh` and reduced
with XLA collectives over ICI (within a slice) and DCN (across slices).

Mesh convention:
  * 1-D mesh, axis "env"  — single-host: batch dim sharded over all chips.
  * 2-D mesh, axes ("dcn", "env") — multi-host: outer axis maps across
    hosts/slices (DCN), inner axis across the chips of one host (ICI).
    Batch dims shard over BOTH axes; collectives that only need
    intra-host traffic name just "env".
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"
DCN_AXIS = "dcn"


def make_mesh(n_devices: Optional[int] = None,
              n_hosts: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build the framework's standard mesh.

    n_hosts > 1 (or a non-trivial factorization request) yields the 2-D
    ("dcn", "env") mesh; otherwise a 1-D ("env",) mesh over all local
    devices. On a real pod, `jax.distributed.initialize` must have run
    first so `jax.devices()` is global.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devices = np.asarray(devices)
    if n_hosts > 1:
        assert devices.size % n_hosts == 0, (
            f"{devices.size} devices not divisible by {n_hosts} hosts")
        grid = devices.reshape(n_hosts, devices.size // n_hosts)
        return Mesh(grid, (DCN_AXIS, ENV_AXIS))
    return Mesh(devices, (ENV_AXIS,))


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding a leading batch dim over every mesh axis."""
    return P(mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(mesh))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    return jax.device_put(tree, batch_sharding(mesh))


def mesh_size(mesh: Mesh) -> int:
    return int(np.prod(list(mesh.shape.values())))
