"""Device mesh + shardings: the framework's "communication backend".

The reference's only parallelism is single-process nn.DataParallel
scatter/gather over the ray batch (/root/reference/run.py:2146,2158;
SURVEY.md §2.3). The TPU-native equivalent: one `jax.sharding.Mesh` with a
``data`` axis over ICI; ray batches and diffusion batches are sharded on
their leading axis, params are replicated, and the gradient all-reduce is
inserted by XLA from the shardings — no explicit collectives.

Multi-host later extends the same mesh over DCN; nothing else changes.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(dcn: int, ici: int = 0,
                 axes: tuple = ("dcn", "data")) -> Mesh:
    """Hierarchical multi-host mesh: outer ``dcn`` axis (hosts, data-center
    network) × inner ``data`` axis (chips per host, ICI).

    Ray/diffusion batches shard over BOTH axes (spec ``P(axes)``), so the
    gradient all-reduce XLA inserts becomes a two-stage reduction: intra-host
    over ICI, then one inter-host hop over DCN — the standard hierarchical
    layout from the scaling playbook. Params stay replicated; nothing else
    in the step changes (pass ``axis=axes`` to make_sharded_train_step).
    """
    devs = jax.devices()
    if not ici:
        ici = len(devs) // dcn
    devs = np.asarray(devs[:dcn * ici]).reshape(dcn, ici)
    return Mesh(devs, axes)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray/batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of [N, ...] arrays with the leading axis sharded."""
    s = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m


def constrain_data(x, mesh: Optional[Mesh], axis: str = "data"):
    """In-jit sharding constraint on the leading axis (no-op without mesh)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(axis)))
