"""Device-mesh utilities: scenario-batch sharding over TPU chips.

The scaling axis of this framework is the scenario batch (SURVEY §2: the
reference is strictly single-scenario, one C solve per control step,
reference ``robotmpcs/planner/mpcPlanner.py:240-288``). Solves are
embarrassingly parallel across scenarios, so the canonical layout is a 1-D
``('batch',)`` mesh with every batched array sharded on its leading axis;
XLA inserts ICI collectives only for the scalar metric reductions
(converged counts, mean cost) emitted by the fleet step.

Multi-host: after ``parallel.distributed.initialize()`` the same code uses
the global device set — ``make_mesh`` takes all addressable+remote devices
and the batch axis spans hosts over DCN. Exercised end-to-end by the
2-process CPU-mesh smoke test in ``tests/test_distributed.py`` (gloo
collectives, one fleet step, rank-identical metrics).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_name: str = "batch", devices: Optional[Sequence] = None
) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "batch") -> NamedSharding:
    """Sharding that splits the leading (scenario) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "batch"):
    """Device-put a pytree of [B, ...] arrays sharded on the batch axis.

    Works on a multi-host mesh too: each [B, ...] leaf is expected to be
    host-replicated (every process built the same array, e.g. from a shared
    seed); non-addressable shards are skipped per process (see
    ``distributed.make_global_array``).
    """
    from robot_mpcs_tpu.parallel.distributed import make_global_array

    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: make_global_array(x, sharding), tree
    )


def pad_batch_to_mesh(batch_size: int, mesh: Mesh, axis_name: str = "batch") -> int:
    """Round a batch size up to a multiple of the mesh axis size."""
    n = mesh.shape[axis_name]
    return ((batch_size + n - 1) // n) * n
