"""Multi-process (multi-host) initialization and data distribution.

The reference is strictly single-process (SURVEY §5: no MPI/NCCL/Gloo
anywhere); its only "distribution" is the offline-codegen/runtime process
split. The TPU-native scaling story is JAX's single-controller-per-process
SPMD: every host calls :func:`initialize` once, after which ``jax.devices()``
returns the GLOBAL device set, ``make_mesh()`` spans hosts, and the same
``FleetRunner`` code shards the scenario batch over all chips — XLA routes
in-slice reductions over ICI and cross-host traffic over DCN.

Environment-driven entry (for launchers that export rank info)::

    from robot_mpcs_tpu.parallel import distributed
    distributed.initialize()          # no-op on single process / TPU pods
                                      # with auto-detected coordination

Recognized variables (in precedence order; the standard JAX ones work too):

* ``ROBOT_MPCS_COORDINATOR`` (``host:port``), ``ROBOT_MPCS_NUM_PROCESSES``,
  ``ROBOT_MPCS_PROCESS_ID`` — explicit rendezvous, used by the 2-process
  CPU smoke test (``tests/test_distributed.py``);
* none — fall through to ``jax.distributed.initialize()``'s own
  auto-detection (TPU pod metadata, SLURM, etc.), skipped entirely when no
  cluster environment is detected.

Verified in CI by ``tests/test_distributed.py``: two OS processes, gloo CPU
collectives, a 2x2-device global mesh, one fleet step, identical metrics on
both ranks.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` from args or environment.

    Returns True if distributed mode was initialized, False if running
    single-process (no coordination info found — the common 1-host case).
    Safe to call multiple times (subsequent calls are no-ops).
    """
    if jax.distributed.is_initialized():
        return True  # already initialized

    coordinator_address = coordinator_address or os.environ.get(
        "ROBOT_MPCS_COORDINATOR"
    )
    if num_processes is None and "ROBOT_MPCS_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["ROBOT_MPCS_NUM_PROCESSES"])
    if process_id is None and "ROBOT_MPCS_PROCESS_ID" in os.environ:
        process_id = int(os.environ["ROBOT_MPCS_PROCESS_ID"])

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _barrier()
        return True

    # No explicit rendezvous: let JAX auto-detect managed environments
    # (TPU pod slices, SLURM, ...). Outside one, stay single-process.
    cluster_hints = ("TPU_WORKER_HOSTNAMES", "SLURM_JOB_ID", "COORDINATOR_ADDRESS")
    if any(h in os.environ for h in cluster_hints):
        jax.distributed.initialize()
        _barrier()
        return True
    return False


def _barrier() -> None:
    """Run one trivial global collective immediately after initialization.

    The communication backend's context (gloo on CPU, the TPU runtime's
    launch group otherwise) is established lazily at the FIRST collective
    dispatch, under a short rendezvous timeout (~30 s for gloo key
    exchange). If that first collective is the application's main program,
    rank skew from uneven compile times easily exceeds the timeout
    (observed: a persistent-cache hit on one rank vs a cold multi-minute
    compile on another). A barrier here pins context creation to process
    startup, where all ranks are within seconds of each other; subsequent
    heavyweight dispatches then reuse the established context and may skew
    freely.
    """
    try:
        if jax.process_count() <= 1:
            return
        mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("d",))
        sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("d"))
        arr = make_global_array(
            np.ones((len(jax.devices()),), np.float32), sh
        )
        out = jax.jit(
            lambda x: x.sum(),
            out_shardings=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            ),
        )(arr)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001 - best-effort warm-up, not load-bearing
        import warnings

        warnings.warn(f"post-init collective barrier failed: {e}", stacklevel=2)


def process_count() -> int:
    return jax.process_count()


def make_global_array(full, sharding) -> jax.Array:
    """Build a globally-sharded jax.Array from host data that every process
    holds IN FULL (replicated host data, e.g. a same-seed scenario), or
    reshard an existing (possibly global) jax.Array.

    Single-process this is a plain sharded device_put. Multi-process,
    ``device_put`` cannot target non-addressable devices, so: an existing
    jax.Array is resharded on device through a jitted identity (XLA moves
    the shards), and host data materializes only each process's addressable
    shards via ``make_array_from_callback`` (the callback receives global
    index tuples and slices the local copy).
    """
    if jax.process_count() == 1:
        return jax.device_put(full, sharding)
    if isinstance(full, jax.Array):
        if full.sharding == sharding:
            return full
        return jax.jit(lambda a: a, out_shardings=sharding)(full)
    full = np.asarray(full)
    return jax.make_array_from_callback(
        full.shape, sharding, lambda idx: full[idx]
    )
