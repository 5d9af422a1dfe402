"""Checkpoint / resume for long-running fleet rollouts.

The reference has no checkpointing at all (SURVEY §5: its nearest analogs are
the persisted solver artifact, reference ``robotmpcs/models/mpcModel.py:132-141``,
and the warm-start state ``self._x0`` / ``self.output`` carried across steps,
reference ``robotmpcs/planner/mpcPlanner.py:215-236``). For a production fleet
the device-resident :class:`~robot_mpcs_tpu.parallel.fleet.FleetState` (plant
state, warm-start trajectories, AL multipliers, step counter) IS the job
state — losing it on preemption forfeits the warm starts and every scenario's
progress. This module persists that state atomically and restores it with the
correct mesh sharding.

Design notes (TPU-first):

* Save path gathers shards to host with ``jax.device_get`` — one transfer per
  leaf, off the hot loop — and writes a single ``.npz`` via an atomic
  ``os.replace`` so a preemption mid-write never leaves a torn checkpoint.
* Restore re-shards onto the caller's mesh, so a checkpoint taken on one
  topology (e.g. 16 chips) resumes on another (e.g. 8) as long as the batch
  divides the device count.
* No orbax dependency: fleet state is a flat NamedTuple of dense arrays, and
  a stdlib-only format keeps restore possible anywhere numpy exists.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

#: v2 adds the per-lane ``stall`` counter (fleet stall-recovery state);
#: v1 checkpoints load with ``stall`` reset to zeros (safe: the counter is
#: a heuristic that re-accumulates within a few steps).
_FORMAT_VERSION = 2


def save_fleet_state(path: str, state, extra: Optional[dict] = None) -> None:
    """Write ``state`` to ``path`` (.npz) atomically.

    ``extra`` is an optional JSON-serializable dict (e.g. scenario seed,
    config digest) stored alongside the arrays for provenance checks at
    restore time.
    """
    host = jax.device_get(state)
    x, z_warm, lam = np.asarray(host.x), np.asarray(host.z_warm), np.asarray(host.lam)
    meta = {
        "version": _FORMAT_VERSION,
        # problem-shape provenance, validated at load time: restoring a
        # checkpoint from a different problem class must fail with a clear
        # error instead of an opaque jit shape error at the first step
        "dims": {
            "batch": int(x.shape[0]),
            "nx": int(x.shape[1]),
            "N": int(z_warm.shape[1]),
            "nz": int(z_warm.shape[2]),
            "n_con": int(lam.shape[2]),
        },
        "extra": extra or {},
    }
    payload = {
        "x": x,
        "z_warm": z_warm,
        "lam": lam,
        "step": np.asarray(host.step),
        "stall": np.asarray(host.stall),
        "best_gdist": np.asarray(host.best_gdist),
        "no_improve": np.asarray(host.no_improve),
        "meta": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    }
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
            # flush through to stable storage BEFORE the rename: os.replace
            # is atomic against process death, but a machine-level crash can
            # still tear an unsynced file over the previous good checkpoint
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        # fsync the directory so the rename itself is durable
        dfd = os.open(directory, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_fleet_state(path: str, mesh=None, problem=None, batch_size=None):
    """Load a fleet checkpoint; returns ``(state, extra)``.

    With ``mesh`` given, batched leaves are device-put sharded on the batch
    axis (the checkpoint's original topology is irrelevant — only
    ``batch % mesh size == 0`` must hold). Without a mesh the state stays on
    the default device, which is what single-chip tests want.

    With ``problem`` (an :class:`MpcProblem`) and/or ``batch_size`` given,
    the checkpoint's recorded shape provenance is validated against the
    target problem and a clear ``ValueError`` is raised on mismatch.
    """
    # imported here, not at module scope: utils is imported by the model
    # layer, which parallel.fleet builds on (avoids a circular import)
    from robot_mpcs_tpu.parallel.fleet import FleetState
    from robot_mpcs_tpu.parallel.mesh import shard_batch

    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        if meta.get("version") not in (1, _FORMAT_VERSION):
            raise ValueError(
                f"unsupported fleet checkpoint version {meta.get('version')!r}"
            )
        x = jnp.asarray(data["x"])
        z_warm = jnp.asarray(data["z_warm"])
        lam = jnp.asarray(data["lam"])
        step = jnp.asarray(data["step"])
        stall = (
            jnp.asarray(data["stall"])
            if "stall" in data
            else jnp.zeros((x.shape[0],), jnp.int32)
        )
        # escape-bookkeeping fields absent in pre-r5 checkpoints: neutral
        # defaults (never-improved-from-infinity, zero plateau counter)
        best_gdist = (
            jnp.asarray(data["best_gdist"])
            if "best_gdist" in data
            else jnp.full((x.shape[0],), jnp.inf, jnp.float32)
        )
        no_improve = (
            jnp.asarray(data["no_improve"])
            if "no_improve" in data
            else jnp.zeros((x.shape[0],), jnp.int32)
        )
    dims_meta = meta.get("dims")
    if dims_meta is not None and (problem is not None or batch_size is not None):
        expect = {}
        if problem is not None:
            d = problem.dims
            expect.update(nx=d.nx, N=d.N, nz=d.nz, n_con=problem.n_con)
        if batch_size is not None:
            expect["batch"] = int(batch_size)
        bad = {
            k: (dims_meta.get(k), v) for k, v in expect.items()
            if dims_meta.get(k) != v
        }
        if bad:
            raise ValueError(
                "fleet checkpoint shape mismatch (checkpoint vs target): "
                + ", ".join(f"{k}: {a} vs {b}" for k, (a, b) in bad.items())
            )
    if mesh is not None:
        sharded = shard_batch(
            mesh,
            {
                "x": x, "z_warm": z_warm, "lam": lam, "stall": stall,
                "best_gdist": best_gdist, "no_improve": no_improve,
            },
        )
        state = FleetState(step=step, **sharded)
    else:
        state = FleetState(
            x=x, z_warm=z_warm, lam=lam, step=step, stall=stall,
            best_gdist=best_gdist, no_improve=no_improve,
        )
    return state, meta["extra"]
