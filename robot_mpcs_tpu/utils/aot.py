"""Ahead-of-time exported solver programs inside the artifact directory.

This is the true analog of the reference's ForcesPro solver directory: the
reference's ``generate_solver`` emits a compiled native solver next to
``paramMap.yaml`` (reference ``robotmpcs/models/mpcModel.py:128-141``), and
its planner loads it back without recompiling
(``mpcPlanner.py:73`` ``Solver.from_directory``). Here the offline step
serializes the traced-and-lowered XLA program (``jax.export``) of the
B=1-vmapped planner solve into the artifact directory; a fresh process
deserializes it and skips Python tracing entirely (the remaining XLA
compile is served by the persistent compilation cache, making the
cold-process path load-only).

The exported blob embeds the solver's entire problem structure — FK chain,
constraint stack, iteration schedule — so the loader verifies an ABI
fingerprint (shapes + jax version + backend platform) and silently falls
back to a fresh ``jax.jit`` trace on any mismatch: the export is an
accelerator, never a correctness dependency.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import yaml

#: artifact-relative filename of the exported B=1 planner program
PLANNER_EXPORT = "planner_solve_b1.jaxexport"
EXPORT_META = "export_meta.yaml"
#: artifact-relative filenames of the exported fleet step
FLEET_EXPORT = "fleet_step.jaxexport"
FLEET_META = "fleet_meta.yaml"

_registered = False


def _register_serializations() -> None:
    """Register NamedTuple result types with jax.export (idempotent)."""
    global _registered
    if _registered:
        return
    from jax import export as jexport

    from robot_mpcs_tpu.parallel.fleet import (
        FleetMetrics,
        FleetScenario,
        FleetState,
    )
    from robot_mpcs_tpu.solver.types import SolveResult

    for cls, name in (
        (SolveResult, "robot_mpcs_tpu.SolveResult"),
        (FleetState, "robot_mpcs_tpu.FleetState"),
        (FleetScenario, "robot_mpcs_tpu.FleetScenario"),
        (FleetMetrics, "robot_mpcs_tpu.FleetMetrics"),
    ):
        try:
            jexport.register_namedtuple_serialization(cls, serialized_name=name)
        except ValueError:
            pass  # already registered under this name
    _registered = True


def _abi_fingerprint(problem, batch: int) -> dict:
    d = problem.dims
    return {
        "jax_version": jax.__version__,
        "platform": jax.default_backend(),
        "batch": int(batch),
        "nx": int(d.nx),
        "nz": int(d.nz),
        "N": int(d.N),
        "npar": int(problem.npar),
        "n_con": int(problem.n_con),
        "solver_name": problem.solver_name,
    }


def _example_args(problem, batch: int):
    d = problem.dims
    return (
        jnp.zeros((batch, d.nx), jnp.float32),
        jnp.zeros((batch, d.N, problem.npar), jnp.float32),
        jnp.zeros((batch, d.N, d.nz), jnp.float32),
        jnp.zeros((batch, d.N, problem.n_con), jnp.float32),
    )


def export_planner_solve(problem, path: str, batch: int = 1) -> Optional[str]:
    """Serialize the jitted B=``batch`` vmapped solve into ``path``.

    Returns the written file path, or None if export failed (the artifact
    stays valid — the runtime falls back to jit).
    """
    from jax import export as jexport

    _register_serializations()
    try:
        solve = problem.build_solver()
        exported = jexport.export(jax.jit(jax.vmap(solve)))(
            *_example_args(problem, batch)
        )
        blob = exported.serialize()
    except Exception as e:  # noqa: BLE001 - export is best-effort
        import warnings

        warnings.warn(f"AOT export failed ({e}); artifact will jit at load",
                      stacklevel=2)
        return None
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, PLANNER_EXPORT)
    with open(out, "wb") as f:
        f.write(blob)
    with open(os.path.join(path, EXPORT_META), "w") as f:
        yaml.dump(_abi_fingerprint(problem, batch), f)
    return out


def load_planner_solve(problem, path: str, batch: int = 1) -> Optional[Callable]:
    """Load the exported B=``batch`` solve from an artifact directory.

    Returns a callable with the solve signature, or None when the artifact
    has no (compatible) export — the caller then jits normally.
    """
    blob_path = os.path.join(path, PLANNER_EXPORT)
    meta_path = os.path.join(path, EXPORT_META)
    if not (os.path.isfile(blob_path) and os.path.isfile(meta_path)):
        return None
    try:
        with open(meta_path) as f:
            meta = yaml.safe_load(f)
        if meta != _abi_fingerprint(problem, batch):
            return None
        from jax import export as jexport

        _register_serializations()
        with open(blob_path, "rb") as f:
            exported = jexport.deserialize(f.read())
        call = jax.jit(exported.call)

        def solve_exported(xinit, params, z0, lam0):
            return call(
                jnp.asarray(xinit, jnp.float32),
                jnp.asarray(params, jnp.float32),
                jnp.asarray(z0, jnp.float32),
                jnp.asarray(lam0, jnp.float32),
            )

        return solve_exported
    except Exception as e:  # noqa: BLE001 - never fail construction over this
        import warnings

        warnings.warn(
            f"ignoring unreadable AOT export at {blob_path} ({e})", stacklevel=2
        )
        return None


# ------------------------------------------------------------- fleet step


def _fleet_fingerprint(runner) -> dict:
    return {
        **_abi_fingerprint(runner.problem, runner.batch),
        "n_devices": int(runner.mesh.devices.size),
        "tiers": [list(t) for t in runner._tier_spec],
        "stall_reset_after": int(runner._stall_reset_after),
        "kick": [
            int(runner._kick_after),
            float(runner._kick_gdist),
            float(runner._kick_scale),
        ],
    }


def export_fleet_step(runner, path: str) -> Optional[str]:
    """Serialize the runner's full jitted fleet step (batched phase-1 solve
    + rescue tiers + plant integration + warm-start shift + metric
    reductions) into ``path``. The fingerprint pins batch size, mesh width,
    tier schedule, and recovery knobs."""
    from jax import export as jexport

    _register_serializations()
    try:
        scenario = _example_fleet_args(runner)
        state = runner.init_state(scenario)
        exported = jexport.export(runner._fleet_step)(state, scenario)
        blob = exported.serialize()
    except Exception as e:  # noqa: BLE001 - export is best-effort
        import warnings

        warnings.warn(
            f"fleet AOT export failed ({e}); runner will jit at load",
            stacklevel=2,
        )
        return None
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, FLEET_EXPORT)
    with open(out, "wb") as f:
        f.write(blob)
    with open(os.path.join(path, FLEET_META), "w") as f:
        yaml.dump(_fleet_fingerprint(runner), f)
    return out


def _example_fleet_args(runner):
    from robot_mpcs_tpu.parallel.fleet import FleetScenario
    from robot_mpcs_tpu.parallel.mesh import shard_batch

    d = runner.dims
    B = runner.batch
    return shard_batch(
        runner.mesh,
        FleetScenario(
            xinit=jnp.zeros((B, d.nx), jnp.float32),
            params=jnp.zeros((B, d.N, runner.problem.npar), jnp.float32),
        ),
    )


def load_fleet_step(runner, path: str) -> Optional[Callable]:
    """Load a compatible exported fleet step for ``runner``, or None."""
    blob_path = os.path.join(path, FLEET_EXPORT)
    meta_path = os.path.join(path, FLEET_META)
    if not (os.path.isfile(blob_path) and os.path.isfile(meta_path)):
        return None
    try:
        with open(meta_path) as f:
            if yaml.safe_load(f) != _fleet_fingerprint(runner):
                return None
        from jax import export as jexport

        _register_serializations()
        with open(blob_path, "rb") as f:
            exported = jexport.deserialize(f.read())
        return jax.jit(exported.call, donate_argnums=(0,))
    except Exception as e:  # noqa: BLE001
        import warnings

        warnings.warn(
            f"ignoring unreadable fleet AOT export at {blob_path} ({e})",
            stacklevel=2,
        )
        return None
