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

_registered = False


def _register_serializations() -> None:
    """Register NamedTuple result types with jax.export (idempotent)."""
    global _registered
    if _registered:
        return
    from jax import export as jexport

    from robot_mpcs_tpu.solver.types import SolveResult

    try:
        jexport.register_namedtuple_serialization(
            SolveResult, serialized_name="robot_mpcs_tpu.SolveResult"
        )
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
