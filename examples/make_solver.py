"""Offline solver-artifact generation CLI (reference ``examples/makeSolver.py``).

Usage: python make_solver.py config/<robot>Mpc.yaml [output_dir]

Builds the MPC problem from the config, persists the solver artifact
directory (paramMap.yaml / properties.yaml / setup.yaml — the same files the
reference writes next to its ForcesPro solver, ``mpcModel.py:132-141``) and
ahead-of-time compiles the jitted solve for the current backend to warm the
XLA compilation cache.
"""

import os
import re
import sys
import time


def main(setup_file: str, location: str = "./solvers/") -> int:
    from robot_mpcs_tpu.config import load_setup
    from robot_mpcs_tpu.models.problem import MpcProblem

    setup = load_setup(setup_file)
    problem = MpcProblem(setup)
    os.makedirs(location, exist_ok=True)
    path = problem.generate_solver(location)
    print(f"solver artifact written to {path}")

    import jax
    import jax.numpy as jnp

    # warm-compile the B=1 vmapped form — the same program MPCPlanner's
    # hot path runs (the fully-unbatched graph stalls the TPU compiler's
    # layout pass; see planner/mpc_planner.py)
    solve = jax.jit(jax.vmap(problem.build_solver()))
    dims = problem.dims
    t0 = time.perf_counter()
    res = solve(
        jnp.zeros((1, dims.nx)),
        jnp.zeros((1, dims.N, problem.npar)),
        jnp.zeros((1, dims.N, dims.nz)),
        jnp.zeros((1, dims.N, problem.n_con)),
    )
    jax.block_until_ready(res)
    print(f"solver compiled for {jax.devices()[0].platform} "
          f"in {time.perf_counter() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    robot_type_match = re.search(r"([a-zA-Z]+)Mpc", sys.argv[1])
    if robot_type_match:
        print(f"robot type: {robot_type_match.group(1)}")
    sys.exit(main(sys.argv[1], *(sys.argv[2:3] or ["./solvers/"])))
