"""Round-4 tail dissection: who are the ~8% exitflag-0 lanes in the panda bench?

Runs the exact bench fleet configuration, then classifies every
non-converged lane at the final step:

* RESCUE-OVERFLOW: lane was bad but its shard had more bad lanes than
  rescue slots (visible now via FleetMetrics.rescue_overflow_fraction);
* SLOW-BUT-SOLVABLE: a re-solve with a generous budget (3x outer, 3x inner)
  converges from the same warm start -> capacity problem, not solver stall;
* NEAR-FEASIBLE: violation <= 10 * tol -> polishing problem;
* STUCK: generous re-solve still exitflag 0 -> genuine stall or infeasible
  scenario; report its violation/grad_norm/violation0_raw breakdown.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    batch = int(os.environ.get("DISSECT_BATCH", "4096"))
    steps = int(os.environ.get("DISSECT_STEPS", "20"))
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "config", "pandaMpc.yaml",
    )
    setup = load_setup(cfg_path)
    setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)
    mesh = make_mesh(devices=jax.devices())

    scenario = random_fleet_scenario(
        problem, batch, seed=0,
        goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 1.0)),
        obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
        reachable_goals=True,
    )
    runner = FleetRunner(problem, batch_size=batch, mesh=mesh)
    scen = runner.shard_scenario(scenario)
    state = runner.init_state(scen)
    for i in range(steps):
        state, metrics = runner.step(state, scen)
    jax.block_until_ready(metrics)
    print("fleet metrics after", steps, "steps:")
    for k, v in metrics._asdict().items():
        print(f"  {k}: {float(v):.6g}")

    # Per-lane final-step diagnosis: run the SAME solve the fleet ran
    # (phase-1 budget) once more from the current warm state, no donation.
    solve_p1 = jax.jit(jax.vmap(runner._solve))
    res = solve_p1(state.x, scen.params, state.z_warm, state.lam)
    jax.block_until_ready(res.exitflag)
    flag = np.asarray(res.exitflag)
    viol = np.asarray(res.violation)
    gn = np.asarray(res.grad_norm)
    it = np.asarray(res.iterations)
    v0 = np.asarray(res.violation0_raw)

    bad = flag != 1
    print(f"\nphase-1 only (no rescue): converged {np.mean(flag == 1):.4f}")
    print(f"bad lanes: {bad.sum()} / {batch}")
    if bad.sum() == 0:
        return
    print(f"  violation of bad lanes: p50={np.median(viol[bad]):.2e} "
          f"max={viol[bad].max():.2e}")
    print(f"  grad_norm of bad lanes: p50={np.median(gn[bad]):.2e} "
          f"max={gn[bad].max():.2e}")
    print(f"  raw stage-0 violation of bad lanes: p50={np.median(v0[bad]):.2e} "
          f"max={v0[bad].max():.2e}  (>0 => state-only constraint already "
          f"violated at the current state)")
    tol = problem.setup.solver.tol_constraint
    near = bad & (viol <= 10 * tol)
    print(f"  near-feasible (viol <= 10*tol): {near.sum()} of {bad.sum()}")

    # generous re-solve of ONLY the bad lanes, warm
    gen_cfg = dataclasses.replace(
        problem.setup.solver,
        max_al_iterations=3 * problem.setup.solver.max_al_iterations,
        max_ilqr_iterations=3 * problem.setup.solver.max_ilqr_iterations,
    )
    solve_gen = jax.jit(jax.vmap(problem.build_solver(gen_cfg)))
    idx = np.where(bad)[0]
    x_b = jnp.asarray(np.asarray(state.x)[idx])
    p_b = jnp.asarray(np.asarray(scen.params)[idx])
    z_b = jnp.asarray(np.asarray(state.z_warm)[idx])
    l_b = jnp.asarray(np.asarray(state.lam)[idx])
    res_g = solve_gen(x_b, p_b, z_b, l_b)
    jax.block_until_ready(res_g.exitflag)
    flag_g = np.asarray(res_g.exitflag)
    print(f"\ngenerous warm re-solve of bad lanes: "
          f"{np.mean(flag_g == 1):.4f} converge "
          f"({(flag_g == 1).sum()}/{len(idx)})")
    still = flag_g != 1
    if still.sum():
        vg = np.asarray(res_g.violation)[still]
        gg = np.asarray(res_g.grad_norm)[still]
        ig = np.asarray(res_g.iterations)[still]
        v0g = np.asarray(res_g.violation0_raw)[still]
        print(f"  STUCK lanes: {still.sum()}")
        print(f"    violation: p50={np.median(vg):.2e} max={vg.max():.2e}")
        print(f"    grad_norm: p50={np.median(gg):.2e} max={gg.max():.2e}")
        print(f"    iterations: p50={np.median(ig):.0f} max={ig.max()}")
        print(f"    raw v0: p50={np.median(v0g):.2e} max={v0g.max():.2e}")
        # cold restart of stuck lanes
        sidx = idx[still]
        xc = jnp.asarray(np.asarray(state.x)[sidx])
        zc = jnp.zeros_like(jnp.asarray(np.asarray(state.z_warm)[sidx]))
        zc = zc.at[:, :, : problem.dims.nx].set(xc[:, None, :])
        lc = jnp.zeros_like(jnp.asarray(np.asarray(state.lam)[sidx]))
        res_c = solve_gen(xc, jnp.asarray(np.asarray(scen.params)[sidx]), zc, lc)
        jax.block_until_ready(res_c.exitflag)
        fc = np.asarray(res_c.exitflag)
        print(f"  cold generous re-solve of stuck lanes: "
              f"{(fc == 1).sum()}/{still.sum()} converge")
        out = {
            "stuck_after_warm_generous": int(still.sum()),
            "stuck_after_cold_generous": int((fc != 1).sum()),
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
