"""Round-4 sweep: rescue-tier cascades + stall recovery vs throughput.

Goal (VERDICT r3 item 3): converged_fraction >= 0.97 at
max_violation(converged) <= 1e-4 without dropping below ~7500 solves/s/chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

BATCH = int(os.environ.get("SWEEP_BATCH", "4096"))
STEPS = int(os.environ.get("SWEEP_STEPS", "20"))

CONFIGS = {
    # round 1 of the sweep (results in PROFILE.md): tier budget binds, not
    # capacity; stall_reset_after=3 recycles slow lanes into scarce rescue
    # slots and HURTS (0.886 vs 0.919)
    "baseline_r3_nostall": dict(rescue_tiers=[(8, 4, 8)], stall_reset_after=0),
    "baseline_r3_stall3": dict(rescue_tiers=[(8, 4, 8)], stall_reset_after=3),
    "tier_rich": dict(rescue_tiers=[(8, 6, 12)], stall_reset_after=3),
    "tier_wide": dict(rescue_tiers=[(4, 4, 8)], stall_reset_after=3),
    "cascade_a": dict(rescue_tiers=[(8, 4, 8), (32, 8, 16)], stall_reset_after=3),
    "cascade_b": dict(rescue_tiers=[(8, 4, 8), (64, 12, 16)], stall_reset_after=3),
    # round 2: backtracking line search inside the rescue tier (the parity
    # accuracy config converges these problems reliably with ls=8; merit
    # sweeps at B/8 width are cheap)
    "ls_a": dict(rescue_tiers=[(8, 4, 8, 8)], stall_reset_after=0),
    "ls_b": dict(rescue_tiers=[(8, 6, 12, 8)], stall_reset_after=0),
    "ls_c": dict(rescue_tiers=[(8, 8, 16, 8)], stall_reset_after=0),
}


def main():
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "config", "pandaMpc.yaml",
    )
    setup = load_setup(cfg_path)
    setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)
    mesh = make_mesh(devices=jax.devices())
    scenario_raw = random_fleet_scenario(
        problem, BATCH, seed=0,
        goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 1.0)),
        obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
        reachable_goals=True,
    )
    only = os.environ.get("SWEEP_ONLY")
    for name, kw in CONFIGS.items():
        if only and name != only:
            continue
        runner = FleetRunner(problem, batch_size=BATCH, mesh=mesh, **kw)
        scen = runner.shard_scenario(scenario_raw)
        state = runner.init_state(scen)
        for _ in range(3):
            state, metrics = runner.step(state, scen)
        jax.block_until_ready(metrics)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = runner.step(state, scen)
        jax.block_until_ready(metrics)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "config": name,
            "solves_per_s": round(BATCH * STEPS / dt, 1),
            "converged": round(float(metrics.converged_fraction), 4),
            "viol_conv": float(metrics.max_violation_converged),
            "viol_unconv": float(metrics.max_violation_unconverged),
            "overflow": round(float(metrics.rescue_overflow_fraction), 4),
            "mean_iter": round(float(metrics.mean_iterations), 2),
            "step_ms": round(1000 * dt / STEPS, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
