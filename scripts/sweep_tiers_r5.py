"""Round-5 sweep: quality/throughput frontier refinement.

Round-5 first pass (sweep_tiers_r4 on v5e): base (8,4,8) = 77.2k solves/s
@ converged 0.907; lsb (8,6,12,8) = 45.9k @ 0.982; wide_deep (4,6,12,8) =
33.4k @ 0.9954 overflow 0. Target: >= 0.95 converged (VERDICT r4 item 4)
at the highest throughput — probe between lsb and wide_deep.
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
    # wide capacity (zero overflow) with lsb's budget but cheaper search
    "w4_b612_ls6": dict(rescue_tiers=[(4, 6, 12, 6)]),
    # capacity between lsb (1/8) and wide (1/4)
    "w6_b612_ls8": dict(rescue_tiers=[(6, 6, 12, 8)]),
    # wide + shallower budget
    "w4_b510_ls8": dict(rescue_tiers=[(4, 5, 10, 8)]),
    # cheaper phase 1 (1 AL pass) + wide deep rescue
    "p1_wide_deep": dict(rescue_tiers=[(4, 6, 12, 8)], phase1_al_iterations=1),
    # round-2 probes: shave the rescue budget below lsb (8,6,12,8) = 45.9k
    "w8_b510_ls4": dict(rescue_tiers=[(8, 5, 10, 4)]),
    "w8_b612_ls4": dict(rescue_tiers=[(8, 6, 12, 4)]),
    "w8_b610_ls6": dict(rescue_tiers=[(8, 6, 10, 6)]),
    # round-3 probes: shave the line search / AL budget below (8,5,10,4)
    "w8_b510_ls2": dict(rescue_tiers=[(8, 5, 10, 2)]),
    "w8_b410_ls4": dict(rescue_tiers=[(8, 4, 10, 4)]),
    # mop-up cascade: second 1/16-width tier for the overflow tail
    "cascade_mop": dict(rescue_tiers=[(8, 5, 10, 4), (16, 5, 10, 4)]),
    # deeper phase 1 (3 AL passes) with lighter rescue
    "p3_light": dict(phase1_al_iterations=3, rescue_tiers=[(8, 4, 8, 4)]),
    "p3_b510": dict(phase1_al_iterations=3, rescue_tiers=[(8, 5, 10, 4)]),
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
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
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
        for _ in range(8):
            t1 = time.perf_counter()
            state, metrics = runner.step(state, scen)
            float(metrics.converged_fraction)
            if time.perf_counter() - t1 < 1.5:
                break
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = runner.step(state, scen)
        jax.block_until_ready(metrics)
        float(metrics.converged_fraction)
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
