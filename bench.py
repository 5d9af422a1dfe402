"""Headline benchmark: batched panda MPC solves/s per chip on real TPU.

Measures the closed-loop receding-horizon fleet step (batched AL-iLQR solve
with shift-horizon + multiplier warm starts, plant integration, metric
reduction) on the flagship panda problem (7-dof arm, H=20, radial +
self-collision + joint/input limit constraints) — the scenario class of
BASELINE.md ("batched MPC solves/s (panda-class, H=20-30)").

Baseline anchor: the driver's north-star target is >= 10,000 solves/s on a
v5e-16 (16 chips) => 625 solves/s/chip. ``vs_baseline`` reports the measured
per-chip rate against that anchor. (The reference itself publishes no
numbers; it runs ONE solve per control step through a licensed C solver,
reference robotmpcs/planner/mpcPlanner.py:240-288.)

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import jax


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from robot_mpcs_tpu.config import load_setup
    from robot_mpcs_tpu.models.problem import MpcProblem
    from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
    from robot_mpcs_tpu.parallel.mesh import make_mesh

    cfg_path = os.path.join(os.path.dirname(__file__), "examples", "config", "pandaMpc.yaml")
    setup = load_setup(cfg_path)
    # stock wconstr=0.5 with the reference's N-scaled repulsion parks the arm
    # off-goal (see objectives.ConstraintAvoidance); bench uses a sane weight
    setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)

    devices = jax.devices()
    n_chips = len(devices)
    mesh = make_mesh(devices=devices)
    if batch % n_chips:
        batch = ((batch + n_chips - 1) // n_chips) * n_chips

    def scenario_for(b):
        return random_fleet_scenario(
            problem,
            b,
            seed=0,
            goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 1.0)),
            obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
        )

    runner = FleetRunner(problem, batch_size=batch, mesh=mesh)
    scenario = runner.shard_scenario(scenario_for(batch))
    state = runner.init_state(scenario)

    for _ in range(warmup):
        state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)
    elapsed = time.perf_counter() - t0

    solves = batch * steps
    solves_per_s = solves / elapsed
    per_chip = solves_per_s / n_chips
    baseline_per_chip = 10_000 / 16  # v5e-16 north-star, per chip

    # ---- latency mode: single-robot real-time story ----------------------
    # The reference's implicit perf contract is per-step solve <= dt
    # (pointRobot/panda dt = 0.05 s, reference examples/config/*.yaml:5-6).
    # Measure p50 per-step latency at small batches on one chip.
    dt_budget_ms = 1000.0 * setup.mpc.time_step
    latency = {}
    if os.environ.get("BENCH_LATENCY", "1") != "0":
        for b in (1, 8, 64):
            r = FleetRunner(problem, batch_size=b, mesh=make_mesh(devices=devices[:1]))
            sc = r.shard_scenario(scenario_for(b))
            st = r.init_state(sc)
            for _ in range(3):
                st, m = r.step(st, sc)
            jax.block_until_ready(m)
            times = []
            for _ in range(20):
                t1 = time.perf_counter()
                st, m = r.step(st, sc)
                jax.block_until_ready(m)
                times.append(1000.0 * (time.perf_counter() - t1))
            times.sort()
            p50 = times[len(times) // 2]
            latency[f"p50_solve_latency_ms_b{b}"] = round(p50, 2)
            latency[f"realtime_ok_b{b}"] = bool(p50 <= dt_budget_ms)

    result = {
        "metric": "panda_H20_mpc_solves_per_s_per_chip",
        "value": round(per_chip, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / baseline_per_chip, 3),
        "extra": {
            "batch": batch,
            "steps": steps,
            "n_chips": n_chips,
            "elapsed_s": round(elapsed, 3),
            "total_solves_per_s": round(solves_per_s, 1),
            #: honest optimality: fraction of solves with exitflag == 1
            #: (feasible to tol_constraint AND stationary), NOT "didn't blow
            #: up" — that is 1 - reset_fraction
            "converged_fraction": float(metrics.converged_fraction),
            "max_violation": float(metrics.max_violation),
            "mean_goal_distance": float(metrics.mean_goal_distance),
            "reset_fraction": float(metrics.reset_fraction),
            "mean_iterations": round(float(metrics.mean_iterations), 2),
            "throughput_step_ms": round(1000.0 * elapsed / steps, 2),
            "dt_budget_ms": round(dt_budget_ms, 2),
            **latency,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
