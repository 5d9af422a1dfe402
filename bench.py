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


#: per-class scenario samplers (goal/obstacle boxes sized to each robot's
#: workspace); weights override the stock N-scaled repulsion that parks
#: robots off-goal (see objectives.ConstraintAvoidance)
CLASS_SPECS = {
    "panda": dict(
        config="pandaMpc.yaml",
        weights={"wconstr": [0.05, 0.0, 0.0, 0.0]},
        sampler=dict(
            goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 1.0)),
            obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
            # goals = FK images of random configurations: without this a
            # large fraction of box-sampled goals sit outside the ~0.85 m
            # panda workspace and mean_goal_distance measures the
            # unreachable residual, not controller quality
            reachable_goals=True,
        ),
    ),
    "pointRobot": dict(
        config="pointRobotMpc.yaml",
        weights={"wconstr": [0.005, 0.0, 0.0, 0.0]},
        sampler=dict(
            goal_box=((-2.0, -2.0, 0.05), (2.0, 2.0, 0.05)),
            obstacle_box=((-1.5, -1.5, 0.05), (1.5, 1.5, 0.05)),
        ),
    ),
    "boxer": dict(
        config="boxerMpc.yaml",
        weights={},
        sampler=dict(
            goal_box=((-2.0, -2.0, 0.0), (2.0, 2.0, 0.0)),
            obstacle_box=((5.0, 5.0, 0.0), (6.0, 6.0, 0.0)),
        ),
    ),
}


def _load_problem(name):
    from robot_mpcs_tpu.config import load_setup
    from robot_mpcs_tpu.models.problem import MpcProblem

    spec = CLASS_SPECS[name]
    cfg_path = os.path.join(
        os.path.dirname(__file__), "examples", "config", spec["config"]
    )
    setup = load_setup(cfg_path)
    setup.mpc.weights.update(spec["weights"])
    return MpcProblem(setup), setup


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
    from robot_mpcs_tpu.parallel.mesh import make_mesh

    problem, setup = _load_problem("panda")

    devices = jax.devices()
    n_chips = len(devices)
    mesh = make_mesh(devices=devices)
    if batch % n_chips:
        batch = ((batch + n_chips - 1) // n_chips) * n_chips

    def scenario_for(b, prob=problem, spec_name="panda"):
        return random_fleet_scenario(
            prob, b, seed=0, **CLASS_SPECS[spec_name]["sampler"]
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
    # (pointRobot/panda dt = 0.05 s, boxer dt = 0.1 s, reference
    # examples/config/*.yaml:5-6). Measure p50 per-step latency at small
    # batches on one chip.
    import warnings as _warnings

    def measure_latency(prob, b, spec_name):
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")  # small-batch compaction notes
            r = FleetRunner(prob, batch_size=b, mesh=make_mesh(devices=devices[:1]))
        sc = r.shard_scenario(scenario_for(b, prob, spec_name))
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
        return times[len(times) // 2]

    dt_budget_ms = 1000.0 * setup.mpc.time_step
    latency = {}
    if os.environ.get("BENCH_LATENCY", "1") != "0":
        for b in (1, 8, 64):
            p50 = measure_latency(problem, b, "panda")
            latency[f"p50_solve_latency_ms_b{b}"] = round(p50, 2)
            latency[f"realtime_ok_b{b}"] = bool(p50 <= dt_budget_ms)

    # ---- multi-class coverage: pointRobot (20 Hz) and boxer (10 Hz) ------
    # Throughput + single-robot latency for the other two reference problem
    # families, against their own dt budgets (VERDICT r3 item 4). Smaller
    # batches: these classes are lighter than the panda headline.
    multiclass = {}
    if os.environ.get("BENCH_MULTICLASS", "1") != "0":
        for name in ("pointRobot", "boxer"):
            prob_c, setup_c = _load_problem(name)
            budget_ms = 1000.0 * setup_c.mpc.time_step
            b_c = min(1024, batch)
            runner_c = FleetRunner(prob_c, batch_size=b_c, mesh=mesh)
            sc = runner_c.shard_scenario(scenario_for(b_c, prob_c, name))
            st = runner_c.init_state(sc)
            for _ in range(warmup):
                st, m = runner_c.step(st, sc)
            jax.block_until_ready(m)
            t1 = time.perf_counter()
            for _ in range(10):
                st, m = runner_c.step(st, sc)
            jax.block_until_ready(m)
            dt_c = time.perf_counter() - t1
            p50 = measure_latency(prob_c, 1, name)
            multiclass[f"{name}_solves_per_s_per_chip"] = round(
                b_c * 10 / dt_c / n_chips, 1
            )
            multiclass[f"{name}_converged_fraction"] = round(
                float(m.converged_fraction), 4
            )
            multiclass[f"{name}_p50_latency_ms_b1"] = round(p50, 2)
            multiclass[f"{name}_realtime_ok_b1"] = bool(p50 <= budget_ms)

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
            #: violation per exitflag class: converged lanes must sit at
            #: <= tol_constraint; the unconverged number sizes the tail
            "max_violation_converged": float(metrics.max_violation_converged),
            "max_violation_unconverged": float(metrics.max_violation_unconverged),
            #: unconverged lanes the rescue cascade had no capacity for
            "rescue_overflow_fraction": float(metrics.rescue_overflow_fraction),
            "mean_goal_distance": float(metrics.mean_goal_distance),
            "reset_fraction": float(metrics.reset_fraction),
            "mean_iterations": round(float(metrics.mean_iterations), 2),
            "throughput_step_ms": round(1000.0 * elapsed / steps, 2),
            "dt_budget_ms": round(dt_budget_ms, 2),
            **latency,
            **multiclass,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
