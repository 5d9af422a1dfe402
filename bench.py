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

Output contract (driver parses the LAST JSON line on stdout):
 1. the headline JSON line is printed IMMEDIATELY after the main fleet
    measurement — before any optional extras — so a hang or timeout in the
    extras can never lose the headline number (round-4 failure mode);
 2. extras (single-robot latency, pointRobot/boxer problem classes) run
    only while wall-clock remains under ``BENCH_TIME_BUDGET`` seconds
    (default 420, measured from process start) and each is exception-
    guarded;
 3. a final enriched JSON line (same headline fields + extras) is always
    printed last.

Environment knobs: BENCH_BATCH, BENCH_STEPS, BENCH_WARMUP_MAX,
BENCH_TIME_BUDGET, BENCH_LATENCY=0, BENCH_MULTICLASS=0.
"""

import json
import os
import sys
import time

T0 = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - T0


import jax  # noqa: E402


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


def _scenario_for(problem, b, spec_name, seed=0):
    import warnings

    from robot_mpcs_tpu.parallel.fleet import random_fleet_scenario

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return random_fleet_scenario(
            problem, b, seed=seed, **CLASS_SPECS[spec_name]["sampler"]
        )


def _sync(metrics) -> float:
    """Genuine host-visible barrier: pull one scalar to the host.

    ``block_until_ready`` alone has been observed to return early through
    the remote-TPU relay used on the bench machine; a device->host scalar
    transfer cannot lie.
    """
    return float(metrics.converged_fraction)


def _warm_and_measure(
    runner, state, scenario, steps, warmup_max, note, warmup_budget_s=240.0
):
    """Warm a fleet executable to steady state, then measure throughput.

    Through the remote-TPU relay the first 1-2 executions of a freshly
    loaded executable run ~1000x slower than steady state (binary upload /
    program load on the device host). Warm up with per-step host syncs
    until a step runs in <1.5 s (minimum 2, cap ``warmup_max`` steps AND
    ``warmup_budget_s`` wall seconds — on a pathologically slow relay day
    the headline must still print, even if it then underestimates), then
    time ``steps`` asynchronously-chained steps behind one final sync —
    exactly how a fleet runs in production.
    """
    warm_times = []
    metrics = None
    t_warm = time.perf_counter()
    for _ in range(max(3, warmup_max)):
        t1 = time.perf_counter()
        state, metrics = runner.step(state, scenario)
        _sync(metrics)
        warm_times.append(time.perf_counter() - t1)
        # require TWO consecutive fast steps: the relay's slow-execution
        # count varies (usually 2, sometimes 3) and a single fast step is
        # not proof of steady state
        if (
            len(warm_times) >= 3
            and warm_times[-1] < 1.5
            and warm_times[-2] < 1.5
        ):
            break
        if time.perf_counter() - t_warm > warmup_budget_s:
            note["warmup_truncated"] = True
            break

    def _measure():
        t1 = time.perf_counter()
        st = state
        m = metrics
        for _ in range(steps):
            st, m = runner.step(st, scenario)
        jax.block_until_ready(m)
        _sync(m)
        return st, m, time.perf_counter() - t1

    state, metrics, elapsed = _measure()
    # contamination guard: if a stray slow execution landed inside the
    # measured window (elapsed far above what the last warm step implies),
    # the window itself completed the warmup — measure once more and keep
    # the clean number
    if warm_times[-1] < 1.5 and elapsed > 5.0 * steps * max(
        warm_times[-1], 0.05
    ):
        note["remeasured"] = True
        state, metrics, elapsed = _measure()
    note["warmup_steps"] = len(warm_times)
    note["warmup_s"] = round(sum(warm_times), 1)
    return state, metrics, elapsed


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    warmup_max = int(os.environ.get("BENCH_WARMUP_MAX", "8"))
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "420"))

    from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from robot_mpcs_tpu.parallel.fleet import FleetRunner
    from robot_mpcs_tpu.parallel.mesh import make_mesh

    problem, setup = _load_problem("panda")

    devices = jax.devices()
    n_chips = len(devices)
    mesh = make_mesh(devices=devices)
    if batch % n_chips:
        batch = ((batch + n_chips - 1) // n_chips) * n_chips

    runner = FleetRunner(problem, batch_size=batch, mesh=mesh)
    scenario = runner.shard_scenario(_scenario_for(problem, batch, "panda"))
    state = runner.init_state(scenario)

    note = {}
    state, metrics, elapsed = _warm_and_measure(
        runner, state, scenario, steps, warmup_max, note
    )

    solves = batch * steps
    solves_per_s = solves / elapsed
    per_chip = solves_per_s / n_chips
    baseline_per_chip = 10_000 / 16  # v5e-16 north-star, per chip

    dt_budget_ms = 1000.0 * setup.mpc.time_step
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
            "setup_s": round(_elapsed() - elapsed - sum((note.get("warmup_s", 0),)), 1),
            **note,
        },
    }
    # ---- headline out FIRST: nothing below may lose this line ------------
    print(json.dumps(result), flush=True)

    # ---- optional extras, wall-clock-budgeted and exception-guarded ------
    def remaining():
        return budget - _elapsed()

    def measure_latency(prob, b, spec_name):
        """p50 per-step time at batch b on one chip (sync floor subtracted).

        Each per-step host sync costs a fixed relay round-trip on this
        machine (~25-120 ms); measure that floor on an already-materialized
        array and subtract it so the number reflects device step time.
        """
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = FleetRunner(prob, batch_size=b, mesh=make_mesh(devices=devices[:1]))
        sc = r.shard_scenario(_scenario_for(prob, b, spec_name))
        st = r.init_state(sc)
        m = None
        for _ in range(4):
            st, m = r.step(st, sc)
            _sync(m)
        # sync floor: repeated scalar pulls of a ready array
        floors = []
        for _ in range(5):
            t1 = time.perf_counter()
            _sync(m)
            floors.append(time.perf_counter() - t1)
        floor = sorted(floors)[len(floors) // 2]
        times = []
        for _ in range(15):
            t1 = time.perf_counter()
            st, m = r.step(st, sc)
            _sync(m)
            times.append(time.perf_counter() - t1)
        times.sort()
        p50 = max(0.0, times[len(times) // 2] - floor)
        return 1000.0 * p50

    latency = {}
    if os.environ.get("BENCH_LATENCY", "1") != "0":
        for b in (1, 64):
            if remaining() < 150.0:
                latency["latency_skipped"] = "time budget"
                break
            try:
                p50 = measure_latency(problem, b, "panda")
                latency[f"p50_solve_latency_ms_b{b}"] = round(p50, 2)
                latency[f"realtime_ok_b{b}"] = bool(p50 <= dt_budget_ms)
            except Exception as e:  # noqa: BLE001 - extras must not kill the bench
                latency["latency_error"] = repr(e)[:200]
                break

    # ---- multi-class coverage: pointRobot (20 Hz) and boxer (10 Hz) ------
    # Throughput for the other two reference problem families, against
    # their own dt budgets (VERDICT r3 item 4).
    multiclass = {}
    if os.environ.get("BENCH_MULTICLASS", "1") != "0":
        for name in ("pointRobot", "boxer"):
            if remaining() < 180.0:
                multiclass["multiclass_skipped"] = "time budget"
                break
            try:
                prob_c, setup_c = _load_problem(name)
                b_c = min(1024, batch)
                runner_c = FleetRunner(prob_c, batch_size=b_c, mesh=mesh)
                sc = runner_c.shard_scenario(_scenario_for(prob_c, b_c, name))
                st = runner_c.init_state(sc)
                note_c = {}
                st, m, dt_c = _warm_and_measure(
                    runner_c, st, sc, 10, warmup_max, note_c
                )
                multiclass[f"{name}_solves_per_s_per_chip"] = round(
                    b_c * 10 / dt_c / n_chips, 1
                )
                multiclass[f"{name}_converged_fraction"] = round(
                    float(m.converged_fraction), 4
                )
            except Exception as e:  # noqa: BLE001
                multiclass["multiclass_error"] = repr(e)[:200]
                break

    result["extra"].update(latency)
    result["extra"].update(multiclass)
    result["extra"]["bench_wall_s"] = round(_elapsed(), 1)
    # final enriched line: the driver parses the LAST JSON line
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    sys.exit(main())
