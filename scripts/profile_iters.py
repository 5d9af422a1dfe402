"""Sweep AL/iLQR iteration caps on the warm-started fleet benchmark.

Finds the cheapest budget that preserves solution quality (converged
fraction, violation, goal distance) on the panda fleet workload.
"""
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from robot_mpcs_tpu.config import SolverConfiguration, load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh

B = int(os.environ.get("B", "2048"))
STEPS = int(os.environ.get("STEPS", "12"))

cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples", "config", "pandaMpc.yaml")
setup = load_setup(cfg_path)
setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
problem = MpcProblem(setup)
mesh = make_mesh(devices=jax.devices())
scenario_raw = random_fleet_scenario(
    problem, B, seed=0,
    goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 1.0)),
    obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
)

import itertools

CONFIGS = [
    dict(),  # defaults
    dict(penalty_initial=100.0),
    dict(penalty_initial=100.0, penalty_scale=30.0),
    dict(max_al_iterations=5),
    dict(penalty_initial=100.0, max_al_iterations=5),
]

for overrides in CONFIGS:
    scfg = SolverConfiguration(**overrides)
    al, ilqr, ls = scfg.max_al_iterations, scfg.max_ilqr_iterations, scfg.line_search_steps
    print("config:", overrides or "defaults", flush=True)
    runner = FleetRunner(problem, batch_size=B, mesh=mesh, solver_cfg=scfg)
    scenario = runner.shard_scenario(scenario_raw)
    state = runner.init_state(scenario)
    for _ in range(3):
        state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    print(
        f"al={al} ilqr={ilqr} ls={ls}: {B*STEPS/dt:7.1f} solves/s  "
        f"conv={float(metrics.converged_fraction):.3f} "
        f"viol={float(metrics.max_violation):.2e} "
        f"gdist={float(metrics.mean_goal_distance):.3f} "
        f"reset={float(metrics.reset_fraction):.4f}",
        flush=True,
    )
