"""Round-3 convergence/perf experiment: per-step fleet metrics on TPU.

Measures, step by step, whether the honest convergence criteria actually
fire in the flagship panda fleet (converged_fraction == exitflag==1), how
mean/max iterations evolve as warm starts kick in, and what each step costs.
Run with B=... STEPS=... to vary; prints one line per step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh

B = int(os.environ.get("B", "4096"))
STEPS = int(os.environ.get("STEPS", "24"))
T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


log("backend", jax.default_backend())
cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples", "config", "pandaMpc.yaml")
setup = load_setup(cfg_path)
setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
for k in ("MAX_AL", "MAX_ILQR", "TOL_G", "TOL_C"):
    if k in os.environ:
        attr = {"MAX_AL": "max_al_iterations", "MAX_ILQR": "max_ilqr_iterations",
                "TOL_G": "tol_gradient", "TOL_C": "tol_constraint"}[k]
        cur = getattr(setup.solver, attr)
        setattr(setup.solver, attr, type(cur)(float(os.environ[k])))
        log("override", attr, "=", getattr(setup.solver, attr))
if "LS_STEPS" in os.environ:
    setup.solver.line_search_steps = int(os.environ["LS_STEPS"])
    log("override line_search_steps =", setup.solver.line_search_steps)
if "RICCATI" in os.environ:
    setup.solver.riccati_backend = os.environ["RICCATI"]
    log("override riccati_backend =", setup.solver.riccati_backend)
problem = MpcProblem(setup)
mesh = make_mesh(devices=jax.devices())
runner = FleetRunner(problem, batch_size=B, mesh=mesh, solver_cfg=setup.solver)
scenario = runner.shard_scenario(
    random_fleet_scenario(
        problem, B, seed=0,
        goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 1.0)),
        obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
    )
)
state = runner.init_state(scenario)
log(f"compiled+first step starting, B={B}")
times = []
for i in range(STEPS):
    t0 = time.perf_counter()
    state, m = runner.step(state, scenario)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    times.append(dt)
    log(
        f"step {i:3d}: {dt*1000:8.1f} ms  conv={float(m.converged_fraction):.3f} "
        f"viol={float(m.max_violation):.2e} it_mean={float(m.mean_iterations):5.1f} "
        f"it_max={int(m.max_iterations)} reset={float(m.reset_fraction):.3f} "
        f"gdist={float(m.mean_goal_distance):.3f}"
    )
steady = times[max(1, STEPS // 2):]
avg = sum(steady) / len(steady)
log(f"steady-state avg: {avg*1000:.1f} ms/step -> {B/avg:.0f} solves/s")
