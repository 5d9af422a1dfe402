"""Compare raw vmapped solve vs FleetRunner.step at the same batch size."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh

B = int(os.environ.get("B", "256"))
cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples", "config", "pandaMpc.yaml")
setup = load_setup(cfg_path)
setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
problem = MpcProblem(setup)
dims = problem.dims

mesh = make_mesh(devices=jax.devices())
runner = FleetRunner(problem, batch_size=B, mesh=mesh)
scenario = runner.shard_scenario(
    random_fleet_scenario(
        problem, B, seed=0,
        goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 1.0)),
        obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
    )
)
state = runner.init_state(scenario)

t0 = time.perf_counter()
state, metrics = runner.step(state, scenario)
jax.block_until_ready(metrics)
print(f"fleet_step compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

for i in range(4):
    t0 = time.perf_counter()
    state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)
    print(f"fleet_step[{i}]: {time.perf_counter()-t0:.3f}s", flush=True)
