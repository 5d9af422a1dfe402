import os, time, json
t_start = time.perf_counter()
def mark(msg):
    print(f"[{time.perf_counter()-t_start:8.1f}s] {msg}", flush=True)

import jax
mark("jax imported")
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
mark("cache enabled")

from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh
from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
mark("imports done")

setup = load_setup("examples/config/pandaMpc.yaml")
setup.mpc.weights.update({"wconstr": [0.05, 0.0, 0.0, 0.0]})
problem = MpcProblem(setup)
mark("problem built")

devices = jax.devices()
mesh = make_mesh(devices=devices)
batch = 4096
runner = FleetRunner(problem, batch_size=batch, mesh=mesh)
mark("runner built")
scenario = runner.shard_scenario(random_fleet_scenario(problem, batch, seed=0,
    goal_box=((-0.5,-0.5,0.2),(0.5,0.5,1.0)), obstacle_box=((-0.8,-0.8,0.2),(0.8,0.8,1.0)),
    reachable_goals=True))
mark("scenario built")
state = runner.init_state(scenario)
mark("state init")

# first step: trace + lower + compile + run
state, metrics = runner.step(state, scenario)
jax.block_until_ready(metrics)
mark("first step done (trace+lower+compile+run)")

t0 = time.perf_counter()
for _ in range(5):
    state, metrics = runner.step(state, scenario)
jax.block_until_ready(metrics)
dt = (time.perf_counter()-t0)/5
mark(f"steady step: {dt*1000:.1f} ms -> {batch/dt:.0f} solves/s/chip")
