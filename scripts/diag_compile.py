import os, time, sys
# simulate cold cache with a throwaway cache dir
if os.environ.get("COLD"):
    os.environ["ROBOT_MPCS_TPU_CACHE"] = "/tmp/cold_xla_cache"
import jax
t_start=time.perf_counter()
def mark(m): print(f"[{time.perf_counter()-t_start:7.1f}s] {m}", flush=True)
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh
from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
setup = load_setup("examples/config/pandaMpc.yaml")
setup.mpc.weights.update({"wconstr": [0.05, 0.0, 0.0, 0.0]})
problem = MpcProblem(setup)
mark("problem")
runner = FleetRunner(problem, batch_size=4096, mesh=make_mesh(devices=jax.devices()))
mark("runner")
import warnings
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    scenario = runner.shard_scenario(random_fleet_scenario(problem, 4096, seed=0,
        goal_box=((-0.5,-0.5,0.2),(0.5,0.5,1.0)), obstacle_box=((-0.8,-0.8,0.2),(0.8,0.8,1.0)),
        reachable_goals=True))
state = runner.init_state(scenario)
mark("scenario+init")
lowered = runner._fleet_step.lower(state, scenario)
mark("trace+lower")
compiled = lowered.compile()
mark("compile")
