import time, jax, jax.numpy as jnp
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
mesh = make_mesh(devices=jax.devices())
batch=4096
runner = FleetRunner(problem, batch_size=batch, mesh=mesh)
import warnings
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    scenario = runner.shard_scenario(random_fleet_scenario(problem, batch, seed=0,
        goal_box=((-0.5,-0.5,0.2),(0.5,0.5,1.0)), obstacle_box=((-0.8,-0.8,0.2),(0.8,0.8,1.0)),
        reachable_goals=True))
state = runner.init_state(scenario)
mark("setup done")

K=10
@jax.jit
def multi(state, scenario):
    def body(st, _):
        st, m = runner._fleet_step._fun(st, scenario) if hasattr(runner._fleet_step,'_fun') else (None,None)
        return st, m
    # use the underlying function via closure: call step through the jitted fn is fine inside? no.
    return state

# instead: rebuild a scan over the same fleet_step logic by calling the private step fn
fs = runner._fleet_step  # jitted
# time ONE call, fully synced via a scalar pull
state, m = fs(state, scenario)
_ = float(m.converged_fraction)
mark("one step synced")
t0=time.perf_counter()
state, m = fs(state, scenario)
_ = float(m.converged_fraction)
mark(f"second step synced: {time.perf_counter()-t0:.2f}s")
t0=time.perf_counter()
for i in range(3):
    state, m = fs(state, scenario)
_ = float(m.converged_fraction)
mark(f"3 chained steps: {(time.perf_counter()-t0)/3:.2f}s each")
