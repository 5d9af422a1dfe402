"""One-session round-2 profile: fleet step breakdown + batch-size sweep.

Runs everything in a single TPU acquisition (the tunnel serializes clients,
~3 min each) and prints a compact report.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


log("backend", jax.default_backend())

cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples", "config", "pandaMpc.yaml")
setup = load_setup(cfg_path)
setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
problem = MpcProblem(setup)
dims = problem.dims
mesh = make_mesh(devices=jax.devices())

# ---- steady-state fleet step at several batch sizes --------------------
for B in (2048, 4096, 8192):
    runner = FleetRunner(problem, batch_size=B, mesh=mesh)
    scenario = runner.shard_scenario(
        random_fleet_scenario(
            problem, B, seed=0,
            goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 1.0)),
            obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
        )
    )
    state = runner.init_state(scenario)
    for _ in range(3):
        state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    steps = 8
    for _ in range(steps):
        state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / steps
    log(
        f"fleet step B={B}: {dt*1000:8.1f} ms  {B/dt:8.0f} solves/s "
        f"mean_it={float(metrics.mean_iterations):.1f} max_it={int(metrics.max_iterations)} "
        f"conv={float(metrics.converged_fraction):.3f}"
    )

# ---- parts at B=4096 -----------------------------------------------------
B = 4096
solve = problem.build_solver()
internals = solve._internals
cfg = setup.solver
N, nx, ns, nu = dims.N, dims.nx, dims.ns, dims.nu
nw = ns + nu
n_con = problem.n_con

key = jax.random.PRNGKey(0)
X = jax.random.normal(key, (B, N, nx)) * 0.1
W = jax.random.normal(key, (B, N, nw)) * 0.1
P = jnp.zeros((B, N, problem.npar))
lam = jnp.zeros((B, N, n_con))
mu = jnp.asarray(10.0)
xinit = X[:, 0]


def timeit(name, f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    log(f"{name}: {dt*1000:8.1f} ms")
    return out


expansion = jax.jit(
    jax.vmap(
        lambda X, W, P, lam: jax.vmap(
            internals["stage_expansion"], in_axes=(0, 0, 0, 0, None)
        )(X, W, P, lam, mu)
    )
)
g, H = timeit("stage_expansion", expansion, X, W, P, lam)

lx, lw = g[..., :nx], g[..., nx:]
lxx, lxw, lww = H[..., :nx, :nx], H[..., :nx, nx:], H[..., nx:, nx:]
A = jnp.zeros((B, N, nx, nx)) + jnp.eye(nx)
Bm = jnp.zeros((B, N, nx, nw))

backward = jax.jit(
    jax.vmap(lambda *a: internals["backward"](*a, jnp.asarray(1e-6)))
)
k_ff, K, failed = timeit("backward riccati", backward, lx, lw, lxx, lxw, lww, A, Bm)

fwd1 = jax.jit(
    jax.vmap(
        lambda xinit, X, W, k, K, P, lam: internals["forward"](
            xinit, X, W, k, K, P, lam, mu, jnp.asarray(1.0)
        )
    )
)
timeit("forward 1 alpha (merit incl)", fwd1, xinit, X, W, k_ff, K, P, lam)

cost1 = jax.jit(
    jax.vmap(lambda X, W, P, lam: internals["total_al_cost"](X, W, P, lam, mu))
)
timeit("merit eval only", cost1, X, W, P, lam)

dynj = jax.jit(jax.vmap(internals["all_dyn_jacobians"]))
timeit("dyn jacobians", dynj, X, W)

log("done")
