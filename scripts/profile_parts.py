"""Time the inner pieces of one iLQR iteration at fleet batch size."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem

B = int(os.environ.get("B", "256"))
cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples", "config", "pandaMpc.yaml")
setup = load_setup(cfg_path)
setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
problem = MpcProblem(setup)
dims = problem.dims
solve = problem.build_solver()
internals = solve._internals
cfg = setup.solver

N, nx, nw, nv = dims.N, dims.nx, dims.ns + dims.nu, dims.nx + dims.ns + dims.nu
n_con = problem.n_con

key = jax.random.PRNGKey(0)
X = jax.random.normal(key, (B, N, nx)) * 0.1
W = jax.random.normal(key, (B, N, nw)) * 0.1
P = jnp.zeros((B, N, problem.npar))
lam = jnp.zeros((B, N, n_con))
mu = jnp.asarray(10.0)
xinit = X[:, 0]

expansion = jax.jit(
    jax.vmap(
        lambda X, W, P, lam: jax.vmap(
            internals["stage_expansion"], in_axes=(0, 0, 0, 0, None)
        )(X, W, P, lam, mu)
    )
)


def timeit(name, f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms", flush=True)
    return out


g, H = timeit("stage_expansion (1x)", expansion, X, W, P, lam)

lx, lw = g[..., :nx], g[..., nx:]
lxx, lxw, lww = H[..., :nx, :nx], H[..., :nx, nx:], H[..., nx:, nx:]
A = jnp.zeros((B, N, nx, nx)) + jnp.eye(nx)
Bm = jnp.zeros((B, N, nx, nw))

backward = jax.jit(
    jax.vmap(lambda *a: internals["backward"](*a, jnp.asarray(1e-6)))
)
k_ff, K, failed = timeit("backward riccati (1x)", backward, lx, lw, lxx, lxw, lww, A, Bm)

alphas = cfg.line_search_decay ** jnp.arange(cfg.line_search_steps)
forward = jax.jit(
    jax.vmap(
        lambda xinit, X, W, k, K, P, lam: jax.vmap(
            lambda a: internals["forward"](xinit, X, W, k, K, P, lam, mu, a)
        )(alphas)
    )
)
timeit("forward+linesearch 8 alphas (1x)", forward, xinit, X, W, k_ff, K, P, lam)

ilqr = jax.jit(jax.vmap(lambda *a: internals["ilqr"](*a, mu)))
timeit("full ilqr (8 iters)", ilqr, xinit, X, W, P, lam, reps=2)

f = jax.jit(jax.vmap(solve))
z0 = jnp.zeros((B, N, dims.nz))
timeit("full solve (6 AL x 8)", f, xinit, P, z0, lam, reps=2)
