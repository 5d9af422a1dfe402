"""Phase breakdown of one fleet solve iteration at bench batch size, with the
solver's f32 matmul precision (the timing that actually matters on TPU)."""
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

B = int(os.environ.get("B", "4096"))
PREC = os.environ.get("PREC", "float32")
cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples", "config", "pandaMpc.yaml")
setup = load_setup(cfg_path)
setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
problem = MpcProblem(setup)
dims = problem.dims
solve = problem.build_solver(setup.solver)
internals = solve._internals
cfg = setup.solver

N, nx, nw, nv = dims.N, dims.nx, dims.ns + dims.nu, dims.nx + dims.ns + dims.nu
n_con = problem.n_con

key = jax.random.PRNGKey(0)
X = jax.random.normal(key, (B, N, nx)) * 0.1
W = jax.random.normal(key, (B, N, nw)) * 0.1
P = jnp.zeros((B, N, problem.npar))
lam = jnp.zeros((B, N, n_con))
mu = jnp.asarray(100.0)
xinit = X[:, 0]


def timeit(name, f, *args, reps=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1000:8.2f} ms", flush=True)
    return out


with jax.default_matmul_precision(PREC):
    expansion = jax.jit(
        jax.vmap(
            lambda X, W, P, lam: jax.vmap(
                internals["stage_expansion"], in_axes=(0, 0, 0, 0, None)
            )(X, W, P, lam, mu)
        )
    )
    g, H = timeit(f"stage_expansion[{PREC}]", expansion, X, W, P, lam)

    lx, lw = g[..., :nx], g[..., nx:]
    lxx, lxw, lww = H[..., :nx, :nx], H[..., :nx, nx:], H[..., nx:, nx:]
    A = jnp.zeros((B, N, nx, nx)) + jnp.eye(nx)
    Bm = jnp.zeros((B, N, nx, nw))

    backward = jax.jit(
        jax.vmap(lambda *a: internals["backward"](*a, jnp.asarray(1e-6)))
    )
    k_ff, K, failed = timeit(
        f"backward[{PREC}]", backward, lx, lw, lxx, lxw, lww, A, Bm
    )

    fwd1 = jax.jit(
        jax.vmap(
            lambda xinit, X, W, k, K, P, lam: internals["forward"](
                xinit, X, W, k, K, P, lam, mu, jnp.asarray(1.0)
            )
        )
    )
    timeit(f"forward 1 alpha (merit sweep)[{PREC}]", fwd1, xinit, X, W, k_ff, K, P, lam)

    # dynamics-jacobian broadcast (constant for panda)
    dyn = jax.jit(jax.vmap(lambda X, W: internals["all_dyn_jacobians"](X, W)))
    timeit(f"all_dyn_jacobians[{PREC}]", dyn, X, W)

    rollout = jax.jit(jax.vmap(internals["rollout"]))
    timeit(f"rollout only[{PREC}]", rollout, xinit, W)

    tc = jax.jit(
        jax.vmap(lambda X, W, P, lam: internals["total_al_cost"](X, W, P, lam, mu))
    )
    timeit(f"total_al_cost (merit only)[{PREC}]", tc, X, W, P, lam)
