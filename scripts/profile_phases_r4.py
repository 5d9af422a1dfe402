"""Round-4 phase breakdown on real TPU: where does the fleet-step go?

Measures each solver phase at the full bench batch (B=4096) AND at the
rescue-tier width (B=512), with the solver's f32 matmul precision, plus the
packed Riccati path the production solver actually takes (batch-constant
dynamics -> riccati_backward_packed), which profile_phases_r3.py missed (it
passed batched A/B and timed the general lane-packed kernel instead).

Also decomposes the merit sweep into its FK/q-family, affine-family, and
AL-penalty parts to aim the next kernel. Results -> PROFILE.md.
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

PREC = os.environ.get("PREC", "float32")
cfg_path = os.path.join(
    os.path.dirname(__file__), "..", "examples", "config", "pandaMpc.yaml"
)
setup = load_setup(cfg_path)
setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
problem = MpcProblem(setup)
dims = problem.dims
solve = problem.build_solver(setup.solver)
internals = solve._internals
split = problem.split_callbacks()

N, nx, nw = dims.N, dims.nx, dims.ns + dims.nu
n_con = problem.n_con
n_q = dims.n


def timeit(name, f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1000:8.3f} ms", flush=True)
    return out


for B in (4096, 512):
    print(f"\n===== B = {B} =====")
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, N, nx)) * 0.1
    W = jax.random.normal(key, (B, N, nw)) * 0.1
    P = jnp.zeros((B, N, problem.npar))
    lam = jnp.zeros((B, N, n_con))
    mu = jnp.asarray(100.0)
    xinit = X[:, 0]
    reg = jnp.full((B,), 1e-6)

    with jax.default_matmul_precision(PREC):
        # ---- merit decomposition ------------------------------------
        qr = jax.jit(
            jax.vmap(jax.vmap(lambda x, p: split["q_rows"](x[:n_q], p)))
        )
        timeit("q_rows (FK rows) [B,N]", qr, X, P)

        ar = jax.jit(
            jax.vmap(
                jax.vmap(
                    lambda x, w, p: split["aff_rows"](
                        jnp.concatenate([x, w]), p
                    )
                )
            )
        )
        timeit("aff_rows [B,N]", ar, X, W, P)

        fk_links = list(problem.robot.collision_links)
        fkl = jax.jit(
            jax.vmap(jax.vmap(lambda x: problem.kin.fk_pos_links(x[:n_q], fk_links)))
        )
        timeit("fk_pos_links only [B,N]", fkl, X)

        merit = jax.jit(
            jax.vmap(
                lambda X, W, P, lam: jax.vmap(
                    internals["al_stage_cost"], in_axes=(0, 0, 0, 0, None)
                )(X, W, P, lam, mu)
            )
        )
        timeit("al_stage_cost merit [B,N]", merit, X, W, P, lam)

        # ---- forward: scan rollout + merit --------------------------
        kff = jnp.zeros((B, N, nw))
        Kg = jnp.zeros((B, N, nw, nx))
        fwd = jax.jit(
            jax.vmap(
                lambda xinit, X, W, k, K, P, lam: internals["forward"](
                    xinit, X, W, k, K, P, lam, mu, jnp.asarray(1.0)
                )
            )
        )
        timeit("forward (scan + merit)", fwd, xinit, X, W, kff, Kg, P, lam)

        rollout = jax.jit(jax.vmap(internals["rollout"]))
        timeit("rollout scan only", rollout, xinit, W)

        # ---- expansion ----------------------------------------------
        expansion = jax.jit(
            jax.vmap(
                lambda X, W, P, lam: jax.vmap(
                    internals["stage_expansion"], in_axes=(0, 0, 0, 0, None)
                )(X, W, P, lam, mu)
            )
        )
        g, H = timeit("stage_expansion", expansion, X, W, P, lam)

        # ---- backward: the REAL production path (packed kernel) -----
        lx, lw = g[..., :nx], g[..., nx:]
        lxx, lxw, lww = H[..., :nx, :nx], H[..., :nx, nx:], H[..., nx:, nx:]
        bw = jax.jit(
            jax.vmap(
                internals["backward"],
                in_axes=(0, 0, 0, 0, 0, None, None, 0),
            )
        )
        A0 = jnp.zeros((N, nx, nx))
        B0 = jnp.zeros((N, nx, nw))
        timeit("backward (packed, const A/B)", bw, lx, lw, lxx, lxw, lww, A0, B0, reg)

        # ---- one full warm solve ------------------------------------
        Z0 = jnp.zeros((B, N, dims.nz))
        Z0 = Z0.at[:, :, :nx].set(xinit[:, None, :])
        lam0 = jnp.zeros((B, N, n_con))
        full = jax.jit(jax.vmap(solve))
        timeit("full solve (cold z0)", full, xinit, P, Z0, lam0, reps=3)
