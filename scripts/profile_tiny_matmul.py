"""Microbench: strategies for batched tiny matmuls (B, 14, 14) on TPU.

The Riccati sweep is dominated by these. Candidates:
  matmul  — jnp.matmul (batched dot_general; pads 14x14 onto MXU tiles)
  mulsum  — broadcast multiply + reduce (batch stays on lanes, VPU work)
  blocked — fold the N-stage axis into the batch (bigger ops, same tactic)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B = int(os.environ.get("B", "4096"))
n = 14

rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(B, n, n)).astype(np.float32))
V = jnp.asarray(rng.normal(size=(B, n, n)).astype(np.float32))


def chain_matmul(A, V):
    # the A' V A pattern of the Riccati step
    return jnp.swapaxes(A, -1, -2) @ V @ A


def chain_mulsum(A, V):
    # tmp[b,i,j] = sum_m A[b,m,i] V[b,m,j]; out[b,i,j] = sum_m tmp[b,i,m] A[b,m,j]
    tmp = jnp.sum(A[:, :, :, None] * V[:, :, None, :], axis=1)
    return jnp.sum(tmp[:, :, :, None] * A[:, :, None, :], axis=2)


def chain_einsum(A, V):
    return jnp.einsum("bmi,bmn,bnj->bij", A, V, A)


for name, f in (
    ("matmul", chain_matmul),
    ("mulsum", chain_mulsum),
    ("einsum", chain_einsum),
):
    g = jax.jit(f)
    out = g(A, V)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = g(A, V)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    ref = np.asarray(chain_matmul(A, V))
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    print(f"{name}: {dt*1e6:9.1f} us   maxdiff={err:.2e}", flush=True)
