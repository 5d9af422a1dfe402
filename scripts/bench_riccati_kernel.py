"""Micro-benchmark of the Pallas Riccati backward kernel variants.

Usage: B=2048 N=20 NX=14 NW=8 python scripts/bench_riccati_kernel.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "2048"))
N = int(os.environ.get("N", "20"))
nx = int(os.environ.get("NX", "14"))
nw = int(os.environ.get("NW", "8"))

from robot_mpcs_tpu.ops.riccati_pallas import riccati_backward_batched

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
lx = jax.random.normal(ks[0], (B, N, nx))
lw = jax.random.normal(ks[1], (B, N, nw))
M = jax.random.normal(ks[2], (B, N, nx, nx)) * 0.1
lxx = M @ jnp.swapaxes(M, -1, -2) + 2.0 * jnp.eye(nx)
lxw = jax.random.normal(ks[3], (B, N, nx, nw)) * 0.01
Mw = jax.random.normal(ks[4], (B, N, nw, nw)) * 0.1
lww = Mw @ jnp.swapaxes(Mw, -1, -2) + 2.0 * jnp.eye(nw)
A_c = jnp.eye(nx)[None].repeat(N, 0) * 0.99
B_c = jax.random.normal(ks[5], (N, nx, nw)) * 0.1
A_b = jnp.broadcast_to(A_c, (B, N, nx, nx))
B_b = jnp.broadcast_to(B_c, (B, N, nx, nw))
reg = jnp.full((B,), 1e-6)


def timeit(name, f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    lanes_stages = B * N
    print(f"{name}: {dt*1e3:8.2f} ms   ({dt*1e9/lanes_stages:6.1f} ns/lane-stage)", flush=True)
    return out


f_const = jax.jit(lambda *a: riccati_backward_batched(*a, N=N, nx=nx, nw=nw))
timeit("pallas const-dyn ", f_const, lx, lw, lxx, lxw, lww, A_c, B_c, reg)
timeit("pallas batched-dyn", f_const, lx, lw, lxx, lxw, lww, A_b, B_b, reg)
