"""Profile the batched solve at several batch sizes to find the bottleneck.

If step time is flat in B -> latency / sequential-depth bound (scan overhead).
If linear in B -> throughput bound (FLOPs or bandwidth).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import random_fleet_scenario

cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples", "config", "pandaMpc.yaml")
setup = load_setup(cfg_path)
problem = MpcProblem(setup)
dims = problem.dims
solve = problem.build_solver()

import os as _os

batches = tuple(
    int(b) for b in _os.environ.get("BATCHES", "8,64,256").split(",")
)

for B in batches:
    scen = random_fleet_scenario(problem, B, seed=0)
    z0 = jnp.zeros((B, dims.N, dims.nz), jnp.float32)
    z0 = z0.at[:, :, : dims.nx].set(scen.xinit[:, None, :])
    lam0 = jnp.zeros((B, dims.N, problem.n_con), jnp.float32)
    f = jax.jit(jax.vmap(solve))
    t0 = time.perf_counter()
    res = f(scen.xinit, scen.params, z0, lam0)
    jax.block_until_ready(res.z)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = f(scen.xinit, scen.params, z0, lam0)
        jax.block_until_ready(res.z)
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"B={B:5d} compile={compile_s:7.1f}s exec={t*1000:9.1f}ms "
          f"solves/s={B/t:9.1f}", flush=True)
