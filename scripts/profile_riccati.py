"""TPU check + timing: pallas Riccati kernel vs vmapped scan backward."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tests.test_riccati_pallas import _random_lqr, _scan_backward
from robot_mpcs_tpu.ops.riccati_pallas import riccati_backward_batched

B = int(os.environ.get("B", "4096"))
nx, nw, N = 14, 7, 20
data = list(_random_lqr(B, N, nx, nw))
# production case: constant dynamics Jacobians (holonomic panda)
A_const, B_const = np.asarray(data[5])[0], np.asarray(data[6])[0]
data[5] = jnp.asarray(np.broadcast_to(A_const, (B, N, nx, nx)))
data[6] = jnp.asarray(np.broadcast_to(B_const, (B, N, nx, nw)))
data_const = data[:5] + [jnp.asarray(A_const), jnp.asarray(B_const)] + data[7:]

backward = _scan_backward(nx, nw, N)
scan_f = jax.jit(jax.vmap(lambda *a: backward(*a)))
pal_f = jax.jit(lambda *a: riccati_backward_batched(*a, N=N, nx=nx, nw=nw))
scan_data, pal_data = data, data_const

for name, f, d in (("scan", scan_f, scan_data), ("pallas", pal_f, pal_data)):
    out = f(*d)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*d)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"{name}: {dt*1000:8.2f} ms", flush=True)

k_s, K_s, f_s = scan_f(*scan_data)
k_p, K_p, f_p = pal_f(*pal_data)
err_k = float(jnp.max(jnp.abs(k_s - k_p)))
err_K = float(jnp.max(jnp.abs(K_s - K_p)))
print(f"maxdiff k_ff={err_k:.2e} K={err_K:.2e} failed agree="
      f"{bool(jnp.all(f_s == f_p))}")
