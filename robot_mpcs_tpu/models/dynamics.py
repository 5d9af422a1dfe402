"""Continuous robot dynamics and explicit integrators, pure JAX.

Replaces the reference's casadi dynamics callbacks handed to ForcesPro:

* holonomic double integrator ``xdot = [qdot, u]``
  (reference ``robotmpcs/models/mpcModel.py:65-69``);
* diff-drive unicycle kinematics with velocity-level integration
  (reference ``robotmpcs/models/diff_drive_mpc_model.py:24-41``);
* ERK2 fixed-step integration matching ForcesPro's
  ``integrator.type='ERK2', Ts=dt, nodes=5`` (``mpcModel.py:118-120``).

All functions are shaped for a single (x, u) pair; batching is done with
``jax.vmap`` at the call site, which XLA turns into batched elementwise/VPU
work (the state dims are tiny: nx <= 16).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from robot_mpcs_tpu.models.dimensions import ProblemDimensions

DynamicsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def holonomic_dynamics(dims: ProblemDimensions) -> DynamicsFn:
    """Double integrator: ``d[q, qdot]/dt = [qdot, u]`` (mpcModel.py:65-69)."""

    def f(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([x[dims.n : dims.nx], u])

    return f


def diffdrive_dynamics(dims: ProblemDimensions) -> DynamicsFn:
    """Unicycle base + optional arm, velocity-level controls.

    State ``x = [q(n), qdot(n), vel(2)]`` with ``q[:3] = (x, y, theta)`` base
    pose and ``vel = (v_forward, omega)``; control ``u = [a_v, a_omega,
    arm_qddot...]``. The base rows of ``qdot`` are structurally zero and stay
    zero, exactly like the reference's ``xddot = zeros(3)``
    (``diff_drive_mpc_model.py:24-41``); the reference's boxer case
    (``n_arm = 0``) reduces to ``state_dot = [unicycle, zeros(3), u]``.
    """
    n = dims.n

    def f(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        theta = x[2]
        v, omega = x[2 * n], x[2 * n + 1]
        base_qdot = jnp.stack([jnp.cos(theta) * v, jnp.sin(theta) * v, omega])
        arm_qdot = x[n + 3 : 2 * n]  # arm rows of qdot
        zeros3 = jnp.zeros(3, dtype=x.dtype)
        arm_qddot = u[2:]
        veldot = u[:2]
        return jnp.concatenate([base_qdot, arm_qdot, zeros3, arm_qddot, veldot])

    return f


def make_continuous_dynamics(dims: ProblemDimensions) -> DynamicsFn:
    if dims.base_type == "holonomic":
        return holonomic_dynamics(dims)
    return diffdrive_dynamics(dims)


def make_discrete_dynamics(
    dims: ProblemDimensions,
    dt: float,
    integrator: str = "erk2",
    substeps: int = 4,
) -> DynamicsFn:
    """Explicit fixed-step integrator ``x_{k+1} = F(x_k, u_k)``.

    ``erk2`` is the midpoint method; ``substeps`` sub-intervals over one
    control period ``dt`` (the reference's ForcesPro config uses ERK2 with 5
    nodes = 4 sub-intervals, ``mpcModel.py:118-120``). The substep loop is
    unrolled at trace time (static and small), letting XLA fuse the whole
    integrator into one fused kernel per stage.
    """
    f = make_continuous_dynamics(dims)
    h = dt / substeps

    def step_euler(x, u):
        return x + h * f(x, u)

    def step_erk2(x, u):
        k1 = f(x, u)
        k2 = f(x + 0.5 * h * k1, u)
        return x + h * k2

    def step_erk4(x, u):
        k1 = f(x, u)
        k2 = f(x + 0.5 * h * k1, u)
        k3 = f(x + 0.5 * h * k2, u)
        k4 = f(x + h * k3, u)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    step = {"euler": step_euler, "erk2": step_erk2, "erk4": step_erk4}[integrator]

    def F(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        for _ in range(substeps):
            x = step(x, u)
        return x

    if dims.base_type == "holonomic":
        # The double integrator is LINEAR, so any explicit RK scheme is an
        # exact affine map with zero offset: F(x, u) = A_d x + B_d u. Fold
        # the whole substep chain into two constant matrices once at build
        # time — the rollout/forward scans then do one matvec per stage
        # instead of `substeps` RK stages (identical values, fewer
        # sequential ops in the solver's hot scans).
        import jax

        from robot_mpcs_tpu.utils.devices import local_cpu_device
        import numpy as np

        # Build-time constants: run the eager jacfwd on the CPU backend —
        # on the TPU each of the dozens of tiny ops would compile its own
        # mini-program (~45 s cold per process, measured on axon).
        with jax.default_device(local_cpu_device()):
            x0 = jnp.zeros((dims.nx,), jnp.float32)
            u0 = jnp.zeros((dims.nu,), jnp.float32)
            A_d = jnp.asarray(np.asarray(jax.jacfwd(F, argnums=0)(x0, u0)))
            B_d = jnp.asarray(np.asarray(jax.jacfwd(F, argnums=1)(x0, u0)))

        def F_linear(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
            return A_d.astype(x.dtype) @ x + B_d.astype(x.dtype) @ u

        return F_linear

    return F


def constant_dynamics_jacobians(dims: ProblemDimensions, F: DynamicsFn):
    """If the discrete dynamics are linear (holonomic double integrator,
    ``mpcModel.py:65-69``), return the constant Jacobians (A, B) computed
    once at build time — removing per-stage/per-iteration Jacobian work from
    the solver's hot loop. Returns None for nonlinear (diffdrive) dynamics.
    """
    if dims.base_type != "holonomic":
        return None
    import jax
    import numpy as np

    from robot_mpcs_tpu.utils.devices import local_cpu_device

    # build-time constants on the CPU backend (see make_discrete_dynamics)
    with jax.default_device(local_cpu_device()):
        x0 = jnp.zeros((dims.nx,), jnp.float32)
        u0 = jnp.zeros((dims.nu,), jnp.float32)
        A = np.asarray(jax.jacfwd(F, argnums=0)(x0, u0))
        B = np.asarray(jax.jacfwd(F, argnums=1)(x0, u0))

    return A, B
