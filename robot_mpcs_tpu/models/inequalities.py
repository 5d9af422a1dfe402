"""Inequality constraint components (feasible iff value >= 0).

Re-designs of reference ``robotmpcs/models/inequalities/*`` as fixed-shape
pure functions. Known reference bugs are fixed, not replicated:

* ``RadialConstraints.eval_constraint`` passes an undefined variable ``j``
  (reference ``RadialConstraints.py:22``) — here it evaluates the documented
  link x obstacle clearances;
* ``VelLimitConstraints`` declares ``_n_ineq = 2`` but emits 4 rows
  (``VelLimitConstraints.py:8`` vs :19-31) — here ``n_ineq`` is 4;
* the slack add in ``InequalityManager.eval_inequalities`` is a no-op
  (``InequalityManager.py:29-32`` rebinds the loop variable) — here slack is
  genuinely added to every row (the documented intent).
"""

from __future__ import annotations

import jax.numpy as jnp

from robot_mpcs_tpu.models.components import (
    InequalityComponent,
    ModelContext,
    obstacle_distances,
)
from robot_mpcs_tpu.models.params import ParamMap
from robot_mpcs_tpu.utils.geometry import point_to_plane


class JointLimitConstraints(InequalityComponent):
    """2n rows: ``[q_j - lb_j, ub_j - q_j]`` interleaved per dof
    (reference ``JointLimitConstraints.py:20-31``)."""

    name = "JointLimitConstraints"

    def __init__(self, ctx: ModelContext):
        super().__init__(ctx)
        self.n_ineq = 2 * self.dims.n

    def register_params(self, pm: ParamMap) -> None:
        pm.register("lower_limits", self.dims.n)
        pm.register("upper_limits", self.dims.n)

    def eval_constraint(self, z, p, pm):
        q, _, _ = self.dims.extract_variables(z)
        lb = pm.get(p, "lower_limits")
        ub = pm.get(p, "upper_limits")
        return jnp.stack([q - lb, ub - q], axis=-1).reshape(-1)


class VelLimitConstraints(InequalityComponent):
    """4 rows boxing the last two velocity components (diff-drive forward and
    angular velocity; reference ``VelLimitConstraints.py:19-31``)."""

    name = "VelLimitConstraints"

    def __init__(self, ctx: ModelContext):
        super().__init__(ctx)
        self.n_ineq = 4

    def register_params(self, pm: ParamMap) -> None:
        pm.register("lower_limits_vel", 2)
        pm.register("upper_limits_vel", 2)

    def eval_constraint(self, z, p, pm):
        _, qdot, _ = self.dims.extract_variables(z)
        vel = qdot[..., -2:]
        lb = pm.get(p, "lower_limits_vel")
        ub = pm.get(p, "upper_limits_vel")
        return jnp.stack([vel - lb, ub - vel], axis=-1).reshape(-1)


class InputLimitConstraints(InequalityComponent):
    """2·nu rows boxing ``u = z[-nu:]`` (reference ``InputLimitConstraints.py:18-29``)."""

    name = "InputLimitConstraints"

    def __init__(self, ctx: ModelContext):
        super().__init__(ctx)
        self.n_ineq = 2 * self.dims.nu

    def register_params(self, pm: ParamMap) -> None:
        pm.register("lower_limits_u", self.dims.nu)
        pm.register("upper_limits_u", self.dims.nu)

    def eval_constraint(self, z, p, pm):
        u = z[..., -self.dims.nu :]
        lb = pm.get(p, "lower_limits_u")
        ub = pm.get(p, "upper_limits_u")
        return jnp.stack([u - lb, ub - u], axis=-1).reshape(-1)


class RadialConstraints(InequalityComponent):
    """Sphere-obstacle clearances per (collision link x obstacle slot)
    (reference ``RadialConstraints.py`` + ``mpcBase.py:82-101``)."""

    name = "RadialConstraints"
    q_dependent = True

    def __init__(self, ctx: ModelContext):
        super().__init__(ctx)
        self.n_ineq = self.dims.n_obst * len(ctx.collision_links)

    def register_params(self, pm: ParamMap) -> None:
        pm.register("r_body", 1)
        pm.register("obst", (self.dims.m_obst + 1) * self.dims.n_obst)

    def eval_constraint(self, z, p, pm):
        q, _, _ = self.dims.extract_variables(z)
        return self.eval_constraint_q(q, p, pm)

    def eval_constraint_q(self, q, p, pm):
        return obstacle_distances(self.ctx, q, p, pm)


class LinearConstraints(InequalityComponent):
    """Halfplane clearances: ``point_to_plane(fk(q, link), plane) - r_body``
    per (collision link x plane slot) (reference ``LinearConstraints.py:25-40``).
    Plane slots are per-stage parameters ``lin_constrs_<i>`` = [a, b, c, d]."""

    name = "LinearConstraints"
    q_dependent = True

    def __init__(self, ctx: ModelContext):
        super().__init__(ctx)
        self.n_ineq = self.dims.n_obst * len(ctx.collision_links)

    def register_params(self, pm: ParamMap) -> None:
        pm.register("r_body", 1)
        for i in range(self.dims.n_obst):
            pm.register(f"lin_constrs_{i}", 4)

    def eval_constraint(self, z, p, pm):
        q, _, _ = self.dims.extract_variables(z)
        return self.eval_constraint_q(q, p, pm)

    def eval_constraint_q(self, q, p, pm):
        fk_pos = self.ctx.kin.fk_pos_links(q, self.ctx.collision_links)  # (L, 3)
        r_body = pm.get(p, "r_body")[0]
        planes = jnp.stack(
            [pm.get(p, f"lin_constrs_{i}") for i in range(self.dims.n_obst)]
        )  # (n_obst, 4)
        dists = point_to_plane(fk_pos[:, None, :], planes[None, :, :])  # (L, n_obst)
        return (dists - r_body).reshape(-1)


class SelfCollisionAvoidanceConstraints(InequalityComponent):
    """One row per configured link pair: ``||fk(l1) - fk(l2)|| - 2 r_body``
    (reference ``SelfCollisionAvoidanceConstraints.py:18-27``)."""

    name = "SelfCollisionAvoidanceConstraints"
    q_dependent = True

    def __init__(self, ctx: ModelContext):
        super().__init__(ctx)
        self.pairs = ctx.self_collision_pairs
        self.n_ineq = len(self.pairs)

    def register_params(self, pm: ParamMap) -> None:
        pm.register("r_body", 1)

    def eval_constraint(self, z, p, pm):
        q, _, _ = self.dims.extract_variables(z)
        return self.eval_constraint_q(q, p, pm)

    def eval_constraint_q(self, q, p, pm):
        if not self.pairs:
            return jnp.zeros((0,), dtype=q.dtype)
        r_body = pm.get(p, "r_body")[0]
        rows = []
        for l1, l2 in self.pairs:
            d = self.ctx.kin.fk_pos(q, l1) - self.ctx.kin.fk_pos(q, l2)
            rows.append(jnp.sqrt(jnp.sum(d * d) + 1e-12) - 2.0 * r_body)
        return jnp.stack(rows)


INEQUALITY_REGISTRY = {
    cls.name: cls
    for cls in (
        JointLimitConstraints,
        VelLimitConstraints,
        InputLimitConstraints,
        RadialConstraints,
        LinearConstraints,
        SelfCollisionAvoidanceConstraints,
    )
}
