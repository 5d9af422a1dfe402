"""Objective (stage cost) components.

Re-designs of reference ``robotmpcs/models/objectives/*``. The total stage
cost assembled in ``problem.py`` is

    sum(objective modules) + u' diag(wu) u + ws * s^2

matching ``ObjectiveManager.eval_objectives`` (reference
``ObjectiveManager.py:28-42``); the terminal cost equals the stage cost
(``eval_objectiveN``, :44-46).
"""

from __future__ import annotations

import jax.numpy as jnp

from robot_mpcs_tpu.models.components import (
    ModelContext,
    ObjectiveComponent,
    obstacle_distances,
)
from robot_mpcs_tpu.models.params import ParamMap


class GoalReaching(ObjectiveComponent):
    """``(fk_ee(q) - goal)' diag(wgoal) (fk_ee(q) - goal)``
    (reference ``goal_reaching.py:19-33``)."""

    name = "GoalReaching"

    def register_params(self, pm: ParamMap) -> None:
        pm.register("goal", self.dims.m)
        pm.register("wgoal", self.dims.m)

    def eval_objective(self, z, p, pm):
        q, _, _ = self.dims.extract_variables(z)
        pos_ee = self.ctx.kin.fk_pos(q, self.ctx.robot.end_link)[: self.dims.m]
        err = pos_ee - pm.get(p, "goal")
        return jnp.sum(pm.get(p, "wgoal") * err * err)


class ConstraintAvoidance(ObjectiveComponent):
    """Soft inverse-clearance repulsion from constraint boundaries.

    Reference ``constraint_avoidance.py:22-31`` adds, for each constraint
    module i, ``w_i / c_i0`` (only the module's FIRST inequality row) once per
    horizon stage index — i.e. the term is scaled by N inside a single stage
    cost. We reproduce that weighting (``N * w_i / c_i0``) so reference
    configs tune identically, and guard the reciprocal against division by
    values near zero.
    """

    name = "ConstraintAvoidance"

    def __init__(self, ctx: ModelContext, ineq_modules=()):
        super().__init__(ctx)
        self.ineq_modules = list(ineq_modules)

    def register_params(self, pm: ParamMap) -> None:
        pm.register("wconstr", len(self.ctx.mpc.constraints))

    def eval_objective(self, z, p, pm):
        w = pm.get(p, "wconstr")
        total = jnp.zeros((), dtype=z.dtype)
        for i, module in enumerate(self.ineq_modules):
            c = module.eval_constraint(z, p, pm)
            if c.shape[0] == 0:
                continue
            c0 = c[0]
            # avoid the pole: clamp the reciprocal argument away from zero
            # (keeping its sign; exactly-zero clearance counts as positive)
            safe = jnp.where(c0 >= 0, jnp.maximum(c0, 1e-3), jnp.minimum(c0, -1e-3))
            total = total + self.dims.N * w[i] / safe
        return total


class GoalMpcObjective(ObjectiveComponent):
    """Legacy monolithic objective (reference ``goal_mpc_objective.py:26-61``):
    goal tracking + velocity damping + inverse-square obstacle repulsion.

    The reference version references an unregistered ``wobst`` parameter
    (``goal_mpc_objective.py:51``) — here it is registered properly. The
    control-penalty term of the reference variant is provided by the shared
    assembly (wu), not duplicated here.
    """

    name = "GoalMpcObjective"

    def register_params(self, pm: ParamMap) -> None:
        pm.register("wvel", self.dims.nx - self.dims.n)
        pm.register("w", self.dims.m)
        if self.dims.ns > 0:
            pm.register("ws", 1)
        pm.register("g", self.dims.m)
        pm.register("wobst", 1)

    def eval_objective(self, z, p, pm):
        q, _, _ = self.dims.extract_variables(z)
        vel = z[..., self.dims.n : self.dims.nx]
        pos_ee = self.ctx.kin.fk_pos(q, self.ctx.robot.end_link)[: self.dims.m]
        err = pos_ee - pm.get(p, "g")
        j_goal = jnp.sum(pm.get(p, "w") * err * err)
        j_vel = jnp.sum(pm.get(p, "wvel") * vel * vel)
        if "obst" in pm:
            inv = 1.0 / jnp.maximum(obstacle_distances(self.ctx, q, p, pm), 1e-3)
            j_obst = pm.get(p, "wobst")[0] * jnp.sum(inv * inv)
        else:
            j_obst = jnp.zeros((), dtype=z.dtype)
        return j_goal + j_vel + j_obst


OBJECTIVE_REGISTRY = {
    cls.name: cls for cls in (GoalReaching, ConstraintAvoidance, GoalMpcObjective)
}
