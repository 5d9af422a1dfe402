"""Base machinery for cost/constraint components.

The reference resolves component class names from config strings via
reflection (``InequalityManager.py:17-21``, ``ObjectiveManager.py:20-26``);
here components are pure functions over ``(z, p)`` registered in explicit
registries (see ``inequalities.py`` / ``objectives.py``), each returning
fixed-shape arrays so the whole stage evaluation is vmappable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp

from robot_mpcs_tpu.config import MpcConfiguration, RobotConfiguration
from robot_mpcs_tpu.models.dimensions import ProblemDimensions
from robot_mpcs_tpu.models.fk import RobotKinematics
from robot_mpcs_tpu.models.params import ParamMap

#: Barrier clamp: inverse-clearance barrier terms ``w / b`` are evaluated as
#: ``w / max(b, BARRIER_EPS)``. The reference's raw ``1/c`` becomes *negative*
#: on infeasible iterates (c < 0), rewarding the minimizer for diving through
#: obstacles — its interior-point solver never visits that region, but an AL
#: method does during intermediate iterations. The clamp caps the repulsion at
#: a large positive plateau (zero gradient inside violation; the hard AL
#: constraint supplies the restoring force) while matching the reference
#: exactly on the feasible set where b >= eps. Components emit RAW rows;
#: the clamp is applied by consumers (solver / eval_objective) so that
#: affine barrier rows keep a constant Jacobian.
BARRIER_EPS = 1e-3


def safe_barrier(b: jnp.ndarray, eps: float = BARRIER_EPS) -> jnp.ndarray:
    """Clamp a barrier denominator to be strictly positive."""
    return jnp.maximum(b, eps)


@dataclass
class ModelContext:
    """Static (trace-time) context shared by all components of one problem."""

    dims: ProblemDimensions
    kin: RobotKinematics
    mpc: MpcConfiguration
    robot: RobotConfiguration

    @property
    def collision_links(self) -> List[str]:
        return list(self.robot.collision_links)

    @property
    def self_collision_pairs(self) -> List[List[str]]:
        return self.robot.self_collision_pairs


class StageComponent:
    """A cost or constraint term evaluated per stage on ``(z, p)``.

    Subclasses declare parameters in ``register_params`` (run once, in config
    order — this fixes the paramMap ABI) and implement ``eval_*``.
    """

    name: str = "component"

    def __init__(self, ctx: ModelContext):
        self.ctx = ctx
        self.dims = ctx.dims

    def register_params(self, pm: ParamMap) -> None:  # pragma: no cover
        raise NotImplementedError


class InequalityComponent(StageComponent):
    #: number of inequality rows this component contributes per stage
    n_ineq: int = 0
    #: True iff the rows depend on z only through the configuration q
    #: (i.e. through forward kinematics). Such rows are differentiated with
    #: only n tangents in the solver's Gauss-Newton expansion; all other
    #: (affine) rows get constant build-time Jacobians. See
    #: ``MpcProblem.split_callbacks``.
    q_dependent: bool = False

    def eval_constraint(self, z: jnp.ndarray, p: jnp.ndarray, pm: ParamMap) -> jnp.ndarray:
        """Return ``(n_ineq,)`` values, feasible iff >= 0."""
        raise NotImplementedError

    def eval_constraint_q(self, q: jnp.ndarray, p: jnp.ndarray, pm: ParamMap) -> jnp.ndarray:
        """q-only view of ``eval_constraint`` (defined iff ``q_dependent``)."""
        raise NotImplementedError


class ObjectiveComponent(StageComponent):
    """Objective terms expose *structured* forms so the solver can build
    Gauss-Newton (PSD-by-construction) Hessians from one Jacobian pass:

    * ``residuals(z, p)`` -> ``(r, w)``: contributes ``sum(w * r^2)``;
    * ``barriers(z, p)`` -> ``(b, w)``: contributes ``sum(w / b)``.

    ``eval_objective`` (the scalar stage cost) is derived from these, so the
    two views cannot drift. Every reference objective fits this algebra
    (diagonal-weighted least squares + inverse-clearance barriers).
    """

    #: number of residual rows / barrier rows this component contributes
    n_res: int = 0
    n_bar: int = 0
    #: family split of the rows: q-dependent rows (differentiated with n
    #: tangents through FK) vs affine rows (constant build-time Jacobian).
    #: Invariant: n_res == n_res_q + n_res_aff, n_bar == n_bar_q + n_bar_aff.
    n_res_q: int = 0
    n_res_aff: int = 0
    n_bar_q: int = 0
    n_bar_aff: int = 0

    def residuals_q(self, q, p, pm):
        return jnp.zeros((0,), dtype=q.dtype), jnp.zeros((0,), dtype=q.dtype)

    def residuals_aff(self, z, p, pm):
        return jnp.zeros((0,), dtype=z.dtype), jnp.zeros((0,), dtype=z.dtype)

    def barriers_q(self, q, p, pm):
        return jnp.zeros((0,), dtype=q.dtype), jnp.zeros((0,), dtype=q.dtype)

    def barriers_aff(self, z, p, pm):
        return jnp.zeros((0,), dtype=z.dtype), jnp.zeros((0,), dtype=z.dtype)

    def residuals(self, z, p, pm):
        """Canonical view: q-family rows followed by affine rows."""
        q = z[..., : self.dims.n]
        rq, wq = self.residuals_q(q, p, pm)
        ra, wa = self.residuals_aff(z, p, pm)
        return jnp.concatenate([rq, ra]), jnp.concatenate([wq, wa])

    def barriers(self, z, p, pm):
        q = z[..., : self.dims.n]
        bq, wq = self.barriers_q(q, p, pm)
        ba, wa = self.barriers_aff(z, p, pm)
        return jnp.concatenate([bq, ba]), jnp.concatenate([wq, wa])

    def eval_objective(self, z: jnp.ndarray, p: jnp.ndarray, pm: ParamMap) -> jnp.ndarray:
        r, wr = self.residuals(z, p, pm)
        b, wb = self.barriers(z, p, pm)
        total = jnp.sum(wr * r * r)
        if b.shape[0]:
            total = total + jnp.sum(wb / safe_barrier(b))
        return total


def obstacle_distances(
    ctx: ModelContext, q: jnp.ndarray, p: jnp.ndarray, pm: ParamMap
) -> jnp.ndarray:
    """Signed clearances between collision links and sphere obstacles.

    Reference ``mpcBase.py:82-101`` (``eval_obstacleDistances``): for each
    collision link (outer) and obstacle slot (inner),
    ``||fk(q, link) - obst_pos|| - obst_radius - r_body``. Obstacle slots
    hold ``[x, y, z, radius]``; empty slots use the -100 sentinel padding
    which makes the clearance large and inactive. Returns
    ``(n_links * n_obst,)`` in link-major order.
    """
    dims = ctx.dims
    obst = pm.get(p, "obst").reshape(dims.n_obst, dims.m_obst + 1)
    r_body = pm.get(p, "r_body")[0]
    fk_pos = ctx.kin.fk_pos_links(q, ctx.collision_links)  # (L, 3)
    diff = fk_pos[:, None, :] - obst[None, :, : dims.m_obst]  # (L, n_obst, 3)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    clearance = dist - obst[None, :, dims.m_obst] - r_body
    return clearance.reshape(-1)
