"""Pure-JAX forward kinematics compiled from a URDF kinematic tree.

TPU-native replacement for the reference's casadi symbolic FK
(``GenericURDFFk`` used at reference ``robotmpcs/models/mpcBase.py:46-51`` and
evaluated per collision link in ``mpcBase.py:82-101``): the kinematic chain is
resolved to a static sequence of homogeneous-transform segments at build time
(Python, once), and evaluation is a short fixed chain of 4x4 matrix products —
fully traceable, differentiable (``jax.jacfwd``) and vmappable over scenario
batches.

Configuration-vector layout (matches reference ``mpcBase.py:54-61``):

* ``holonomic``: ``q`` = the ``n`` actuated joints on the root->end chain.
* ``diffdrive``: ``q[0:3]`` = planar base pose ``(x, y, theta)`` composed as a
  world->root transform, ``q[3:]`` = actuated arm joints.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robot_mpcs_tpu.models.urdf import (
    Joint,
    UrdfModel,
    joint_origin_transform,
    load_urdf,
)

# segment kinds
_FIXED = 0
_REVOLUTE = 1
_PRISMATIC = 2


@dataclass(frozen=True)
class _Segment:
    """One step of a compiled chain: constant pre-transform, then joint motion."""

    kind: int
    pre: np.ndarray  # (4, 4) constant transform (joint <origin>, fused fixed joints)
    axis: np.ndarray  # (3,) unit axis in the joint frame
    q_index: int  # index into q, -1 for fixed


def _rotation_about_axis(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation about a constant unit axis (3,) by a traced angle."""
    kx, ky, kz = axis[0], axis[1], axis[2]
    K = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]], dtype=angle.dtype)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=angle.dtype) + s * K + (1.0 - c) * (K @ K)


def planar_base_transform(x: jnp.ndarray, y: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """World->base transform for a differential-drive base: Rz(theta) at (x, y, 0)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero, x]),
            jnp.stack([s, c, zero, y]),
            jnp.stack([zero, zero, one, zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )


def _compile_chain(
    model: UrdfModel,
    root_link: str,
    target_link: str,
    q_index_of_joint: Dict[str, int],
) -> List[_Segment]:
    """Compile the root->target chain into segments, fusing fixed transforms."""
    segments: List[_Segment] = []
    pending = np.eye(4)
    for joint in model.chain(root_link, target_link):
        pending = pending @ joint_origin_transform(joint)
        if not joint.actuated:
            continue
        if joint.name not in q_index_of_joint:
            raise ValueError(
                f"link {target_link!r} depends on actuated joint {joint.name!r} "
                f"that is not part of the configured root->end chain"
            )
        axis = np.asarray(joint.axis, dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        kind = _PRISMATIC if joint.type == "prismatic" else _REVOLUTE
        segments.append(_Segment(kind, pending, axis, q_index_of_joint[joint.name]))
        pending = np.eye(4)
    if not np.allclose(pending, np.eye(4)):
        segments.append(_Segment(_FIXED, pending, np.zeros(3), -1))
    return segments


class RobotKinematics:
    """Forward kinematics for one robot, compiled once per (urdf, root, end).

    Parameters mirror the reference robot config (``mpcBase.py:24-31``):
    ``root_link``/``end_link`` define the main chain (and the q layout),
    ``base_type`` selects holonomic vs diff-drive base composition.
    """

    def __init__(
        self,
        model: UrdfModel,
        root_link: str,
        end_link: str,
        base_type: str = "holonomic",
    ):
        if base_type not in ("holonomic", "diffdrive"):
            raise ValueError(f"unknown base_type {base_type!r}")
        self.model = model
        self.base_type = base_type
        # The reference's pointRobot config names a root link that does not
        # exist in the URDF; fall back to the tree root like UrdfModel.chain.
        self.root_link = root_link if root_link in model.links else model.root_link
        self.end_link = end_link
        self._base_offset = 3 if base_type == "diffdrive" else 0

        arm_joints = model.actuated_joints(self.root_link, end_link)
        self.n_arm = len(arm_joints)
        #: total configuration dimension (reference ``mpcBase.py:54-61``)
        self.n = self.n_arm + self._base_offset
        self._q_index = {
            j.name: self._base_offset + i for i, j in enumerate(arm_joints)
        }
        self._chains: Dict[str, List[_Segment]] = {}
        self._compile(end_link)
        #: joint position limits of the chain joints, shape (n_arm, 2)
        self.joint_limits = np.array(
            [
                [j.lower if j.lower is not None else -np.inf,
                 j.upper if j.upper is not None else np.inf]
                for j in arm_joints
            ]
        ).reshape(self.n_arm, 2)

    @classmethod
    def from_urdf_file(
        cls, path: str, root_link: str, end_link: str, base_type: str = "holonomic"
    ) -> "RobotKinematics":
        return cls(load_urdf(path), root_link, end_link, base_type)

    def _compile(self, link: str) -> List[_Segment]:
        if link not in self._chains:
            self._chains[link] = _compile_chain(
                self.model, self.root_link, link, self._q_index
            )
        return self._chains[link]

    def _base_rp(self, q: jnp.ndarray):
        """(R, p) of the world->root transform."""
        dtype = q.dtype
        if self.base_type == "diffdrive":
            t = planar_base_transform(q[0], q[1], q[2]).astype(dtype)
            return t[:3, :3], t[:3, 3]
        return jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype=dtype)

    def _walk(self, R, p, segments, q):
        """Compose chain segments onto (R, p) in rotation/translation form
        (cheaper than 4x4 products: no constant rows, no buffer updates)."""
        for seg in segments:
            pre = jnp.asarray(seg.pre, dtype=q.dtype)
            # T <- T @ pre
            p = p + R @ pre[:3, 3]
            R = R @ pre[:3, :3]
            if seg.kind == _REVOLUTE:
                R = R @ _rotation_about_axis(
                    jnp.asarray(seg.axis, dtype=q.dtype), q[seg.q_index]
                )
            elif seg.kind == _PRISMATIC:
                p = p + R @ (jnp.asarray(seg.axis, dtype=q.dtype) * q[seg.q_index])
        return R, p

    def fk_frame(self, q: jnp.ndarray, link: Optional[str] = None) -> jnp.ndarray:
        """Homogeneous transform root->link as a function of q, shape (4, 4)."""
        link = link or self.end_link
        R0, p0 = self._base_rp(q)
        R, p = self._walk(R0, p0, self._compile(link), q)
        t = jnp.eye(4, dtype=q.dtype)
        return t.at[:3, :3].set(R).at[:3, 3].set(p)

    def fk_pos(self, q: jnp.ndarray, link: Optional[str] = None) -> jnp.ndarray:
        """Position of ``link`` in the root frame, shape (3,).

        Equivalent of the reference's ``fk(..., positionOnly=True)[0:3]``
        (``mpcBase.py:89-94``); differentiable via the analytic-Jacobian
        custom_jvp rule.
        """
        link = link or self.end_link
        return self._fk_ad((link,))(q)[0]

    @staticmethod
    def _seg_key(seg: _Segment):
        return (seg.kind, seg.q_index, seg.pre.tobytes(), seg.axis.tobytes())

    def _fk_pos_links_raw(self, q: jnp.ndarray, links: Sequence[str]) -> jnp.ndarray:
        """Stacked positions for several links, shape (len(links), 3).

        Shares common chain prefixes across links (serial-arm collision links
        all lie on the root->end path), so the whole set costs one walk of
        the longest chain instead of one walk per link.
        """
        R0, p0 = self._base_rp(q)
        cache = {(): (R0, p0)}
        out = []
        for link in links:
            key = ()
            R, p = R0, p0
            for seg in self._compile(link):
                new_key = key + (self._seg_key(seg),)
                if new_key in cache:
                    R, p = cache[new_key]
                else:
                    R, p = self._walk(R, p, [seg], q)
                    cache[new_key] = (R, p)
                key = new_key
            out.append(p)
        return jnp.stack(out)

    def fk_pos_links_with_jac(self, q: jnp.ndarray, links: Sequence[str]):
        """(positions (L, 3), geometric Jacobian (L, 3, n)) in one FK walk.

        The analytic Jacobian replaces forward-mode AD through the transform
        chain: a revolute joint j with world axis w_j and origin o_j moves a
        downstream point p by ``w_j x (p - o_j)`` per radian; a prismatic
        joint by ``w_j``; a diff-drive base contributes identity columns for
        (x, y) and ``z x (p - base)`` for theta. One chain walk + L*n cross
        products instead of n extra FK passes under ``jacfwd``.
        """
        dtype = q.dtype
        R0, p0 = self._base_rp(q)
        # cache: prefix -> (R, p, joint records [(q_index, kind, origin, axis_world)])
        cache = {(): (R0, p0, ())}
        P_rows, J_rows = [], []
        for link in links:
            key = ()
            R, p, recs = R0, p0, ()
            for seg in self._compile(link):
                new_key = key + (self._seg_key(seg),)
                if new_key in cache:
                    R, p, recs = cache[new_key]
                else:
                    pre = jnp.asarray(seg.pre, dtype=dtype)
                    p = p + R @ pre[:3, 3]
                    R = R @ pre[:3, :3]
                    if seg.kind == _REVOLUTE:
                        w = R @ jnp.asarray(seg.axis, dtype=dtype)
                        recs = recs + ((seg.q_index, _REVOLUTE, p, w),)
                        R = R @ _rotation_about_axis(
                            jnp.asarray(seg.axis, dtype=dtype), q[seg.q_index]
                        )
                    elif seg.kind == _PRISMATIC:
                        w = R @ jnp.asarray(seg.axis, dtype=dtype)
                        recs = recs + ((seg.q_index, _PRISMATIC, p, w),)
                        p = p + w * q[seg.q_index]
                    cache[new_key] = (R, p, recs)
                key = new_key
            cols = [jnp.zeros((3,), dtype)] * self.n
            if self.base_type == "diffdrive":
                base = jnp.stack([q[0], q[1], jnp.zeros((), dtype)])
                cols[0] = jnp.array([1.0, 0.0, 0.0], dtype)
                cols[1] = jnp.array([0.0, 1.0, 0.0], dtype)
                cols[2] = jnp.cross(jnp.array([0.0, 0.0, 1.0], dtype), p - base)
            for q_index, kind, origin, w in recs:
                cols[q_index] = jnp.cross(w, p - origin) if kind == _REVOLUTE else w
            P_rows.append(p)
            J_rows.append(jnp.stack(cols, axis=-1))  # (3, n)
        return jnp.stack(P_rows), jnp.stack(J_rows)

    def _fk_ad(self, links: Tuple[str, ...]):
        """custom_jvp-wrapped multi-link FK: the tangent rule uses the
        analytic geometric Jacobian, so ``jax.linearize``/``jacfwd`` over
        anything built on FK costs one FK walk + one (L, 3, n) Jacobian +
        a matvec per tangent (instead of one full FK pass per tangent)."""
        if not hasattr(self, "_ad_cache"):
            self._ad_cache = {}
        if links not in self._ad_cache:

            @jax.custom_jvp
            def fk(q):
                return self._fk_pos_links_raw(q, links)

            @fk.defjvp
            def fk_jvp(primals, tangents):
                (q,), (dq,) = primals, tangents
                P, J = self.fk_pos_links_with_jac(q, links)
                return P, jnp.einsum("lcn,n->lc", J, dq)

            self._ad_cache[links] = fk
        return self._ad_cache[links]

    def fk_pos_links(self, q: jnp.ndarray, links: Sequence[str]) -> jnp.ndarray:
        """Stacked positions for several links, shape (len(links), 3);
        differentiable via the analytic-Jacobian custom_jvp rule."""
        return self._fk_ad(tuple(links))(q)
