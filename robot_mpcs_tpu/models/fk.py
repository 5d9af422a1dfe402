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

    # ---------------- scalarized batch rules --------------------------------
    # Under ``vmap`` the per-lane 3x3 chain products become huge batches of
    # tiny matmuls, which XLA lowers to CONVOLUTIONS with GB-scale
    # intermediate traffic (measured: 3.7 GB / 5.7 ms for one B=4096, N=20
    # panda fk_pos_links sweep — the single hottest op in the whole solver).
    # The batched rules below re-express the walk in structure-of-arrays
    # form: every rotation-matrix entry is ONE batched scalar, the entire
    # chain is elementwise FMAs + one sin/cos pair per joint, and XLA fuses
    # it into a single VPU loop (measured ~0.15 ms for the same sweep, 38x).
    # ``custom_vmap`` dispatches to them whenever the FK primitive is
    # batched, so every existing call site gets the fast path untouched.

    def _walk_scalar(self, qB, links, want_jac: bool):
        """Structure-of-arrays FK walk over a batch axis.

        ``qB``: (B, n). Returns ``(P, J)`` with P (B, L, 3) and J
        (B, L, 3, n) (J is None unless ``want_jac``). Matrix entries are
        python floats (build-time constants, folded) or (B,) arrays; the
        per-link prefix cache mirrors ``_fk_pos_links_raw``.
        """
        dtype = qB.dtype
        bshape = qB.shape[:-1]

        def mul(a, b):
            if isinstance(a, float) and isinstance(b, float):
                return a * b
            if isinstance(a, float) and a == 0.0:
                return 0.0
            if isinstance(b, float) and b == 0.0:
                return 0.0
            if isinstance(a, float) and a == 1.0:
                return b
            if isinstance(b, float) and b == 1.0:
                return a
            return a * b

        def add(*terms):
            out = 0.0
            for t in terms:
                if isinstance(t, float) and t == 0.0:
                    continue
                out = t if isinstance(out, float) and out == 0.0 else out + t
            return out

        def mm(A, B):  # 3x3 scalar-matrix product
            return [
                [add(*(mul(A[i][k], B[k][j]) for k in range(3))) for j in range(3)]
                for i in range(3)
            ]

        def mv(A, v):  # 3x3 @ 3
            return [add(*(mul(A[i][k], v[k]) for k in range(3))) for i in range(3)]

        def cross(a, b):
            return [
                add(mul(a[1], b[2]), mul(-1.0, mul(a[2], b[1]))),
                add(mul(a[2], b[0]), mul(-1.0, mul(a[0], b[2]))),
                add(mul(a[0], b[1]), mul(-1.0, mul(a[1], b[0]))),
            ]

        def materialize(v):
            if isinstance(v, float):
                return jnp.full(bshape, v, dtype)
            return v

        if self.base_type == "diffdrive":
            c, s = jnp.cos(qB[..., 2]), jnp.sin(qB[..., 2])
            R0 = [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]
            p0 = [qB[..., 0], qB[..., 1], 0.0]
        else:
            R0 = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
            p0 = [0.0, 0.0, 0.0]

        # cache: prefix key -> (R, p, joint records)
        cache = {(): (R0, p0, ())}
        P_out, J_out = [], []
        for link in links:
            key = ()
            R, p, recs = R0, p0, ()
            for seg in self._compile(link):
                new_key = key + (self._seg_key(seg),)
                if new_key in cache:
                    R, p, recs = cache[new_key]
                else:
                    pre = np.asarray(seg.pre, dtype=np.float64)
                    preR = [[float(pre[i, j]) for j in range(3)] for i in range(3)]
                    pret = [float(pre[i, 3]) for i in range(3)]
                    p = [add(p[i], mv(R, pret)[i]) for i in range(3)]
                    R = mm(R, preR)
                    if seg.kind == _REVOLUTE:
                        qj = qB[..., seg.q_index]
                        s, c = jnp.sin(qj), jnp.cos(qj)
                        ax = seg.axis
                        K = np.array(
                            [
                                [0.0, -ax[2], ax[1]],
                                [ax[2], 0.0, -ax[0]],
                                [-ax[1], ax[0], 0.0],
                            ]
                        )
                        K2 = K @ K
                        I3 = np.eye(3)
                        # R_axis[i][j] = I + s K + (1 - c) K^2
                        Ra = [
                            [
                                add(
                                    float(I3[i, j] + K2[i, j]),
                                    mul(s, float(K[i, j])),
                                    mul(c, float(-K2[i, j])),
                                )
                                for j in range(3)
                            ]
                            for i in range(3)
                        ]
                        if want_jac:
                            w = mv(R, [float(a) for a in ax])
                            recs = recs + ((seg.q_index, _REVOLUTE, tuple(p), tuple(w)),)
                        R = mm(R, Ra)
                    elif seg.kind == _PRISMATIC:
                        qj = qB[..., seg.q_index]
                        w = mv(R, [float(a) for a in seg.axis])
                        if want_jac:
                            recs = recs + ((seg.q_index, _PRISMATIC, tuple(p), tuple(w)),)
                        p = [add(p[i], mul(w[i], qj)) for i in range(3)]
                    cache[new_key] = (R, p, recs)
                key = new_key
            P_out.append(jnp.stack([materialize(v) for v in p], axis=-1))
            if want_jac:
                cols = [[0.0, 0.0, 0.0] for _ in range(self.n)]
                if self.base_type == "diffdrive":
                    base = [qB[..., 0], qB[..., 1], 0.0]
                    cols[0] = [1.0, 0.0, 0.0]
                    cols[1] = [0.0, 1.0, 0.0]
                    d = [add(p[i], mul(-1.0, base[i])) for i in range(3)]
                    cols[2] = cross([0.0, 0.0, 1.0], d)
                for q_index, kind, origin, w in recs:
                    if kind == _REVOLUTE:
                        d = [add(p[i], mul(-1.0, origin[i])) for i in range(3)]
                        cols[q_index] = cross(list(w), d)
                    else:
                        cols[q_index] = list(w)
                J_out.append(
                    jnp.stack(
                        [
                            jnp.stack([materialize(cols[j][i]) for j in range(self.n)], axis=-1)
                            for i in range(3)
                        ],
                        axis=-2,
                    )
                )  # (B, 3, n)
        P = jnp.stack(P_out, axis=-2)  # (B, L, 3)
        J = jnp.stack(J_out, axis=-3) if want_jac else None  # (B, L, 3, n)
        return P, J

    def _with_jac_cv(self, links: Tuple[str, ...]):
        """custom_vmap-wrapped (P, J) FK used by the custom_jvp tangent rule."""
        if not hasattr(self, "_wj_cache"):
            self._wj_cache = {}
        if links not in self._wj_cache:

            @jax.custom_batching.custom_vmap
            def with_jac(q):
                return self.fk_pos_links_with_jac(q, links)

            @with_jac.def_vmap
            def _rule(axis_size, in_batched, q):
                if not in_batched[0]:  # q closed over; nothing to scalarize
                    P, J = self.fk_pos_links_with_jac(q, links)
                    return (P, J), (False, False)
                P, J = self._walk_scalar(q, links, want_jac=True)
                return (P, J), (True, True)

            self._wj_cache[links] = with_jac
        return self._wj_cache[links]

    def _fk_ad(self, links: Tuple[str, ...]):
        """custom_jvp-wrapped multi-link FK: the tangent rule uses the
        analytic geometric Jacobian, so ``jax.linearize``/``jacfwd`` over
        anything built on FK costs one FK walk + one (L, 3, n) Jacobian +
        a matvec per tangent (instead of one full FK pass per tangent).
        Both the primal and the (P, J) evaluation carry scalarized
        custom_vmap batch rules (see ``_walk_scalar``)."""
        if not hasattr(self, "_ad_cache"):
            self._ad_cache = {}
        if links not in self._ad_cache:

            @jax.custom_batching.custom_vmap
            def fk_raw(q):
                return self._fk_pos_links_raw(q, links)

            @fk_raw.def_vmap
            def _rule(axis_size, in_batched, q):
                if not in_batched[0]:  # q closed over; nothing to scalarize
                    return self._fk_pos_links_raw(q, links), False
                P, _ = self._walk_scalar(q, links, want_jac=False)
                return P, True

            @jax.custom_jvp
            def fk(q):
                return fk_raw(q)

            @fk.defjvp
            def fk_jvp(primals, tangents):
                (q,), (dq,) = primals, tangents
                P, J = self._with_jac_cv(links)(q)
                # multiply-sum instead of einsum: dot_general with tiny
                # contraction dims lowers to convolutions under vmap
                return P, jnp.sum(J * dq[..., None, None, :], axis=-1)

            self._ad_cache[links] = fk
        return self._ad_cache[links]

    def fk_pos_links(self, q: jnp.ndarray, links: Sequence[str]) -> jnp.ndarray:
        """Stacked positions for several links, shape (len(links), 3);
        differentiable via the analytic-Jacobian custom_jvp rule."""
        return self._fk_ad(tuple(links))(q)
