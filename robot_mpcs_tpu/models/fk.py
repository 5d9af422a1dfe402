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
        (``mpcBase.py:89-94``).
        """
        link = link or self.end_link
        R0, p0 = self._base_rp(q)
        _, p = self._walk(R0, p0, self._compile(link), q)
        return p

    @staticmethod
    def _seg_key(seg: _Segment):
        return (seg.kind, seg.q_index, seg.pre.tobytes(), seg.axis.tobytes())

    def fk_pos_links(self, q: jnp.ndarray, links: Sequence[str]) -> jnp.ndarray:
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
