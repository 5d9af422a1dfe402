"""Free-space decomposition: lidar point clouds -> K halfplane constraints.

TPU-native re-design of reference ``robotmpcs/utils/free_space_decomposition.py``:
the greedy carve loop (take nearest point, cut a halfplane through it with the
normal toward the robot, discard points the plane already separates, repeat)
is already fixed-size-friendly; here it is a ``lax.fori_loop`` over exactly K
iterations with a validity mask, so the whole decomposition is jittable and
vmappable over (stage, scenario) batches — the reference runs it N times per
control step in Python/numpy (``examples/boxer_example.py:193-201``).

Reference bug fixed, not replicated: ``aslist`` pads empty slots with a plane
through the robot position itself (argument order swapped vs ``asdict``,
``free_space_decomposition.py:118-129``), which would violate the clearance
constraint identically; both APIs here pad with the far dummy plane of
``asdict`` (:103-116).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

_FAR = 1.0e6


@partial(jax.jit, static_argnames=("number_constraints",))
def free_space_halfplanes(
    points: jnp.ndarray,
    position: jnp.ndarray,
    number_constraints: int = 10,
    max_radius: float = 1.0,
) -> jnp.ndarray:
    """Greedy free-space carve, fixed output size.

    ``points``: (P, 3) point cloud (pad with far points for fixed arity);
    ``position``: (3,) robot position. Returns (K, 4) planes
    ``[a, b, c, d]`` with ``a x + b y + c z + d = 0`` and the robot on the
    positive side, exactly the reference's ``HalfPlane.constraint()`` layout.
    Unused slots hold the far dummy plane (robot-side positive, ~28 m away).
    """
    position = position.astype(jnp.float32)
    pts = points.astype(jnp.float32)
    d2 = jnp.sum((pts - position) ** 2, axis=1)
    valid = d2 < max_radius**2

    # dummy plane through position + (20, 20, 0) with normal toward the robot
    dummy_point = position + jnp.array([20.0, 20.0, 0.0], jnp.float32)
    dummy_n = position - dummy_point
    dummy = jnp.concatenate([dummy_n, -jnp.dot(dummy_n, dummy_point)[None]])

    def body(_, carry):
        valid, planes, count = carry
        dist = jnp.where(valid, d2, _FAR)
        idx = jnp.argmin(dist)
        any_left = dist[idx] < _FAR
        point = pts[idx]
        normal = position - point
        const = -jnp.dot(normal, point)
        plane = jnp.concatenate([normal, const[None]])
        plane = jnp.where(any_left, plane, dummy)
        planes = planes.at[count].set(
            jnp.where(count < number_constraints, plane, planes[count])
        )
        # drop points the new plane already separates ("behind" it,
        # reference free_space_decomposition.py:16-20,88-98)
        behind = pts @ plane[:3] + plane[3] <= 0.0
        valid = valid & ~behind & jnp.broadcast_to(any_left, valid.shape)
        count = count + jnp.where(any_left, 1, 0)
        return valid, planes, count

    planes0 = jnp.tile(dummy, (number_constraints, 1))
    _, planes, _ = jax.lax.fori_loop(
        0, number_constraints, body, (valid, planes0, jnp.asarray(0, jnp.int32))
    )
    return planes


class HalfPlane:
    """Host-side halfplane helper (API parity with the reference class)."""

    def __init__(self, point: np.ndarray, position: np.ndarray):
        self._normal_vector = np.asarray(position, float) - np.asarray(point, float)
        self._point = np.asarray(point, float)
        self._constant = -float(np.dot(self._normal_vector, self._point))

    def normal(self) -> np.ndarray:
        return self._normal_vector

    def point(self) -> np.ndarray:
        return self._point

    def constant(self) -> float:
        return self._constant

    def point_behind_plane(self, point) -> bool:
        return float(np.dot(self.normal(), point) + self.constant()) <= 0.0

    def point_infront_plane(self, point) -> bool:
        return not self.point_behind_plane(point)

    def constraint(self) -> np.ndarray:
        return np.concatenate((self.normal(), np.array([self.constant()])))

    def get_points(self) -> np.ndarray:
        """Two points spanning the plane's 2D line (for plotting)."""
        n = self.normal()
        if abs(n[1]) < 1e-12:
            x = np.array([self._point[0], self._point[0]])
            return np.array([x, np.array([-5.0, 5.0])])
        x = np.arange(0, 2) * 10.0 - 5.0
        y = (-self.constant() - n[0] * x) / n[1]
        return np.array([x, y])


class FreeSpaceDecomposition:
    """Host-facing wrapper with the reference's stateful API
    (``set_position`` / ``compute_constraints`` / ``asdict`` / ``aslist``);
    the core runs jitted on device."""

    def __init__(self, number_constraints: int = 10, max_radius: float = 1.0):
        self._number_constraints = number_constraints
        self._max_radius = max_radius
        self._position = np.zeros(3)
        self._planes = None

    def set_position(self, position: np.ndarray) -> None:
        self._position = np.asarray(position, float)

    def compute_constraints(self, points: np.ndarray) -> None:
        pts = np.asarray(points, np.float32).reshape(-1, 3)
        self._planes = np.asarray(
            free_space_halfplanes(
                jnp.asarray(pts),
                jnp.asarray(self._position, jnp.float32),
                number_constraints=self._number_constraints,
                max_radius=self._max_radius,
            )
        )

    def constraints(self) -> List[HalfPlane]:
        """Non-dummy planes as HalfPlane objects."""
        out = []
        for plane in self._active_planes():
            n = plane[:3]
            point = self._nearest_point_on_plane(plane)
            out.append(HalfPlane(point, point + n))
        return out

    def _active_planes(self) -> np.ndarray:
        if self._planes is None:
            return np.zeros((0, 4))
        dummy_n = -np.array([20.0, 20.0, 0.0])
        mask = ~np.all(np.isclose(self._planes[:, :3], dummy_n, atol=1e-5), axis=1)
        return self._planes[mask]

    def _nearest_point_on_plane(self, plane: np.ndarray) -> np.ndarray:
        n = plane[:3]
        return -plane[3] * n / max(float(np.dot(n, n)), 1e-12)

    def asdict(self) -> dict:
        return {
            f"constraint_{i}": self._planes[i] for i in range(self._number_constraints)
        }

    def aslist(self) -> np.ndarray:
        return np.array(self._planes)

    def get_points(self) -> List[np.ndarray]:
        planes = []
        for plane in self._active_planes():
            n = plane[:3]
            if abs(n[1]) < 1e-12:
                point = self._nearest_point_on_plane(plane)
                planes.append(np.array([[point[0], point[0]], [-5.0, 5.0]]))
            else:
                x = np.arange(0, 2) * 10.0 - 5.0
                y = (-plane[3] - n[0] * x) / n[1]
                planes.append(np.array([x, y]))
        return planes
