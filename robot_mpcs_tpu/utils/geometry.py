"""Small geometry helpers shared by constraint components and perception."""

from __future__ import annotations

import jax.numpy as jnp


def point_to_plane(point: jnp.ndarray, plane: jnp.ndarray) -> jnp.ndarray:
    """Unsigned distance from point(s) to plane(s) ``ax + by + cz + d = 0``.

    ``point``: ``(..., 3)``, ``plane``: ``(..., 4)`` — broadcasting applies.
    Matches reference ``robotmpcs/utils/utils.py:48-52``.
    """
    normal = plane[..., :3]
    num = jnp.abs(jnp.sum(normal * point, axis=-1) + plane[..., 3])
    den = jnp.sqrt(jnp.sum(normal * normal, axis=-1) + 1e-12)
    return num / den
