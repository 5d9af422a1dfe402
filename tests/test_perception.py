"""Free-space decomposition tests vs a direct numpy re-implementation."""

import jax.numpy as jnp
import numpy as np

from robot_mpcs_tpu.perception.free_space_decomposition import (
    FreeSpaceDecomposition,
    free_space_halfplanes,
)


def _oracle_fsd(points, position, K, max_radius):
    """Direct numpy transcription of the greedy carve (independent path)."""
    planes = []
    pts = np.asarray(points, float)
    dists = np.linalg.norm(pts - position, axis=1)
    order = np.argsort(dists)
    pts = pts[order]
    pts = pts[np.sort(dists)[: len(pts)] < max_radius] if False else pts[
        dists[order] < max_radius
    ]
    while pts.size > 0 and len(planes) < K:
        point = pts[0]
        normal = position - point
        const = -np.dot(normal, point)
        planes.append(np.concatenate([normal, [const]]))
        infront = pts @ normal + const > 0
        pts = pts[infront]
    return planes


def test_fsd_matches_oracle():
    rng = np.random.default_rng(0)
    position = np.array([0.0, 0.0, 0.0])
    points = rng.uniform(-3, 3, size=(64, 3)).astype(np.float32)
    points[:, 2] = 0.0
    K, R = 6, 4.0
    got = np.asarray(
        free_space_halfplanes(jnp.asarray(points), jnp.asarray(position, jnp.float32),
                              number_constraints=K, max_radius=R)
    )
    want = _oracle_fsd(points, position, K, R)
    assert len(want) <= K
    for i, plane in enumerate(want):
        np.testing.assert_allclose(got[i], plane, atol=1e-4, err_msg=f"plane {i}")


def test_fsd_pads_with_dummy():
    position = np.array([1.0, 2.0, 0.0], np.float32)
    # no points in range -> all K slots are the far dummy plane
    points = np.full((8, 3), 50.0, np.float32)
    K = 4
    planes = np.asarray(
        free_space_halfplanes(jnp.asarray(points), jnp.asarray(position),
                              number_constraints=K, max_radius=5.0)
    )
    # dummy: normal = position - (position + [20,20,0]) = [-20,-20,0]
    for i in range(K):
        np.testing.assert_allclose(planes[i, :3], [-20, -20, 0], atol=1e-4)
        # the robot must be strictly on the positive side
        val = planes[i, :3] @ position + planes[i, 3]
        assert val > 100.0


def test_fsd_separates_all_points():
    """Every in-range point must be behind at least one returned plane."""
    rng = np.random.default_rng(3)
    position = np.zeros(3, np.float32)
    points = rng.uniform(-2, 2, size=(32, 3)).astype(np.float32)
    points[:, 2] = 0.0
    planes = np.asarray(
        free_space_halfplanes(jnp.asarray(points), jnp.asarray(position),
                              number_constraints=10, max_radius=3.0)
    )
    in_range = np.linalg.norm(points, axis=1) < 3.0
    for pt in points[in_range]:
        vals = planes[:, :3] @ pt + planes[:, 3]
        assert np.min(vals) <= 1e-4, f"point {pt} not separated"
    # and the robot itself is on the positive side of every plane
    vals = planes[:, :3] @ position + planes[:, 3]
    assert np.all(vals > 0)


def test_fsd_class_api():
    fsd = FreeSpaceDecomposition(number_constraints=5, max_radius=4.0)
    fsd.set_position(np.array([0.0, 0.0, 0.0]))
    pts = np.array([[1.0, 0, 0], [0, 1.5, 0], [-2.0, 0.5, 0]], np.float32)
    fsd.compute_constraints(pts)
    lst = fsd.aslist()
    assert lst.shape == (5, 4)
    d = fsd.asdict()
    assert set(d) == {f"constraint_{i}" for i in range(5)}
    assert len(fsd.constraints()) == 3
