"""Global planner tests: native + python A*, enlargement, follower."""

import numpy as np
import pytest

from robot_mpcs_tpu.global_planner.astar import _NATIVE, a_star, astar_grid
from robot_mpcs_tpu.global_planner.global_planner import (
    GlobalPlanner,
    enlarge_obstacles,
)
from robot_mpcs_tpu.global_planner.grid_map import OccupancyGridMap


def _wall_grid():
    """10x10 grid with a vertical wall at x=5, gap at y=8."""
    grid = np.zeros((10, 10), np.float32)
    grid[:, 5] = 1.0
    grid[8, 5] = 0.0
    return grid


def test_native_lib_loaded():
    assert _NATIVE is not None, "libastar.so should be built (make -C native)"


@pytest.mark.parametrize("use_native", [True, False])
def test_astar_finds_gap(use_native):
    grid = _wall_grid()
    path = astar_grid(grid, (1, 1), (9, 1), use_native=use_native)
    assert path[0] == (1, 1) and path[-1] == (9, 1)
    # the path must pass through the gap
    assert (5, 8) in path
    # and never touch an occupied cell
    for x, y in path:
        assert grid[y, x] < 0.8


def test_astar_native_matches_python_cost():
    grid = _wall_grid()
    p_native = astar_grid(grid, (1, 1), (9, 1), use_native=True)
    p_python = astar_grid(grid, (1, 1), (9, 1), use_native=False)

    def cost(path):
        c = 0.0
        for (x0, y0), (x1, y1) in zip(path, path[1:]):
            c += np.hypot(x1 - x0, y1 - y0) + grid[y1, x1] * 3.0
        return c

    assert abs(cost(p_native) - cost(p_python)) < 1e-4


def test_astar_unreachable_returns_empty():
    grid = np.zeros((10, 10), np.float32)
    grid[:, 5] = 1.0  # full wall
    assert astar_grid(grid, (1, 1), (9, 1)) == []


def test_astar_blocked_start_raises():
    grid = _wall_grid()
    with pytest.raises(ValueError):
        astar_grid(grid, (5, 1), (9, 1))


def test_a_star_meters_wrapper():
    gmap = OccupancyGridMap(_wall_grid(), cell_size=0.5)
    path_m, path_px = a_star((0.5, 0.5), (4.5, 0.5), gmap)
    assert path_px[0] == (1, 1) and path_px[-1] == (9, 1)
    np.testing.assert_allclose(path_m[0], (0.5, 0.5))


def test_enlarge_obstacles():
    occ = np.zeros((20, 20), np.float32)
    occ[10, 10] = 1.0
    out = enlarge_obstacles(occ, kernel_size=2, threshold=0.03)
    assert out[10, 10] == 1.0
    assert out[12, 12] == 1.0  # within the 5x5 kernel
    assert out[16, 16] == 0.0


def test_global_planner_end_to_end():
    gp = GlobalPlanner(
        dim_pixels=np.array([40, 40, 1]),
        limits_low=np.array([-5.0, -5.0, 0.0]),
        limits_high=np.array([5.0, 5.0, 1.0]),
        enlarge_obstacles=False,
        BOOL_PLOTTING=False,
    )
    occ3d = np.zeros((40, 40, 1), np.float32)
    occ3d[15:25, 18:22, 0] = 1.0  # central block
    gp.get_occupancy_map(None, occ3d)
    path, path_px = gp.get_global_path_astar(
        np.array([-3.0, -3.0, 0.0]), np.array([3.0, 3.0, 0.0])
    )
    assert len(path) > 0
    np.testing.assert_allclose(path[0][:2], [-3.0, -3.0], atol=gp.cell_size)
    np.testing.assert_allclose(path[-1][:2], [3.0, 3.0], atol=gp.cell_size)


def test_local_goal_follower():
    gp = GlobalPlanner(
        dim_pixels=np.array([10, 10, 1]),
        limits_low=np.array([-5.0, -5.0, 0.0]),
        limits_high=np.array([5.0, 5.0, 1.0]),
        threshold_local_goal=1.0,
    )
    path = [np.array([0.0, 0.0]), np.array([1.0, 0.0]), np.array([2.0, 0.0])]
    g = gp.get_local_goal(np.array([0.1, 0.0]), path)  # near wp0 -> advance
    np.testing.assert_allclose(g, [1.0, 0.0])
    g = gp.get_local_goal(np.array([5.0, 5.0]), path)  # far -> stay
    np.testing.assert_allclose(g, [1.0, 0.0])
    g = gp.get_local_goal(np.array([1.05, 0.0]), path)  # near wp1 -> advance
    np.testing.assert_allclose(g, [2.0, 0.0])
    g = gp.get_local_goal(np.array([2.0, 0.0]), path)  # final node -> stay
    np.testing.assert_allclose(g, [2.0, 0.0])
