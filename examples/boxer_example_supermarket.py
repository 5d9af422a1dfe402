"""Boxer in a supermarket aisle scene (reference
``examples/boxer_example_supermarket.py``): same global-planner pipeline as
``boxer_example_global`` with shelf-like box obstacles, a sphere obstacle,
and an 80x80 occupancy grid with small convolution blur."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from boxer_example_global import BoxerGlobalMpcExample
from mpc_example import CONFIG_DIR, SphereObstacle, episode_steps

from robot_mpcs_tpu.global_planner.global_planner import GlobalPlanner


class BoxObstacle:
    """Axis-aligned box footprint (the reference uses pybullet boxes)."""

    def __init__(self, position, length, width):
        self._position = list(position)
        self._length = float(length)  # x extent
        self._width = float(width)  # y extent
        # conservative circumscribed radius for lidar raycasts
        self._radius = 0.5 * float(np.hypot(length, width))

    def position(self):
        return self._position

    def radius(self):
        return self._radius

    def half_extents(self):
        return self._length / 2.0, self._width / 2.0


class BoxerSupermarketExample(BoxerGlobalMpcExample):
    def initialize_environment(self):
        super().initialize_environment()
        self._goal = [7.0, -2.2]
        # five shelf rows + one sphere (reference supermarket scene)
        shelves = [
            BoxObstacle([2.0, 1.5, 0.0], 1.0, 3.0),
            BoxObstacle([4.0, 1.5, 0.0], 1.0, 3.0),
            BoxObstacle([6.0, 1.5, 0.0], 1.0, 3.0),
            BoxObstacle([3.0, -1.0, 0.0], 1.0, 2.0),
            BoxObstacle([5.0, -0.5, 0.0], 1.0, 2.0),
        ]
        self._obstacles = shelves + [SphereObstacle([1.5, -1.8, 0.0], 0.3)]
        dim_pixels = np.array([80, 80, 1])
        self.global_planner = GlobalPlanner(
            dim_pixels=dim_pixels,
            limits_low=np.array([-10.0, -10.0, 0.0]),
            limits_high=np.array([10.0, 10.0, 1.0]),
            BOOL_PLOTTING=False,
            convolution_blur=(2, 2),
            enlarge_obstacles=True,
        )

    def occupancy_3d(self):
        h, w = 80, 80
        occ = np.zeros((h, w, 1), np.float32)
        lo = self._limits_env[:2, 0]
        size = self._limits_env[:2, 1] - lo
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        wx = self._limits_env[0, 1] - (ys + 0.5) / h * size[0]
        wy = lo[1] + (xs + 0.5) / w * size[1]
        for obst in self._obstacles:
            cx, cy = obst.position()[:2]
            if isinstance(obst, BoxObstacle):
                hx, hy = obst.half_extents()
                mask = (np.abs(wx - cx) <= hx) & (np.abs(wy - cy) <= hy)
            else:
                mask = (wx - cx) ** 2 + (wy - cy) ** 2 <= obst.radius() ** 2
            occ[mask, 0] = 1.0
        return occ


def main():
    example = BoxerSupermarketExample(os.path.join(CONFIG_DIR, "boxerMpc.yaml"))
    example.initialize_environment()
    example._limits_env = np.array([[-10.0, 10.0], [-10.0, 10.0], [0.0, 1.0]])
    example.build()
    example.set_mpc_parameter()
    steps, smoke = episode_steps(500)
    return 0 if (example.run(steps) or smoke) else 1


if __name__ == "__main__":
    sys.exit(main())
