"""Boxer example + global planning (reference
``examples/boxer_example_global.py``): build an occupancy grid from the
obstacle set, plan a global path with A* once at episode start, then track
local goals along the path while the lidar->FSD pipeline supplies local
halfplane constraints."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from boxer_example import BoxerMpcExample
from mpc_example import CONFIG_DIR, SphereObstacle, episode_steps

from robot_mpcs_tpu.global_planner.global_planner import GlobalPlanner


class BoxerGlobalMpcExample(BoxerMpcExample):
    def initialize_environment(self):
        super().initialize_environment()
        self._limits_env = np.array([[-10.0, 10.0], [-10.0, 10.0], [0.0, 1.0]])
        dim_pixels = np.array([100, 100, 1])
        self.global_planner = GlobalPlanner(
            dim_pixels=dim_pixels,
            limits_low=self._limits_env[:, 0],
            limits_high=self._limits_env[:, 1],
            BOOL_PLOTTING=False,
            enlarge_obstacles=True,
        )

    def occupancy_3d(self):
        """Rasterize the obstacle set into the (H, W, 1) occupancy grid the
        reference gets from its OccupancySensor."""
        h, w = 100, 100
        occ = np.zeros((h, w, 1), np.float32)
        lo = self._limits_env[:2, 0]
        size = self._limits_env[:2, 1] - lo
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        # grid frame: row index along world-x flipped (see convert_meters)
        wx = self._limits_env[0, 1] - (ys + 0.5) / h * size[0]
        wy = lo[1] + (xs + 0.5) / w * size[1]
        for obst in self._obstacles:
            cx, cy = obst.position()[:2]
            mask = (wx - cx) ** 2 + (wy - cy) ** 2 <= obst.radius() ** 2
            occ[mask, 0] = 1.0
        return occ

    def run(self, n_steps: int = 400):
        self.sim.reset(np.zeros(self.problem.dims.nx))
        self.global_planner.get_occupancy_map(None, self.occupancy_3d())
        start = np.array([0.0, 0.0, 0.0])
        goal = np.array([self._goal[0], self._goal[1], 0.0])
        path, path_px = self.global_planner.get_global_path_astar(start, goal)
        if not path:
            print("global planner found no path")
            return False
        print(f"global path: {len(path)} waypoints")
        exitflag, output = -1, {}
        for step in range(n_steps):
            q, qdot, vel = self.sim.observation()
            local_goal = self.global_planner.get_local_goal(q[:2], path)
            self.planner.setGoalReaching(local_goal[:2])
            lin_constr = self.compute_constraints_over_horizon(q, exitflag, output)
            self.planner.setLinearConstraints(lin_constr, self._r_body)
            action, output, exitflag = self.planner.computeAction(q, qdot, vel)
            ob = self.sim.step(action)
            ee = ob[:2] + 0.4 * np.array([np.cos(ob[2]), np.sin(ob[2])])
            if self.check_goal_reaching(ee, epsilon=0.5):
                print(f"goal reached at step {step}: ee {ee.round(3)}")
                return True
        print(f"goal NOT reached in {n_steps} steps; final ee {ee.round(3)}, "
              f"local goal {np.asarray(local_goal)[:2]}")
        return False


def main():
    example = BoxerGlobalMpcExample(os.path.join(CONFIG_DIR, "boxerMpc.yaml"))
    example.initialize_environment()
    example.build()
    example.set_mpc_parameter()
    steps, smoke = episode_steps(400)
    return 0 if (example.run(steps) or smoke) else 1


if __name__ == "__main__":
    sys.exit(main())
