"""Boxer diff-drive MPC example with simulated lidar + free-space
decomposition (reference ``examples/boxer_example.py``): per control step,
raycast a simulated 2D lidar against the obstacle set, decompose the point
cloud into halfplane constraints per predicted stage (seeded from the
previous plan when the solve succeeded), and feed them to the planner as
LinearConstraints."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from mpc_example import CONFIG_DIR, MpcExample, SphereObstacle, episode_steps

from robot_mpcs_tpu.perception.free_space_decomposition import (
    FreeSpaceDecomposition,
)

N_RAYS = 64
LIDAR_RANGE = 10.0


def simulate_lidar(pose, obstacles, n_rays=N_RAYS, max_range=LIDAR_RANGE):
    """Raycast circles from the lidar mount (0.4 m ahead of base, like the
    reference boxer's sensor link). Returns (n_hits, 3) world points."""
    x, y, theta = pose
    origin = np.array([x + 0.4 * np.cos(theta), y + 0.4 * np.sin(theta)])
    angles = theta + np.linspace(0, 2 * np.pi, n_rays, endpoint=False)
    dirs = np.stack([np.cos(angles), np.sin(angles)], axis=1)
    points = []
    for d in dirs:
        best = max_range
        for obst in obstacles:
            c = np.asarray(obst.position()[:2]) - origin
            proj = float(c @ d)
            if proj <= 0:
                continue
            perp2 = float(c @ c) - proj * proj
            r2 = obst.radius() ** 2
            if perp2 > r2:
                continue
            t = proj - np.sqrt(r2 - perp2)
            if 0 < t < best:
                best = t
        if best < max_range:
            hit = origin + best * d
            points.append([hit[0], hit[1], 0.0])
    return np.array(points, np.float32).reshape(-1, 3)


class BoxerMpcExample(MpcExample):
    def initialize_environment(self):
        self._goal = [7.2, -2.2]
        self._obstacles = [
            SphereObstacle([4.0, -1.5, 0.0], 1.0),
            SphereObstacle([2.4, -0.7, 0.0], 0.3),
        ]
        self._r_body = 0.6
        self._limits = np.array([[-10.0, 10.0]] * 3)
        self._limits_u = np.array([[-10.0, 10.0]] * 2)

    def build(self):
        super().build()
        self._N = self.setup.mpc.time_horizon
        self._n_constr = self.setup.mpc.number_obstacles
        self._fsd = FreeSpaceDecomposition(
            number_constraints=self._n_constr, max_radius=5.0
        )

    def compute_constraints_over_horizon(self, q, exitflag, output):
        """Stage-wise halfplane seeding (reference boxer_example.py:191-202):
        decompose around each predicted stage position when the last solve
        succeeded, else around the current pose."""
        point_cloud = simulate_lidar(q, self._obstacles)
        lin_constr = []
        for j in range(self._N):
            if exitflag >= 0 and output:
                key = self.planner._stage_key(j + 1)
                ref_pos = np.array([output[key][0], output[key][1], 0.0])
            else:
                ref_pos = np.array([q[0], q[1], 0.0])
            self._fsd.set_position(ref_pos)
            if point_cloud.size:
                self._fsd.compute_constraints(point_cloud)
                lin_constr.append(self._fsd.aslist())
            else:
                lin_constr.append(
                    np.tile(np.array([1.0, 0.0, 0.0, -100.0]), (self._n_constr, 1))
                )
        return lin_constr

    def run(self, n_steps: int = 300):
        self.sim.reset(np.zeros(self.problem.dims.nx))
        exitflag, output = -1, {}
        for step in range(n_steps):
            q, qdot, vel = self.sim.observation()
            lin_constr = self.compute_constraints_over_horizon(q, exitflag, output)
            self.planner.setLinearConstraints(lin_constr, self._r_body)
            action, output, exitflag = self.planner.computeAction(q, qdot, vel)
            ob = self.sim.step(action)
            ee = ob[:2] + 0.4 * np.array([np.cos(ob[2]), np.sin(ob[2])])
            if self.check_goal_reaching(ee, epsilon=0.4):
                print(f"goal reached at step {step}: ee {ee.round(3)}")
                return True
        print(f"goal NOT reached in {n_steps} steps; final ee {ee.round(3)}")
        return False


def main():
    example = BoxerMpcExample(os.path.join(CONFIG_DIR, "boxerMpc.yaml"))
    example.initialize_environment()
    example.build()
    example.set_mpc_parameter()
    steps, smoke = episode_steps(300)
    return 0 if (example.run(steps) or smoke) else 1


if __name__ == "__main__":
    sys.exit(main())
