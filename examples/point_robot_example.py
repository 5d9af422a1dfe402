"""Point-robot MPC example (reference ``examples/pointRobot_example.py``):
3-dof holonomic point mass, static sphere obstacle, single goal, headless
closed-loop run against the kinematic sim."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from mpc_example import CONFIG_DIR, MpcExample, SphereObstacle, episode_steps


class PointRobotMpcExample(MpcExample):
    def initialize_environment(self):
        self._goal = [3.0, 0.5, 0.0]
        self._obstacles = [SphereObstacle([1.5, 0.25, 0.05], 0.4)]
        self._r_body = 0.2
        self._limits = np.array([[-10.0, 10.0]] * 3)
        self._limits_u = np.array([[-5.0, 5.0]] * 3)

    def run(self, n_steps: int = 500):
        self.sim.reset(np.zeros(self.problem.dims.nx))
        for step in range(n_steps):
            q, qdot = self.sim.observation()
            action, output, exitflag = self.planner.computeAction(q, qdot)
            if exitflag < 0:
                print(f"step {step}: solver failed (exitflag {exitflag})")
            ob = self.sim.step(action)
            ee = [ob[0], ob[1], 0.0]
            if self.check_goal_reaching(ee[:2]):
                print(f"goal reached at step {step}: pos {ob[:2]}")
                return True
        print(f"goal NOT reached in {n_steps} steps; final pos {ob[:2]}")
        return False


def main():
    example = PointRobotMpcExample(os.path.join(CONFIG_DIR, "pointRobotMpc.yaml"))
    # sane repulsion weight (see robot_mpcs_tpu.models.objectives.ConstraintAvoidance)
    example.setup.mpc.weights["wconstr"] = [0.005, 0.0, 0.0, 0.0]
    example.initialize_environment()
    example.build()
    example.set_mpc_parameter()
    steps, smoke = episode_steps(500)
    return 0 if (example.run(steps) or smoke) else 1


if __name__ == "__main__":
    sys.exit(main())
