"""Panda arm MPC example (reference ``examples/panda_example.py``): 7-dof
arm with real joint limits, sphere obstacle, self-collision avoidance."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from mpc_example import CONFIG_DIR, MpcExample, SphereObstacle, episode_steps


class PandaMpcExample(MpcExample):
    def initialize_environment(self):
        self._goal = [0.4, 0.3, 0.6]
        self._obstacles = [SphereObstacle([0.6, -0.3, 0.5], 0.2)]
        self._r_body = 0.1
        # real panda joint limits (reference panda_example.py:60-68)
        self._limits = np.array(
            [
                [-2.8973, 2.8973],
                [-1.7628, 1.7628],
                [-2.8973, 2.8973],
                [-3.0718, 0.0698],
                [-2.8973, 2.8973],
                [-0.0175, 3.7525],
                [-2.8973, 2.8973],
            ]
        )
        self._limits_u = np.array([[-10.0, 10.0]] * 7)

    def run(self, n_steps: int = 500):
        x0 = np.zeros(self.problem.dims.nx)
        x0[:7] = [0.0, -0.8, 0.0, -1.5, 0.0, 1.0, 0.0]  # elbow-down home
        self.sim.reset(x0)
        kin = self.problem.kin
        import jax.numpy as jnp

        for step in range(n_steps):
            q, qdot = self.sim.observation()
            action, output, exitflag = self.planner.computeAction(q, qdot)
            if exitflag < 0:
                print(f"step {step}: solver failed (exitflag {exitflag})")
            ob = self.sim.step(action)
            ee = np.asarray(kin.fk_pos(jnp.asarray(ob[:7]), "panda_link7"))
            if self.check_goal_reaching(ee, epsilon=0.1):
                print(f"goal reached at step {step}: ee {ee.round(3)}")
                return True
        print(f"goal NOT reached in {n_steps} steps; final ee {ee.round(3)}")
        return False


def main():
    example = PandaMpcExample(os.path.join(CONFIG_DIR, "pandaMpc.yaml"))
    example.setup.mpc.weights["wconstr"] = [0.01, 0.0, 0.0, 0.0]
    example.initialize_environment()
    example.build()
    example.set_mpc_parameter()
    steps, smoke = episode_steps(500)
    return 0 if (example.run(steps) or smoke) else 1


if __name__ == "__main__":
    sys.exit(main())
