"""End-to-end closed-loop verification drive (see .claude/skills/verify).

Point robot with one sphere obstacle, joint/input limits, constraint
avoidance: must reach the goal in < 150 steps with exitflag >= 0 throughout.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.planner.mpc_planner import MPCPlanner
from robot_mpcs_tpu.sim.kinematic_sim import KinematicSim

setup = load_setup(
    os.path.join(os.path.dirname(__file__), "..", "examples", "config", "pointRobotMpc.yaml")
)
setup.mpc.weights["wconstr"] = [0.005, 0, 0, 0]
problem = MpcProblem(setup)
planner = MPCPlanner(problem)
planner.reset()
planner.setGoalReaching([3.0, 0.5, 0.0])


class _Sphere:
    def position(self):
        return [1.5, 0.25, 0.05]

    def radius(self):
        return 0.4

    def dimension(self):
        return 3


planner.setRadialConstraints([_Sphere()], 0.2)
planner.setJointLimits(([-10.0] * 3, [10.0] * 3))
planner.setInputLimits(([-5.0] * 3, [5.0] * 3))
planner.setConstraintAvoidance()
planner.concretize()
sim = KinematicSim(problem.dims, setup.mpc.time_step)
sim.reset(np.zeros(problem.dims.nx))
reached = False
for step in range(250):
    q, qdot = sim.observation()
    a, out, flag = planner.computeAction(q, qdot)
    assert flag >= 0, f"exitflag {flag} at step {step}"
    ob = sim.step(a)
    if np.linalg.norm(ob[:2] - [3.0, 0.5]) < 0.15:
        print("reached at", step)
        reached = True
        break
assert reached, "goal NOT reached in 250 steps"
assert step < 150, f"took {step} steps (budget 150)"
print("verify drive OK")
