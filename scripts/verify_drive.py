import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.planner.mpc_planner import MPCPlanner
from robot_mpcs_tpu.sim.kinematic_sim import KinematicSim

setup = load_setup("examples/config/pointRobotMpc.yaml")
setup.mpc.weights["wconstr"] = [0.005, 0, 0, 0]
problem = MpcProblem(setup)
planner = MPCPlanner(problem); planner.reset()
planner.setGoalReaching([3.0, 0.5, 0.0])
class S:
    def position(self): return [1.5, 0.25, 0.05]
    def radius(self): return 0.4
    def dimension(self): return 3
planner.setRadialConstraints([S()], 0.2)
planner.setJointLimits(([-10.]*3, [10.]*3))
planner.setInputLimits(([-5.]*3, [5.]*3))
planner.setConstraintAvoidance(); planner.concretize()
sim = KinematicSim(problem.dims, setup.mpc.time_step)
sim.reset(np.zeros(problem.dims.nx))
for step in range(250):
    q, qdot = sim.observation()
    a, out, flag = planner.computeAction(q, qdot)
    assert flag >= 0
    ob = sim.step(a)
    if np.linalg.norm(ob[:2] - [3.0, 0.5]) < 0.15:
        print("reached at", step); break
else:
    raise SystemExit("goal NOT reached")
