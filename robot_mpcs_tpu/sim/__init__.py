from robot_mpcs_tpu.sim.kinematic_sim import KinematicSim
