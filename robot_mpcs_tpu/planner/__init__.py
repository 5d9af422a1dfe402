from robot_mpcs_tpu.planner.mpc_planner import (
    EmptyObstacle,
    MPCPlanner,
    SolverDoesNotExistError,
)
