from robot_mpcs_tpu.utils.geometry import point_to_plane
from robot_mpcs_tpu.utils.checkpoint import load_fleet_state, save_fleet_state
from robot_mpcs_tpu.utils.profiling import StepTimer, timed, trace
