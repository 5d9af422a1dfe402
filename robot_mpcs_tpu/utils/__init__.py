from robot_mpcs_tpu.utils.geometry import point_to_plane
