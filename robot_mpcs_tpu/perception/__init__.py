from robot_mpcs_tpu.perception.free_space_decomposition import (
    FreeSpaceDecomposition,
    HalfPlane,
    free_space_halfplanes,
)
