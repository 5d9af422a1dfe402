from robot_mpcs_tpu.parallel.mesh import make_mesh, shard_batch
from robot_mpcs_tpu.parallel.fleet import FleetRunner, FleetScenario
from robot_mpcs_tpu.parallel.fleet_group import (
    FleetGroup,
    GroupMetrics,
    mixed_fleet_scenarios,
)
