"""Model layer: URDF kinematics, robot dynamics, and MPC problem assembly."""

from robot_mpcs_tpu.models.urdf import UrdfModel, Joint, parse_urdf, load_urdf
from robot_mpcs_tpu.models.fk import RobotKinematics
from robot_mpcs_tpu.models.dimensions import ProblemDimensions
