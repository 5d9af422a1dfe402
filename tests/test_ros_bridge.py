"""ROS-bridge logic tests (transport-free)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "ros_bridge"))

from mpc_planner_node import MpcRosLogic

from robot_mpcs_tpu.config import load_setup

CONFIG = os.path.join(os.path.dirname(__file__), "..", "ros_bridge", "config",
                      "boxer_mpc_config.yaml")


class _Sphere:
    def __init__(self, pos, r):
        self._pos, self._r = pos, r

    def position(self):
        return self._pos

    def radius(self):
        return self._r

    def dimension(self):
        return 3


def test_logic_no_odometry_returns_none():
    logic = MpcRosLogic(load_setup(CONFIG))
    assert logic.compute_velocity_command() is None


def test_logic_integrates_acc_to_velocity():
    setup = load_setup(CONFIG)
    logic = MpcRosLogic(setup)
    logic.update_goal([3.0, 0.0])
    logic.update_obstacles([_Sphere([10.0, 10.0, 0.0], 0.3)], r_body=0.5)
    logic.planner.setJointLimits(([-10.0] * 3, [10.0] * 3))
    logic.planner.setInputLimits(([-5.0, -5.0], [5.0, 5.0]))
    logic.update_odometry(0.0, 0.0, 0.0, 0.0, 0.0)
    v = np.zeros(2)
    for step in range(8):
        cmd = logic.compute_velocity_command()
        assert cmd is not None
        v = np.asarray(cmd)
        # crude forward simulation of the base to keep odometry fresh
        logic.update_odometry(step * 0.05, 0.0, 0.0, v[0], v[1])
    # the goal is straight ahead: the node must command forward motion
    assert v[0] > 0.05, f"expected forward velocity, got {v}"


def test_visualizer_renders_file(tmp_path):
    from robot_mpcs_tpu.planner.visualizer import Visualizer

    viz = Visualizer()
    viz.add_trace_point([0.0, 0.0])
    viz.add_trace_point([0.5, 0.1])
    out = viz.render(
        plan_xy=np.array([[0.5, 0.1], [1.0, 0.2], [1.5, 0.3]]),
        goal=[3.0, 0.5],
        obstacles=[_Sphere([1.5, 0.25, 0.0], 0.4)],
        halfplanes=np.array([[1.0, 0.5, 0.0, -3.0]]),
        r_body=0.2,
        save_to=str(tmp_path / "frame.png"),
    )
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000
