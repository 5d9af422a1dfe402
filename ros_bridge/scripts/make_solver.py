#!/usr/bin/env python3
"""ROS-side offline solver-artifact generation (reference
``ros_bridge/src/robotmpcs_ros/scripts/make_solver.py:14-29``).

Builds the MPC problem from a ``<robot>_mpc_config.yaml`` rosparam-style
config (the same file ``launch/boxer_mpc.launch`` loads), persists the
solver artifact directory — paramMap.yaml / properties.yaml / setup.yaml +
the AOT-exported planner program — and warm-compiles for the current
backend, so the ROS node's first control tick does not pay the trace/
compile cost.

Usage::

    rosrun robotmpcs_tpu make_solver.py config/boxer_mpc_config.yaml [out_dir]

(or plain ``python3 scripts/make_solver.py ...`` outside ROS).
"""

import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    config = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "..", "solvers")
    # robot type from `<name>_mpc_config.yaml` (reference regex,
    # ros make_solver.py:27)
    match = re.search(r"([a-zA-Z]+)_mpc_config", os.path.basename(config))
    if match:
        print(f"robot type: {match.group(1)}")
    from make_solver import main as generate  # examples/make_solver.py

    return generate(config, out_dir)


if __name__ == "__main__":
    sys.exit(main())
