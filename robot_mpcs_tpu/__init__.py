"""robot_mpcs_tpu — a TPU-native batched MPC framework for URDF-described robots.

A from-scratch re-design of the capabilities of maxspahn/robot_mpcs
(/root/reference) for TPU hardware:

* the casadi symbolic layer (reference ``robotmpcs/models``) becomes pure JAX
  stage functions traced once under ``jax.jit``;
* the proprietary ForcesPro code-generated C solver (driven from reference
  ``robotmpcs/models/mpcModel.py:74-141``) is replaced by an in-house batched
  augmented-Lagrangian iLQR/SQP solver (``robot_mpcs_tpu.solver``) whose hot
  loops map onto the MXU via batched small-matrix linear algebra and Pallas
  kernels;
* the single-scenario receding-horizon loop (reference
  ``robotmpcs/planner/mpcPlanner.py``) becomes a jitted, vmapped planner step
  that scales to thousands of scenarios sharded over a TPU mesh
  (``robot_mpcs_tpu.parallel``).
"""

from robot_mpcs_tpu.config import (
    MpcConfiguration,
    RobotConfiguration,
    SolverConfiguration,
    load_setup,
)

__version__ = "0.1.0"
