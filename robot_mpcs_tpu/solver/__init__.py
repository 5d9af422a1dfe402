"""The in-house batched NLP solver (replaces ForcesPro, reference L1).

``al_ilqr`` implements an augmented-Lagrangian iLQR: the equality structure
(stage dynamics) is eliminated by a Riccati sweep (the block-tridiagonal KKT
factorization ForcesPro performs inside its generated C), and inequalities +
bounds are handled by a PHR augmented Lagrangian with multiplier warm starts
across MPC steps. Everything is fixed-shape and fixed-iteration so one
``jax.jit`` + ``jax.vmap`` turns it into a batched device program.
"""

from robot_mpcs_tpu.solver.types import SolveResult, SolverState
from robot_mpcs_tpu.solver.al_ilqr import build_solver
