"""Result/state containers for the batched solver."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SolveResult(NamedTuple):
    """Outcome of one NLP solve (one scenario; batched via vmap).

    ``exitflag`` follows the reference's ForcesPro convention
    (``mpcPlanner.py:263`` treats < 0 as failure):
      1  converged (stationarity + feasibility tolerances met),
      0  iteration budget exhausted with a usable (finite) trajectory,
     -1  numerical failure (non-finite values).
    """

    #: full stage trajectory, shape (N, nz) with z = [x, s, u]
    z: jnp.ndarray
    exitflag: jnp.ndarray  # int32 scalar
    #: objective value (true cost, without AL penalty terms)
    cost: jnp.ndarray
    #: max inequality/bound violation
    violation: jnp.ndarray
    #: stationarity measure (max feedforward step of the last iLQR pass)
    grad_norm: jnp.ndarray
    #: AL multipliers at the solution, shape (N, n_con) — warm-start input
    #: for the next MPC step
    lam: jnp.ndarray
    #: inner iLQR iterations actually used (int32)
    iterations: jnp.ndarray
    #: raw (unmasked) stage-0 constraint violation. Pinned stage-0 rows —
    #: constraints that depend only on the fixed initial state — are masked
    #: out of ``violation``/``exitflag`` (no solver can repair them), but a
    #: caller monitoring safety can still detect an in-collision START here
    #: (the reference reports exitflag < 0 in that case and its runner
    #: brakes, mpcPlanner.py:263-264).
    violation0_raw: jnp.ndarray


class SolverState(NamedTuple):
    """Cross-step warm-start state carried by the planner."""

    z: jnp.ndarray  # (N, nz) previous plan
    lam: jnp.ndarray  # (N, n_con) previous multipliers
