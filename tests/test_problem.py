"""Problem assembly tests: paramMap ABI, component stacks, artifact I/O."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "config")


@pytest.fixture(scope="module")
def point_problem():
    return MpcProblem(load_setup(os.path.join(CONFIG_DIR, "pointRobotMpc.yaml")))


@pytest.fixture(scope="module")
def panda_problem():
    return MpcProblem(load_setup(os.path.join(CONFIG_DIR, "pandaMpc.yaml")))


@pytest.fixture(scope="module")
def boxer_problem():
    return MpcProblem(load_setup(os.path.join(CONFIG_DIR, "boxerMpc.yaml")))


def test_point_param_map_layout(point_problem):
    """Registration order fixes the ABI: constraints (config order), wu,
    objectives (config order) — reference mpcModel.py:29-36."""
    pm = point_problem.param_map.to_reference_dict()
    # RadialConstraints: r_body(1) + obst(4) -> first indices
    assert pm["r_body"] == [0]
    assert pm["obst"] == [1, 2, 3, 4]
    # JointLimit: 3+3, InputLimit: 3+3
    assert pm["lower_limits"] == [5, 6, 7]
    assert pm["upper_limits"] == [8, 9, 10]
    assert pm["lower_limits_u"] == [11, 12, 13]
    assert pm["upper_limits_u"] == [14, 15, 16]
    # then wu, then objectives
    assert pm["wu"] == [17, 18, 19]
    assert pm["goal"] == [20, 21, 22]
    assert pm["wgoal"] == [23, 24, 25]
    assert pm["wconstr"] == [26, 27, 28, 29]
    assert point_problem.npar == 30


def test_point_dims(point_problem):
    d = point_problem.dims
    assert (d.n, d.nx, d.nu, d.ns) == (3, 6, 3, 0)
    assert d.nz == 9
    # ineq rows: radial 1*1=1? collision_links=1, n_obst=1 -> 1; selfcoll 0;
    # joint 6; input 6
    assert point_problem.n_ineq == 1 + 0 + 6 + 6


def test_panda_counts(panda_problem):
    d = panda_problem.dims
    assert (d.n, d.nx, d.nu) == (7, 14, 7)
    # radial: 3 links x 1 obst; selfcollision: 1 pair; joint 14; input 14
    assert panda_problem.n_ineq == 3 + 1 + 14 + 14


def test_boxer_dims(boxer_problem):
    d = boxer_problem.dims
    assert (d.n, d.nx, d.nu) == (3, 8, 2)
    assert boxer_problem.dims.base_type == "diffdrive"


def test_stage_objective_goal_term(point_problem):
    """With only wgoal set, stage cost equals the weighted squared goal error."""
    prob = point_problem
    pm = prob.param_map
    p = np.zeros(prob.npar, dtype=np.float32)
    pm_dict = pm.entries
    p[pm_dict["wgoal"][0] : pm_dict["wgoal"][0] + 3] = 2.0
    p[pm_dict["goal"][0] : pm_dict["goal"][0] + 3] = [1.0, 1.0, 0.05]
    # push obstacle far away so ConstraintAvoidance's guarded term ~0
    p[pm_dict["obst"][0] : pm_dict["obst"][0] + 4] = [-100, -100, -100, -100]
    z = np.zeros(prob.dims.nz, dtype=np.float32)
    z[:2] = [3.0, -1.0]  # q = (3, -1, 0) -> base at (3, -1, 0.05)
    val = float(prob.stage_objective(jnp.asarray(z), jnp.asarray(p)))
    expected = 2.0 * ((3 - 1) ** 2 + (-1 - 1) ** 2 + 0.0**2)
    assert abs(val - expected) < 1e-3


def test_stage_inequalities_values(point_problem):
    prob = point_problem
    pm = prob.param_map.entries
    p = np.zeros(prob.npar, dtype=np.float32)
    p[pm["r_body"][0]] = 0.2
    p[pm["obst"][0] : pm["obst"][0] + 4] = [2.0, 0.0, 0.05, 0.5]
    p[pm["lower_limits"][0] : pm["lower_limits"][0] + 3] = -10
    p[pm["upper_limits"][0] : pm["upper_limits"][0] + 3] = 10
    p[pm["lower_limits_u"][0] : pm["lower_limits_u"][0] + 3] = -1
    p[pm["upper_limits_u"][0] : pm["upper_limits_u"][0] + 3] = 1
    z = np.zeros(prob.dims.nz, dtype=np.float32)
    c = np.asarray(prob.stage_inequalities(jnp.asarray(z), jnp.asarray(p)))
    assert c.shape == (prob.n_ineq,)
    # radial: ||(0,0,0.05)-(2,0,0.05)|| - 0.5 - 0.2 = 1.3
    np.testing.assert_allclose(c[0], 1.3, atol=1e-5)
    # joint limit rows: q=0 in [-10, 10] -> all 10
    np.testing.assert_allclose(c[1:7], 10.0, atol=1e-5)
    # input rows: u=0 in [-1, 1] -> all 1
    np.testing.assert_allclose(c[7:13], 1.0, atol=1e-5)


def test_solver_name_minting(point_problem, boxer_problem):
    # reference format: <model>_n<n>_<dt>_H<N>[_noSlack] (mpcModel.py:111-116)
    assert point_problem.solver_name == "pointRobot_n3_005_H20_noSlack"
    assert boxer_problem.solver_name == "boxer_n3_01_H10_noSlack"


def test_artifact_roundtrip(tmp_path, point_problem):
    path = point_problem.generate_solver(str(tmp_path))
    assert os.path.isdir(path)
    for fname in ("paramMap.yaml", "properties.yaml", "setup.yaml"):
        assert os.path.exists(os.path.join(path, fname))
    rebuilt = MpcProblem.from_solver_dir(path)
    assert rebuilt.param_map.to_reference_dict() == point_problem.param_map.to_reference_dict()
    assert rebuilt.properties() == point_problem.properties()
