"""Forward-kinematics unit tests against an independent scipy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_mpcs_tpu.assets import BUILTIN_FRAMES, builtin_model, to_urdf_xml
from robot_mpcs_tpu.models.fk import RobotKinematics
from robot_mpcs_tpu.models.urdf import parse_urdf

from oracles import oracle_fk


def make_kin(name):
    root, end, base = BUILTIN_FRAMES[name]
    return builtin_model(name), RobotKinematics(builtin_model(name), root, end, base)


def test_point_robot_dims():
    _, kin = make_kin("pointRobot")
    assert kin.n == 3
    assert kin.n_arm == 3


def test_panda_dims():
    _, kin = make_kin("panda")
    assert kin.n == 7


def test_boxer_dims():
    _, kin = make_kin("boxer")
    # diffdrive: zero actuated arm joints, +3 base dof (reference mpcBase.py:58-61)
    assert kin.n_arm == 0
    assert kin.n == 3


def test_point_robot_analytic():
    _, kin = make_kin("pointRobot")
    q = jnp.array([1.5, -2.0, 0.7])
    pos = kin.fk_pos(q, "base_link")
    np.testing.assert_allclose(np.asarray(pos), [1.5, -2.0, 0.05], atol=1e-4)


def test_boxer_ee_analytic():
    _, kin = make_kin("boxer")
    q = jnp.array([2.0, 1.0, np.pi / 3])
    pos = kin.fk_pos(q, "ee_link")
    expected = [2.0 + 0.4 * np.cos(np.pi / 3), 1.0 + 0.4 * np.sin(np.pi / 3), 0.0]
    np.testing.assert_allclose(np.asarray(pos), expected, atol=1e-4)


def test_panda_home_height():
    """At q=0 the panda wrist must sit at the known flange kinematic height."""
    _, kin = make_kin("panda")
    pos = np.asarray(kin.fk_pos(jnp.zeros(7), "panda_link7"))
    # z(link1)=0.333, +0.316 via joint3, +0.384 via joint5 -> 1.033 minus the
    # 0.0825 lateral offsets cancel; exact value checked against the oracle.
    oracle = oracle_fk(builtin_model("panda"), "panda_link0", "panda_link7",
                       "panda_link7", np.zeros(7))
    np.testing.assert_allclose(pos, oracle, atol=1e-4)
    assert pos[2] > 0.9


@pytest.mark.parametrize("name", ["pointRobot", "panda", "boxer"])
def test_fk_matches_oracle_random(name):
    model, kin = make_kin(name)
    root, end, base = BUILTIN_FRAMES[name]
    links = {
        "pointRobot": ["base_link", "ee_link"],
        "panda": ["panda_link3", "panda_link5", "panda_link7"],
        "boxer": ["ee_link", "chassis_link"],
    }[name]
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = rng.uniform(-1.5, 1.5, size=kin.n)
        for link in links:
            got = np.asarray(kin.fk_pos(jnp.asarray(q, dtype=jnp.float32), link))
            want = oracle_fk(model, root, end, link, q, base)
            np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"{name}/{link}")


def test_fk_jit_vmap_grad():
    """FK must be jittable, vmappable and differentiable (used under jacfwd)."""
    _, kin = make_kin("panda")
    f = jax.jit(jax.vmap(lambda q: kin.fk_pos(q, "panda_link7")))
    qs = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(32, 7)), jnp.float32)
    out = f(qs)
    assert out.shape == (32, 3)
    J = jax.jacfwd(lambda q: kin.fk_pos(q, "panda_link7"))(qs[0])
    assert J.shape == (3, 7)
    assert np.all(np.isfinite(np.asarray(J)))
    # finite-difference check of the Jacobian
    eps = 1e-4
    q0 = np.asarray(qs[0], dtype=np.float64)
    model = builtin_model("panda")
    Jfd = np.zeros((3, 7))
    for i in range(7):
        dq = np.zeros(7)
        dq[i] = eps
        fp = oracle_fk(model, "panda_link0", "panda_link7", "panda_link7", q0 + dq)
        fm = oracle_fk(model, "panda_link0", "panda_link7", "panda_link7", q0 - dq)
        Jfd[:, i] = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(J), Jfd, atol=1e-3)


def test_urdf_roundtrip():
    """Serializing a builtin model to URDF and re-parsing preserves kinematics."""
    model = builtin_model("panda")
    reparsed = parse_urdf(to_urdf_xml(model))
    kin1 = RobotKinematics(model, "panda_link0", "panda_link7")
    kin2 = RobotKinematics(reparsed, "panda_link0", "panda_link7")
    q = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, 7), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(kin1.fk_pos(q)), np.asarray(kin2.fk_pos(q)), atol=1e-4
    )


def test_joint_limits_extracted():
    _, kin = make_kin("panda")
    assert kin.joint_limits.shape == (7, 2)
    np.testing.assert_allclose(kin.joint_limits[0], [-2.8973, 2.8973])


def test_analytic_jacobian_matches_autodiff():
    """The custom_jvp geometric Jacobian must equal jacfwd through the raw
    transform chain, for both holonomic (panda) and diffdrive (boxer)."""
    import jax
    import jax.numpy as jnp

    from robot_mpcs_tpu.assets import builtin_model
    from robot_mpcs_tpu.models.fk import RobotKinematics

    cases = [
        ("panda", "panda_link0", "panda_link7", "holonomic",
         ["panda_link3", "panda_link5", "panda_link7"]),
        ("boxer", "base_link", "ee_link", "diffdrive", ["ee_link"]),
        ("pointRobot", "world", "base_link", "holonomic", ["base_link"]),
    ]
    rng = np.random.default_rng(7)
    for name, root, end, base, links in cases:
        kin = RobotKinematics(builtin_model(name), root, end, base)
        q = jnp.asarray(rng.normal(size=kin.n) * 0.7, jnp.float32)
        P, J = kin.fk_pos_links_with_jac(q, links)
        P_raw = kin._fk_pos_links_raw(q, links)
        J_ad = jax.jacfwd(lambda qq: kin._fk_pos_links_raw(qq, links))(q)
        np.testing.assert_allclose(np.asarray(P), np.asarray(P_raw), atol=1e-5)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-4)
        # and the custom_jvp route agrees with jacfwd of the public fn
        J_pub = jax.jacfwd(lambda qq: kin.fk_pos_links(qq, links))(q)
        np.testing.assert_allclose(np.asarray(J_pub), np.asarray(J_ad), atol=1e-4)


# ---------------------------------------------------------------- file parity


REFERENCE_URDFS = {
    # (urdf file in tests/data, root, end, base_type, extra links to check)
    "panda": ("panda.urdf", "panda_link0", "panda_link7", "holonomic",
              ["panda_link3", "panda_link5", "panda_link7"]),
    "pointRobot": ("pointRobot.urdf", "world", "base_link", "holonomic",
                   ["base_link"]),
    "boxer": ("boxer_fk.urdf", "base_link", "ee_link", "diffdrive",
              ["ee_link"]),
}


@pytest.mark.parametrize("name", sorted(REFERENCE_URDFS))
def test_builtin_fk_matches_reference_urdf_file(name):
    """Builtin joint tables == the reference's URDF files, numerically.

    The builtin models (robot_mpcs_tpu/assets.py) replace the reference's
    on-disk URDF assets (reference examples/assets/*/); this pins their FK
    to the file-loaded kinematics over random configurations so a builtin
    table edit can never silently drift from the assets the reference's
    configs describe (VERDICT r4 item 9).
    """
    import os

    fname, root, end, base, links = REFERENCE_URDFS[name]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", fname)
    file_kin = RobotKinematics.from_urdf_file(path, root, end, base_type=base)
    builtin_kin = RobotKinematics(builtin_model(name), root, end, base)
    assert file_kin.n == builtin_kin.n
    np.testing.assert_allclose(
        file_kin.joint_limits, builtin_kin.joint_limits, atol=1e-12
    )
    rng = np.random.default_rng(7)
    q = jnp.asarray(
        rng.uniform(-1.5, 1.5, size=(16, file_kin.n)), jnp.float32
    )
    for link in links:
        got = jax.vmap(lambda qq: builtin_kin.fk_pos(qq, link))(q)
        want = jax.vmap(lambda qq: file_kin.fk_pos(qq, link))(q)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6,
            err_msg=f"{name}:{link}",
        )
