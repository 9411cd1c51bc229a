"""Adversarial robustness tests (VERDICT r2 item #9): the failure modes a
from-scratch URDF parser / perceptron trainer / trajectory optimizer hits
that the reference outsourced to yourdfpy / torch — deep mimic chains,
malformed descriptions, degenerate datasets, and start == target trajopt.
"""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffco_tpu as dc
from diffco_tpu import kernels, optim


pytestmark = pytest.mark.smoke  # fast single-core tier (pyproject)
from diffco_tpu.perceptron import DiffCo
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.robots.kinematics import chain_from_joint_list


def _urdf_file(text):
    f = tempfile.NamedTemporaryFile('w', suffix='.urdf', delete=False)
    f.write(text)
    f.close()
    return f.name


def _joint(name, parent, child, jtype='revolute', axis=(0, 0, 1),
           trans=(0, 0, 0.1), mimic=None, limits=(-1.0, 1.0)):
    return dict(name=name, parent=parent, child=child, type=jtype,
                axis=list(axis), origin_rot=np.eye(3, dtype=np.float32),
                origin_trans=np.asarray(trans, np.float32),
                limits=limits, mimic=mimic)


# ---------------------------------------------------------------------------
# URDF / kinematic-chain fuzz


def test_mimic_chain_resolves_transitively():
    """C mimics B mimics A: q_C must equal m_C * (m_B * q_A + o_B) + o_C
    folded onto A's dof."""
    joints = [
        _joint('a', 'base', 'l1'),
        _joint('b', 'l1', 'l2', mimic=('a', 2.0, 0.1)),
        _joint('c', 'l2', 'l3', mimic=('b', -3.0, 0.5)),
    ]
    spec = chain_from_joint_list(joints, root_name='base')
    assert spec.n_dofs == 1
    names = list(spec.link_names)
    i_b, i_c = names.index('l2'), names.index('l3')
    # b: mult 2, off 0.1 ; c: -3 * (2 q + 0.1) + 0.5 = -6 q + 0.2
    assert np.isclose(spec.mimic_mult[i_b], 2.0)
    assert np.isclose(spec.mimic_offset[i_b], 0.1)
    assert np.isclose(spec.mimic_mult[i_c], -6.0)
    assert np.isclose(spec.mimic_offset[i_c], 0.2, atol=1e-6)


def test_mimic_cycle_raises():
    joints = [
        _joint('a', 'base', 'l1', mimic=('b', 1.0, 0.0)),
        _joint('b', 'l1', 'l2', mimic=('a', 1.0, 0.0)),
    ]
    with pytest.raises(ValueError, match='cycle'):
        chain_from_joint_list(joints, root_name='base')


def test_mimic_unknown_source_raises():
    joints = [_joint('a', 'base', 'l1', mimic=('ghost', 1.0, 0.0))]
    with pytest.raises(ValueError, match='unknown joint'):
        chain_from_joint_list(joints, root_name='base')


def test_revolute_missing_limits_defaults():
    """A revolute joint without a <limit> element must fall back to
    (-pi, pi) instead of crashing (URDFs in the wild omit it)."""
    path = _urdf_file("""<?xml version="1.0"?>
<robot name="nolimit">
  <link name="base"/><link name="l1"/>
  <joint name="j1" type="revolute">
    <origin xyz="0 0 0.1" rpy="0 0 0"/>
    <axis xyz="0 0 1"/>
    <parent link="base"/><child link="l1"/>
  </joint>
</robot>""")
    try:
        robot = dc.URDFRobot(path, setup_acm=False)
        assert robot._n_dofs == 1
        lims = np.asarray(robot.joint_limits)
        assert np.allclose(lims[0], [-np.pi, np.pi])
        q = robot.rand_configs(4, jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(robot.fkine(q))))
    finally:
        os.unlink(path)


def test_multi_collision_geometry_link():
    """A link carrying several collision primitives keeps all of them
    through parse -> chain -> sphere model."""
    path = _urdf_file("""<?xml version="1.0"?>
<robot name="multigeom">
  <link name="base"/>
  <link name="l1">
    <collision><origin xyz="0 0 0.05" rpy="0 0 0"/>
      <geometry><sphere radius="0.03"/></geometry></collision>
    <collision><origin xyz="0 0 0.15" rpy="0 0 0"/>
      <geometry><cylinder radius="0.02" length="0.1"/></geometry></collision>
    <collision><origin xyz="0.05 0 0.1" rpy="0 1.5707963 0"/>
      <geometry><box size="0.1 0.02 0.02"/></geometry></collision>
  </link>
  <joint name="j1" type="revolute">
    <origin xyz="0 0 0.1" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <parent link="base"/><child link="l1"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
</robot>""")
    try:
        from diffco_tpu.robots.urdf import parse_urdf
        _, _, link_geoms, _ = parse_urdf(path)
        assert len(link_geoms['l1']) == 3
        robot = dc.URDFRobot(path, setup_acm=False, link_spheres=4)
        q = robot.rand_configs(4, jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(robot.fkine(q))))
    finally:
        os.unlink(path)


def test_all_fixed_urdf():
    """A robot with zero movable joints parses without crashing and
    reports n_dofs == 0 (a degenerate but well-formed description)."""
    path = _urdf_file("""<?xml version="1.0"?>
<robot name="statue">
  <link name="base"/><link name="l1"/>
  <joint name="j1" type="fixed">
    <origin xyz="0 0 0.2" rpy="0 0 0"/>
    <parent link="base"/><child link="l1"/>
  </joint>
</robot>""")
    try:
        from diffco_tpu.robots.urdf import parse_urdf
        from diffco_tpu.robots.kinematics import chain_from_joint_list
        _, joints, _, root = parse_urdf(path)
        spec = chain_from_joint_list(joints, root_name=root)
        assert spec.n_dofs == 0
    finally:
        os.unlink(path)


# ---------------------------------------------------------------------------
# perceptron training on degenerate datasets


def _rand(key, n, d=3):
    return jax.random.normal(key, (n, d))


def test_perceptron_all_positive_labels(key):
    """One-class data: training must terminate (not spin to the cap),
    produce finite state, and classify the training set as the one class."""
    X = _rand(key, 64)
    y = jnp.ones(64)
    clf = DiffCo(kernel_func=kernels.RQKernel(5.0))
    clf.train(X, y, max_iteration=500)
    assert clf.train_iterations < 500
    s = np.asarray(clf.score_original(X)).reshape(-1)
    assert np.all(np.isfinite(s))
    assert np.mean(s > 0) == 1.0
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')
    ps = np.asarray(clf.poly_score(X)).reshape(-1)
    assert np.all(np.isfinite(ps))


def test_perceptron_all_negative_labels(key):
    X = _rand(key, 64)
    clf = DiffCo(kernel_func=kernels.RQKernel(5.0))
    clf.train(X, -jnp.ones(64), max_iteration=500)
    s = np.asarray(clf.score_original(X)).reshape(-1)
    assert np.all(np.isfinite(s))
    assert np.mean(s < 0) == 1.0


def test_perceptron_duplicate_points(key):
    """Exact duplicates (same label) must not blow up the Gram solve —
    at most one copy becomes a support, scores stay finite."""
    k1, k2 = jax.random.split(key)
    Xu = _rand(k1, 32)
    X = jnp.concatenate([Xu, Xu], axis=0)          # every point twice
    y = jnp.concatenate([jnp.sign(Xu[:, 0])] * 2)
    clf = DiffCo(kernel_func=kernels.RQKernel(5.0))
    clf.train(X, y, max_iteration=800)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')
    s = np.asarray(clf.poly_score(_rand(k2, 16))).reshape(-1)
    assert np.all(np.isfinite(s))


def test_perceptron_conflicting_labels(key):
    """The same point with both labels is non-separable: training must
    stop at the iteration cap with finite state, not hang or NaN."""
    X = jnp.concatenate([_rand(key, 16)] * 2, axis=0)
    y = jnp.concatenate([jnp.ones(16), -jnp.ones(16)])
    clf = DiffCo(kernel_func=kernels.RQKernel(5.0))
    clf.train(X, y, max_iteration=200)
    assert np.all(np.isfinite(np.asarray(clf.gains)))
    assert np.all(np.isfinite(np.asarray(clf.hypothesis)))
    s = np.asarray(clf.score_original(X)).reshape(-1)
    assert np.all(np.isfinite(s))


def test_perceptron_two_points(key):
    X = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
    y = jnp.asarray([1.0, -1.0])
    clf = DiffCo(kernel_func=kernels.RQKernel(5.0))
    clf.train(X, y, max_iteration=100)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')
    s = np.asarray(clf.poly_score(X)).reshape(-1)
    assert s[0] > 0 > s[1]


# ---------------------------------------------------------------------------
# trajectory optimization degenerate problems


def _free_space_score():
    # a proxy that says "free everywhere" with a gentle slope
    def dist_est(p):
        return -1.0 + 0.01 * jnp.sum(p, axis=-1)
    return dist_est


def test_adam_trajopt_start_equals_target():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    q0 = jnp.asarray([0.3, -0.4])
    rec = optim.adam_traj_optimize(
        robot, _free_space_score(), q0, q0,
        {'N_WAYPOINTS': 8, 'NUM_RE_TRIALS': 2, 'MAXITER': 20, 'seed': 0})
    sol = np.asarray(rec['solution'])
    assert rec['success']
    assert np.all(np.isfinite(sol))
    assert np.allclose(sol[0], np.asarray(q0), atol=1e-6)
    assert np.allclose(sol[-1], np.asarray(q0), atol=1e-6)
    # the zero-length path is optimal: cost ~ 0
    assert rec['cost'] < 1e-3


def test_al_trajopt_start_equals_target():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    q0 = jnp.asarray([0.3, -0.4])
    rec = optim.al_traj_optimize(
        robot, _free_space_score(), q0, q0,
        {'N_WAYPOINTS': 8, 'NUM_RE_TRIALS': 2, 'MAXITER': 20, 'seed': 0})
    assert np.all(np.isfinite(np.asarray(rec['solution'])))
    assert rec['cost'] < 1e-2
