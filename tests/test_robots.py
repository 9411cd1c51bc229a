import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu.robots import (
    RevolutePlanarRobot, RigidPlanarBody, RigidBody, BaxterLeftArmFK,
    BaxterDualArmFK, PandaFK, DualPandaFK, PointRobot1D,
    chain_from_joint_list, fk_link_poses, fk_selected_positions,
)


def test_planar_robot_straight():
    robot = RevolutePlanarRobot(1.0, link_width=0.3, dof=3)
    q = jnp.zeros((1, 3))
    pts = np.asarray(robot.fkine(q))
    assert pts.shape == (1, 3, 2)
    assert np.allclose(pts[0], [[1, 0], [2, 0], [3, 0]], atol=1e-6)


def test_planar_robot_right_angle():
    robot = RevolutePlanarRobot([1.0, 2.0], link_width=0.3)
    q = jnp.asarray([[np.pi / 2, -np.pi / 2]])
    pts = np.asarray(robot.fkine(q))
    # first joint at (0,1); second link rotates back to world x
    assert np.allclose(pts[0, 0], [0, 1], atol=1e-5)
    assert np.allclose(pts[0, 1], [2, 1], atol=1e-5)


def test_planar_robot_grad(key):
    robot = RevolutePlanarRobot(1.0, link_width=0.3, dof=7)
    q = jax.random.uniform(key, (7,), minval=-np.pi, maxval=np.pi)
    g = jax.grad(lambda qq: robot.fkine(qq).sum())(q)
    assert np.all(np.isfinite(np.asarray(g)))
    # numeric check
    eps = 1e-3
    f = lambda qq: float(robot.fkine(qq).sum())
    for i in range(7):
        dq = np.zeros(7, np.float32)
        dq[i] = eps
        num = (f(q + dq) - f(q - dq)) / (2 * eps)
        assert np.isclose(num, float(g[i]), atol=1e-2)


def test_rigid_planar_body():
    body = RigidPlanarBody([('box', (1.0, 0.0), (0.5, 0.5)),
                            ('box', (0.0, 1.0), (0.5, 0.5))])
    q = jnp.asarray([[2.0, 3.0, np.pi / 2]])
    pts = np.asarray(body.fkine(q))
    assert np.allclose(pts[0, 0], [2.0, 4.0], atol=1e-5)  # (1,0) -> (0,1)+t
    assert np.allclose(pts[0, 1], [1.0, 3.0], atol=1e-5)  # (0,1) -> (-1,0)+t


def test_rigid_body_se3():
    body = RigidBody(keypoints=[[1.0, 0.0, 0.0]])
    # rotate pi/2 about z, translate by (0, 0, 5)
    q = jnp.asarray([[0.0, 0.0, 5.0, 0.0, 0.0, np.pi / 2]])
    pts = np.asarray(body.fkine(q))
    assert np.allclose(pts[0, 0], [0.0, 1.0, 5.0], atol=1e-5)


def test_baxter_fk_shapes_and_reach():
    robot = BaxterLeftArmFK()
    q = jnp.zeros((2, 7))
    pts = np.asarray(robot.fkine(q))
    assert pts.shape == (2, 4, 3)  # fk_mask selects 4 control points
    # all control points within total arm length of base
    total = 0.27035 + 0.069 + 0.36435 + 0.069 + 0.37429 + 0.01 + 0.38735
    assert np.all(np.linalg.norm(pts, axis=-1) <= total + 1e-3)


def test_baxter_dual_arm():
    robot = BaxterDualArmFK()
    q = jnp.zeros((1, 14))
    pts = np.asarray(robot.fkine(q))
    assert pts.shape == (1, 8, 3)
    # left/right arms mirrored about x=0 at zero config
    left = pts[0, 0::2]
    right = pts[0, 1::2]
    assert np.allclose(left[:, 0], -right[:, 0], atol=1e-4)
    assert np.allclose(left[:, 1:], right[:, 1:], atol=1e-4)


def test_panda_fk():
    robot = PandaFK()
    q = jnp.zeros((1, 7))
    pts = np.asarray(robot.fkine(q))
    assert pts.shape == (1, 7, 3)  # 5 mask points + 2 finger points
    # finger points symmetric about the wrist
    assert np.allclose(pts[0, 5] + pts[0, 6], 2 * pts[0, 4], atol=0.3)
    total = 0.333 + 0.316 + 0.0825 * 2 + 0.384 + 0.088 + 0.214
    assert np.all(np.linalg.norm(pts, axis=-1) <= total + 1e-3)


def test_dual_panda_fk():
    robot = DualPandaFK()
    q = jnp.zeros((1, 14))
    pts = np.asarray(robot.fkine(q))
    assert pts.shape == (1, 14, 3)
    # left arm offset by 0.84 in y
    assert np.allclose(pts[0, :7, 1] - pts[0, 7:, 1], 0.84, atol=1e-5)


def test_point_robot_1d():
    robot = PointRobot1D([[0.0, 10.0], [0.0, 5.0]])
    q = jnp.asarray([[0.5]])
    pts = np.asarray(robot.fkine(q))
    assert np.allclose(pts, [[5.0]])


def test_rand_configs_within_limits(key):
    robot = PandaFK()
    q = np.asarray(robot.rand_configs(100, key))
    lims = np.asarray(robot.limits)
    assert np.all(q >= lims[:, 0]) and np.all(q <= lims[:, 1])


# ---------------------------------------------------------------------------
# chain FK

def _simple_chain():
    """2-link planar chain as a ChainSpec (z-axis revolute joints, links
    along +x), equivalent to RevolutePlanarRobot([1, 1])."""
    joints = [
        dict(name='j1', parent='base', child='l1', type='revolute',
             axis=(0, 0, 1), origin_rot=np.eye(3), origin_trans=(0, 0, 0),
             limits=(-np.pi, np.pi), mimic=None),
        dict(name='j2', parent='l1', child='l2', type='revolute',
             axis=(0, 0, 1), origin_rot=np.eye(3), origin_trans=(1, 0, 0),
             limits=(-np.pi, np.pi), mimic=None),
        dict(name='je', parent='l2', child='ee', type='fixed',
             axis=None, origin_rot=np.eye(3), origin_trans=(1, 0, 0),
             mimic=None),
    ]
    return chain_from_joint_list(joints)


def test_chain_fk_matches_planar():
    spec = _simple_chain()
    assert spec.n_dofs == 2
    robot = RevolutePlanarRobot(1.0, link_width=0.1, dof=2)
    qs = np.random.RandomState(0).uniform(-np.pi, np.pi, (20, 2)).astype(np.float32)
    fk = jax.vmap(lambda q: fk_link_poses(spec, q)[1])(jnp.asarray(qs))
    fk = np.asarray(fk)
    ref = np.asarray(robot.fkine(jnp.asarray(qs)))
    # chain link l1 sits at joint j2's child frame... positions:
    # l1 frame at origin (joint at base), l2 frame at first joint's end
    assert np.allclose(fk[:, spec.link_index('l2'), :2], ref[:, 0], atol=1e-4)
    assert np.allclose(fk[:, spec.link_index('ee'), :2], ref[:, 1], atol=1e-4)
    assert np.allclose(fk[:, :, 2], 0.0, atol=1e-6)


def test_chain_prismatic():
    joints = [
        dict(name='j1', parent='base', child='slider', type='prismatic',
             axis=(0, 0, 1), origin_rot=np.eye(3), origin_trans=(0, 0, 0.5),
             limits=(0.0, 2.0), mimic=None),
    ]
    spec = chain_from_joint_list(joints)
    rot, tr = fk_link_poses(spec, jnp.asarray([1.5]))
    assert np.allclose(np.asarray(tr)[spec.link_index('slider')],
                       [0, 0, 2.0], atol=1e-5)


def test_chain_mimic():
    joints = [
        dict(name='j1', parent='base', child='a', type='revolute',
             axis=(0, 0, 1), origin_rot=np.eye(3), origin_trans=(0, 0, 0),
             limits=(-1, 1), mimic=None),
        dict(name='j2', parent='a', child='b', type='revolute',
             axis=(0, 0, 1), origin_rot=np.eye(3), origin_trans=(1, 0, 0),
             mimic=('j1', -1.0, 0.0)),
        dict(name='je', parent='b', child='ee', type='fixed', axis=None,
             origin_rot=np.eye(3), origin_trans=(1, 0, 0), mimic=None),
    ]
    spec = chain_from_joint_list(joints)
    assert spec.n_dofs == 1
    _, tr = fk_link_poses(spec, jnp.asarray([np.pi / 2], dtype=jnp.float32))
    tr = np.asarray(tr)
    # mimic joint cancels the first rotation: ee = (0,1,0) + world-x
    assert np.allclose(tr[spec.link_index('ee')], [1, 1, 0], atol=1e-5)


def test_chain_fk_jit_and_grad():
    spec = _simple_chain()
    sel = [spec.link_index('l2'), spec.link_index('ee')]
    f = jax.jit(lambda q: fk_selected_positions(spec, q, sel).sum())
    g = jax.grad(f)(jnp.asarray([0.3, -0.2]))
    assert np.all(np.isfinite(np.asarray(g)))
