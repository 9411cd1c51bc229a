"""FK correctness oracle across all available URDFs.

Mirrors the reference's examples/tests/test_urdf_robot.py:30-52, which
compares its FK against yourdfpy's scene-graph transforms for 1000 random
configurations with np.allclose(rtol=1e-4, atol=1e-6). yourdfpy is not
available here, so the oracle is an INDEPENDENT plain-numpy forward
kinematics evaluated directly from the parsed URDF joints (separate code
path from the jitted chain FK: python dict recursion, float64,
scipy-free rotation construction).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffco_tpu as dc
from diffco_tpu.robots.urdf import parse_urdf
from diffco_tpu.robots.kinematics import fk_link_poses, fk_link_poses_scan

HAS_ROBOT_DATA = os.path.isdir(dc.robot_description_folder)

URDFS = [
    'panda_description/urdf/panda.urdf',
    'panda_description/urdf/panda_no_gripper.urdf',
    'kuka_iiwa/urdf/iiwa7.urdf',
    '2link_robot.urdf',
    'fetch_description/urdf/fetch_arm_no_gripper.urdf',
    'kinova_description/urdf/jaco_clean.urdf',
    'allegro/urdf/allegro_hand_description_left.urdf',
    'trifinger_edu_description/trifinger_edu.urdf',
]


def _numpy_fk(joints, root, q_map):
    """Independent recursive FK in float64 numpy.

    joints: parse_urdf output. Returns {link: (R 3x3, t 3)}."""
    children = {}
    for j in joints:
        children.setdefault(j['parent'], []).append(j)

    def axis_rot(axis, angle):
        axis = np.asarray(axis, np.float64)
        n = np.linalg.norm(axis)
        axis = axis / n if n > 0 else np.array([0.0, 0, 1])
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        return (np.eye(3) + np.sin(angle) * K
                + (1 - np.cos(angle)) * (K @ K))

    out = {root: (np.eye(3), np.zeros(3))}

    def recurse(link):
        R_p, t_p = out[link]
        for j in children.get(link, []):
            R_f = np.asarray(j['origin_rot'], np.float64)
            t_f = np.asarray(j['origin_trans'], np.float64)
            if j['type'] in ('revolute', 'continuous'):
                qv = q_map.get(j['name'], 0.0)
                if j.get('mimic'):
                    src, mult, off = j['mimic']
                    qv = q_map.get(src, 0.0) * mult + off
                R_j = R_f @ axis_rot(j['axis'], qv)
                t_j = t_f
            elif j['type'] == 'prismatic':
                qv = q_map.get(j['name'], 0.0)
                if j.get('mimic'):
                    src, mult, off = j['mimic']
                    qv = q_map.get(src, 0.0) * mult + off
                R_j = R_f
                t_j = t_f + R_f @ (np.asarray(j['axis'], np.float64) * qv)
            else:
                R_j, t_j = R_f, t_f
            out[j['child']] = (R_p @ R_j, t_p + R_p @ t_j)
            recurse(j['child'])

    recurse(root)
    return out


@pytest.mark.skipif(not HAS_ROBOT_DATA, reason='robot data unavailable')
@pytest.mark.parametrize('rel', URDFS)
def test_fk_matches_numpy_oracle(rel):
    path = os.path.join(dc.robot_description_folder, rel)
    if not os.path.exists(path):
        pytest.skip(f'{rel} not present')
    robot = dc.URDFRobot(path, setup_acm=False)
    _, joints, _, root = parse_urdf(path)
    spec = robot.spec

    rng = np.random.RandomState(0)
    lims = np.asarray(robot.joint_limits)
    n_cfg = 50
    qs = rng.uniform(lims[:, 0], lims[:, 1],
                     (n_cfg, robot._n_dofs)).astype(np.float32)

    rot, tr = robot.fk_poses(jnp.asarray(qs))
    rot, tr = np.asarray(rot), np.asarray(tr)

    # map dofs back to joint names for the oracle
    dof_names = [''] * robot._n_dofs
    for li in range(spec.n_links):
        if spec.dof_idx[li] >= 0 and spec.mimic_mult[li] == 1.0 \
                and spec.mimic_offset[li] == 0.0:
            name = spec.joint_names[li]
            # non-mimic joints own their dof
            j = next(jj for jj in joints if jj['name'] == name)
            if j.get('mimic') is None:
                dof_names[int(spec.dof_idx[li])] = name

    for k in range(0, n_cfg, 10):
        q_map = {n: float(v) for n, v in zip(dof_names, qs[k]) if n}
        want = _numpy_fk(joints, root, q_map)
        for li, lname in enumerate(spec.link_names):
            R_w, t_w = want[lname]
            assert np.allclose(tr[k, li], t_w, rtol=1e-4, atol=1e-5), \
                f'{rel}:{lname} trans mismatch'
            assert np.allclose(rot[k, li], R_w, rtol=1e-4, atol=1e-4), \
                f'{rel}:{lname} rot mismatch'


@pytest.mark.skipif(not HAS_ROBOT_DATA, reason='robot data unavailable')
def test_unrolled_vs_scan_fk():
    path = os.path.join(dc.robot_description_folder,
                        'panda_description/urdf/panda.urdf')
    robot = dc.URDFRobot(path, setup_acm=False)
    q = robot.rand_configs(16, jax.random.PRNGKey(0))
    r1, t1 = jax.vmap(lambda qq: fk_link_poses(robot.spec, qq))(q)
    r2, t2 = jax.vmap(lambda qq: fk_link_poses_scan(robot.spec, qq))(q)
    assert np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    assert np.allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


@pytest.mark.skipif(not HAS_ROBOT_DATA, reason='robot data unavailable')
def test_all_urdfs_parse_and_build():
    for rel in URDFS:
        path = os.path.join(dc.robot_description_folder, rel)
        if not os.path.exists(path):
            continue
        robot = dc.URDFRobot(path, setup_acm=False, link_spheres=4)
        assert robot._n_dofs > 0, rel
        q = robot.rand_configs(4, jax.random.PRNGKey(1))
        pts = robot.fkine(q)
        assert np.all(np.isfinite(np.asarray(pts))), rel


def test_vendored_panda_matches_analytic_dh():
    """The vendored panda_simple URDF (robot_data.generate_panda_like_urdf)
    must reproduce the analytic Panda DH chain (robots.analytic.PandaFK)
    exactly: URDF link i+1 / hand positions == cumulative DH frame i
    translations. This oracle always runs — no third-party data needed."""
    from diffco_tpu import robot_data
    from diffco_tpu.robots import PandaFK
    robot_data.ensure_default_assets()
    path = os.path.join(robot_data.data_dir, 'panda_simple.urdf')
    urdf_robot = dc.URDFRobot(path, setup_acm=False)
    analytic = PandaFK()

    rng = np.random.RandomState(0)
    lims = np.asarray(analytic.limits)
    qs = jnp.asarray(rng.uniform(lims[:, 0], lims[:, 1], (20, 7)),
                     jnp.float32)
    _, tr = urdf_robot.fk_poses(qs)
    tr = np.asarray(tr)  # [B, n_links, 3]
    frames = analytic._fk_frames_soa(qs)
    link_names = list(urdf_robot.spec.link_names)
    for i in range(7):
        want = np.stack([np.asarray(c) for c in frames[i][1]], axis=-1)
        lname = f'panda_link{i + 2}' if i < 6 else 'panda_hand'
        li = link_names.index(lname)
        assert np.allclose(tr[:, li], want, atol=1e-4), lname


def test_vendored_two_link_parses():
    from diffco_tpu import robot_data
    robot_data.ensure_default_assets()
    robot = dc.URDFRobot(os.path.join(robot_data.data_dir,
                                      '2link_robot.urdf'), setup_acm=False)
    assert robot._n_dofs == 2
    q = robot.rand_configs(8, jax.random.PRNGKey(0))
    pts = robot.fkine(q)
    assert np.all(np.isfinite(np.asarray(pts)))


def _vendored_fk_parity(urdf_name, n_cfg=20):
    """Run the independent numpy-FK oracle against a vendored asset
    (always available — no third-party mount needed)."""
    from diffco_tpu import robot_data
    robot_data.ensure_default_assets()
    path = os.path.join(robot_data.data_dir, urdf_name)
    robot = dc.URDFRobot(path, setup_acm=False)
    _, joints, _, root = parse_urdf(path)
    spec = robot.spec

    rng = np.random.RandomState(0)
    lims = np.asarray(robot.joint_limits)
    qs = rng.uniform(lims[:, 0], lims[:, 1],
                     (n_cfg, robot._n_dofs)).astype(np.float32)
    rot, tr = robot.fk_poses(jnp.asarray(qs))
    rot, tr = np.asarray(rot), np.asarray(tr)

    dof_names = [''] * robot._n_dofs
    for li in range(spec.n_links):
        if spec.dof_idx[li] >= 0:
            name = spec.joint_names[li]
            j = next(jj for jj in joints if jj['name'] == name)
            if j.get('mimic') is None:
                dof_names[int(spec.dof_idx[li])] = name
    for k in range(n_cfg):
        q_map = {n: float(v) for n, v in zip(dof_names, qs[k]) if n}
        want = _numpy_fk(joints, root, q_map)
        for li, lname in enumerate(spec.link_names):
            R_w, t_w = want[lname]
            assert np.allclose(tr[k, li], t_w, rtol=1e-4, atol=1e-5), \
                f'{urdf_name}:{lname} trans mismatch'
            assert np.allclose(rot[k, li], R_w, rtol=1e-4, atol=1e-4), \
                f'{urdf_name}:{lname} rot mismatch'
    return robot


def test_vendored_trifinger_branching_fk():
    """Branching kinematic tree (3 fingers off one base): every link pose
    must match the independent numpy oracle, and the three fingers must
    move independently."""
    robot = _vendored_fk_parity('trifinger_simple.urdf')
    assert robot._n_dofs == 9
    # moving finger 0's joints must not move finger 1/2 links
    q0 = jnp.zeros((1, 9), jnp.float32)
    q1 = q0.at[0, 0].set(0.7)
    _, t0 = robot.fk_poses(q0)
    _, t1 = robot.fk_poses(q1)
    names = list(robot.spec.link_names)
    moved = np.abs(np.asarray(t1) - np.asarray(t0)).max(axis=-1)[0]
    for li, n in enumerate(names):
        if n.startswith(('finger1', 'finger2')):
            assert moved[li] < 1e-6, n
    tip0 = names.index('finger0_link2')
    assert moved[tip0] > 0.01


def test_vendored_lift_prismatic_mimic_fk():
    """Prismatic torso + mimic gripper: oracle parity plus explicit
    mimic semantics (right finger tracks -1 * left finger)."""
    robot = _vendored_fk_parity('lift_rig.urdf')
    assert robot._n_dofs == 3   # torso, elbow, finger_l (finger_r mimics)
    names = list(robot.spec.link_names)
    il, ir = names.index('finger_l'), names.index('finger_r')
    q = jnp.asarray([[0.2, 0.0, 0.03]], jnp.float32)
    _, t = robot.fk_poses(q)
    t = np.asarray(t)[0]
    # torso lift moves everything up by q[0] + origins
    assert np.isclose(t[il][2], t[ir][2], atol=1e-6)
    # fingers displace symmetrically about the arm axis (y = +-(0.04+q))
    assert np.isclose(t[il][1] + t[ir][1], 0.0, atol=1e-6)
    assert np.isclose(t[il][1] - t[ir][1], 2 * (0.04 + 0.03), atol=1e-5)
