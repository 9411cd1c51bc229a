"""Regression tests for the URDF/mesh/native review pass: rigid-group
ACM adjacency, keep_joints restriction, revolute-only wrapping,
unsupported joint types, COLLADA unit scaling, primitive decomposition
caps, and the native loader's bool probe."""
import os
import textwrap

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu.geometry.mesh import load_dae, spheres_from_primitive
from diffco_tpu.robots.urdf import URDFRobot
from diffco_tpu.robots.kinematics import chain_from_joint_list


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return str(p)


_WRIST_URDF = """\
    <robot name="wrist">
      <link name="base"/>
      <link name="arm">
        <collision><geometry><sphere radius="0.08"/></geometry></collision>
      </link>
      <link name="flange">
        <collision><origin xyz="0 0 0.05"/>
          <geometry><sphere radius="0.05"/></geometry></collision>
      </link>
      <link name="hand">
        <collision><origin xyz="0 0 0.04"/>
          <geometry><sphere radius="0.05"/></geometry></collision>
      </link>
      <link name="finger">
        <collision><origin xyz="0 0 0.02"/>
          <geometry><sphere radius="0.03"/></geometry></collision>
      </link>
      <joint name="j1" type="revolute">
        <parent link="base"/><child link="arm"/><axis xyz="0 0 1"/>
        <limit lower="-2" upper="2"/>
      </joint>
      <joint name="jf" type="fixed">
        <origin xyz="0 0 0.1"/>
        <parent link="arm"/><child link="flange"/>
      </joint>
      <joint name="jh" type="fixed">
        <origin xyz="0 0 0.08"/>
        <parent link="flange"/><child link="hand"/>
      </joint>
      <joint name="j2" type="prismatic">
        <origin xyz="0 0 0.06"/>
        <parent link="hand"/><child link="finger"/><axis xyz="1 0 0"/>
        <limit lower="0" upper="0.04"/>
      </joint>
    </robot>
"""


def test_acm_rigid_group_adjacency(tmp_path):
    """Links joined through CHAINS of fixed joints are one rigid body and
    links one moving joint away from that body are adjacent: none of
    these pairs may be self-collision-checked (the old direct-parent +
    top-moving-ancestor pairing missed finger-vs-flange)."""
    path = _write(tmp_path, 'wrist.urdf', _WRIST_URDF)
    robot = URDFRobot(path)
    checked = set()
    li = np.asarray(robot.sphere_link_idx)
    for i, j in zip(np.asarray(robot._self_pair_i),
                    np.asarray(robot._self_pair_j)):
        a, b = int(li[i]), int(li[j])
        checked.add((min(a, b), max(a, b)))
    idx = robot.spec.link_index
    flange, hand, finger = idx('flange'), idx('hand'), idx('finger')
    arm = idx('arm')
    # rigid group {arm, flange, hand}: internal pairs never checked
    for pair in [(arm, flange), (arm, hand), (flange, hand)]:
        assert (min(pair), max(pair)) not in checked
    # finger is one moving joint from that group: adjacent to ALL of it
    for other in (arm, flange, hand):
        assert (min(finger, other), max(finger, other)) not in checked


def test_keep_joints_freezes_others(tmp_path):
    path = _write(tmp_path, 'wrist.urdf', _WRIST_URDF)
    robot = URDFRobot(path, keep_joints=['j1'])
    assert robot.dof == 1
    # frozen prismatic: finger stays at its joint origin for any q
    rot, tr = robot.fk_poses(jnp.zeros((1, 1)))
    full = URDFRobot(path)
    rot2, tr2 = full.fk_poses(jnp.zeros((1, 2)))
    assert np.allclose(np.asarray(tr), np.asarray(tr2), atol=1e-6)
    with pytest.raises(ValueError, match='keep_joints'):
        URDFRobot(path, keep_joints=['nope'])


def test_wrap_masks_prismatic(tmp_path):
    path = _write(tmp_path, 'wrist.urdf', _WRIST_URDF)
    robot = URDFRobot(path)
    q = jnp.asarray([[4.0, 0.03]])       # revolute 4.0 rad, rail 0.03 m
    w = np.asarray(robot.wrap(q))[0]
    assert np.isclose(w[0], 4.0 - 2 * np.pi, atol=1e-6)   # wrapped
    assert np.isclose(w[1], 0.03, atol=1e-9)              # untouched


def test_floating_joint_rejected():
    joints = [dict(name='j', parent='a', child='b', type='floating',
                   axis=np.asarray([0, 0, 1.0]),
                   origin_rot=np.eye(3), origin_trans=np.zeros(3),
                   limits=None, mimic=None)]
    with pytest.raises(ValueError, match='floating'):
        chain_from_joint_list(joints, root_name='a')


def test_load_dae_applies_unit_scale(tmp_path):
    dae = _write(tmp_path, 'part.dae', """\
        <?xml version="1.0"?>
        <COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema">
          <asset><unit meter="0.001" name="millimeter"/>
                 <up_axis>Z_UP</up_axis></asset>
          <library_geometries><geometry id="g">
            <mesh><source id="g-positions">
              <float_array id="g-positions-array" count="6">
                1000 0 0 0 2000 0</float_array>
            </source></mesh>
          </geometry></library_geometries>
        </COLLADA>
    """)
    v, f = load_dae(dae)
    assert np.allclose(v, [[1.0, 0, 0], [0, 2.0, 0]], atol=1e-6)


def test_load_dae_y_up_conversion(tmp_path):
    dae = _write(tmp_path, 'part.dae', """\
        <?xml version="1.0"?>
        <COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema">
          <asset><up_axis>Y_UP</up_axis></asset>
          <library_geometries><geometry id="g">
            <mesh><source id="g-positions">
              <float_array id="g-positions-array" count="3">
                1 2 3</float_array>
            </source></mesh>
          </geometry></library_geometries>
        </COLLADA>
    """)
    v, f = load_dae(dae)
    assert np.allclose(v, [[1, -3, 2]], atol=1e-6)


def test_primitive_budget_and_degenerate_box():
    # long thin cylinder: the sphere budget caps the axial count
    c, r = spheres_from_primitive('cylinder',
                                  {'radius': 0.02, 'length': 2.0}, n=8)
    assert len(c) <= 8 and np.isfinite(r).all() and (r > 0).all()
    # zero-thickness plate: finite spheres, no divide-by-zero
    c2, r2 = spheres_from_primitive('box', {'size': [1.0, 1.0, 0.0]}, n=4)
    assert np.isfinite(c2).all() and np.isfinite(r2).all()
    assert (r2 > 0).all() and len(c2) >= 4


def test_native_available_is_bool():
    from diffco_tpu import native
    assert native.available() in (True, False)
