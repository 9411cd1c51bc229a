"""High-DOF rope robot fit (ref examples/tests/test_rope.py:18-46:
rope URDF, 10000 samples, TPR >= 0.9 — scaled down for CI speed)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffco_tpu as dc
from diffco_tpu.robot_data import generate_rope_urdf


def _T(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


def test_rope_urdf_fit(tmp_path):
    path = generate_rope_urdf(n_links=12, link_length=0.08, radius=0.012,
                              path=str(tmp_path / 'rope.urdf'))
    robot = dc.URDFRobot(path, setup_acm=False, link_spheres=4)
    assert robot._n_dofs == 12
    # rope hangs from origin; obstacles around it
    # obstacles inside the rope's reachable ball (random +-2pi joints curl
    # the rope near the base)
    env = dc.ShapeEnv(shapes={
        'box1': {'type': 'Box', 'params': {'extents': [0.25, 0.25, 0.25]},
                 'transform': _T([0.18, 0.0, 0.05])},
        'sphere1': {'type': 'Sphere', 'params': {'radius': 0.15},
                    'transform': _T([-0.15, 0.15, -0.05])},
    })
    fkdc = dc.ForwardKinematicsDiffCo(robot=robot, environment=env)
    acc, tpr, tnr = fkdc.fit(num_samples=3000, verbose=True)
    assert tpr >= 0.9  # reference gate (test_rope.py:43-46)


def test_rope_fk_chain_consistency(tmp_path):
    path = generate_rope_urdf(n_links=8, path=str(tmp_path / 'rope8.urdf'))
    robot = dc.URDFRobot(path, setup_acm=False)
    q = jnp.zeros((1, 8))
    rot, tr = robot.fk_poses(q)
    tr = np.asarray(tr)[0]
    # straight rope at zero config: links stacked along +z
    zs = tr[:, 2]
    assert np.all(np.diff(zs) >= -1e-6)
    assert np.isclose(zs.max(), 0.05 * 7, atol=1e-5)
