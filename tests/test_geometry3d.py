import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu.geometry import (
    sphere_sdf, box_sdf, cylinder_sdf, capsule_sdf, scene_from_dict,
    spheres_vs_scene_signed_dist, sphere_set_self_distance,
    rect_rect_signed_dist, rigid_body_signed_dist, Obstacles2D,
    spheres_from_primitive, spheres_from_mesh,
)
from diffco_tpu.geometry.mesh import load_stl, load_obj


def T(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


def test_point_sdfs():
    p = jnp.asarray([2.0, 0.0, 0.0])
    assert np.isclose(float(sphere_sdf(p, 0.5)), 1.5, atol=1e-5)
    assert np.isclose(float(box_sdf(p, jnp.asarray([1.0, 1.0, 1.0]))), 1.0,
                      atol=1e-5)
    # inside the box
    assert float(box_sdf(jnp.asarray([0.0, 0.0, 0.5]),
                         jnp.asarray([1.0, 1.0, 1.0]))) < 0
    assert np.isclose(float(cylinder_sdf(p, 0.5, 1.0)), 1.5, atol=1e-5)
    # capsule cap: point above the axis end
    pc = jnp.asarray([0.0, 0.0, 2.0])
    assert np.isclose(float(capsule_sdf(pc, 0.3, 1.0)), 0.7, atol=1e-5)


def test_scene_from_dict_and_query():
    scene, names = scene_from_dict({
        'b': {'type': 'Box', 'params': {'extents': [1, 1, 1]},
              'transform': T([3, 0, 0])},
        's': {'type': 'Sphere', 'params': {'radius': 0.5},
              'transform': T([-3, 0, 0])},
        'c': {'type': 'Cylinder', 'params': {'radius': 0.5, 'height': 2},
              'transform': T([0, 3, 0])},
        'k': {'type': 'Capsule', 'params': {'radius': 0.3, 'height': 1},
              'transform': T([0, -3, 0])},
    })
    assert scene.n_objects == 4
    centers = jnp.asarray([[0.0, 0.0, 0.0]])
    radii = jnp.asarray([0.25])
    sd = np.asarray(spheres_vs_scene_signed_dist(centers, radii, scene))
    # all separated: sphere(0.25 radius) at origin
    assert np.all(sd < 0)
    # box at distance 3 - 0.5 - 0.25 = 2.25
    assert np.isclose(sd[1], -2.25, atol=1e-4)
    # overlapping probe
    sd2 = np.asarray(spheres_vs_scene_signed_dist(
        jnp.asarray([[3.0, 0.0, 0.0]]), radii, scene))
    assert sd2[1] > 0


def test_scene_rotated_box():
    Trot = np.eye(4)
    th = np.pi / 4
    Trot[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    Trot[0, 3] = 2.0
    scene, _ = scene_from_dict({
        'b': {'type': 'Box', 'params': {'extents': [2, 2, 2]},
              'transform': Trot}})
    # corner of the rotated box reaches sqrt(2) towards origin
    sd = np.asarray(spheres_vs_scene_signed_dist(
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([0.0]), scene))
    assert np.isclose(sd[0], -(2 - np.sqrt(2)), atol=1e-3)


def test_self_distance():
    centers = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [5.0, 0, 0]])
    radii = jnp.asarray([0.6, 0.6, 0.6])
    sd = np.asarray(sphere_set_self_distance(
        centers, radii, jnp.asarray([0, 0]), jnp.asarray([1, 2])))
    assert sd[0] > 0       # 0-1 overlap (1.2 > 1.0)
    assert sd[1] < 0       # 0-2 separated


def test_spheres_from_primitive_cover():
    c, r = spheres_from_primitive('box', {'size': [2.0, 0.4, 0.4]})
    # cover check: corners of the box inside some sphere
    corners = np.array([[x, y, z] for x in (-1, 1) for y in (-0.2, 0.2)
                        for z in (-0.2, 0.2)])
    d = np.linalg.norm(corners[:, None] - c[None], axis=-1) - r[None]
    assert np.all(d.min(1) <= 1e-5)
    c2, r2 = spheres_from_primitive('cylinder',
                                    {'radius': 0.3, 'length': 1.2})
    rim = np.array([[0.3, 0, 0.6], [0, -0.3, -0.6]])
    d2 = np.linalg.norm(rim[:, None] - c2[None], axis=-1) - r2[None]
    assert np.all(d2.min(1) <= 1e-5)


def test_mesh_loaders(tmp_path):
    # write a tiny ascii STL (unit triangle)
    stl = tmp_path / 't.stl'
    stl.write_text(
        'solid t\nfacet normal 0 0 1\nouter loop\n'
        'vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n'
        'endloop\nendfacet\nendsolid t\n')
    v, f = load_stl(str(stl))
    assert v.shape == (3, 3) and f.shape == (1, 3)
    obj = tmp_path / 't.obj'
    obj.write_text('v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3 4\n')
    v2, f2 = load_obj(str(obj))
    assert v2.shape == (4, 3) and f2.shape == (2, 3)  # quad -> 2 tris
    c, r = spheres_from_mesh(v2, f2, n_spheres=2)
    assert len(c) >= 1 and np.all(r > 0)


def test_rigid_body_2d_signed_dist_grad():
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (3.0, 0.0), 0.5), ('rect', (-3.0, 0.0), (1.0, 1.0))])
    body = [((0.0, 0.0), (1.0, 0.5))]

    def f(q):
        return jnp.sum(rigid_body_signed_dist(body, obs, q[None]))

    g = jax.grad(f)(jnp.asarray([0.5, 0.2, 0.3]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_generated_mesh_assets_watertight():
    """The procedural SE3 body meshes (scripts/generate_mesh_assets.py,
    mount-free stand-ins for the reference's object_meshes assets) must
    be closed, consistently-oriented surfaces: every directed edge
    appears exactly once and its reverse exactly once. The torus must
    also keep its hole through sphere decomposition."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..',
                                      'scripts'))
    from generate_mesh_assets import torus_mesh, lbracket_mesh

    for name, (v, f) in [('torus', torus_mesh()),
                         ('lbracket', lbracket_mesh())]:
        edges = {}
        for tri in f:
            for a, b in ((tri[0], tri[1]), (tri[1], tri[2]),
                         (tri[2], tri[0])):
                key = (int(a), int(b))
                assert key not in edges, f'{name}: duplicated edge {key}'
                edges[key] = True
        for a, b in edges:
            assert (b, a) in edges, f'{name}: boundary edge ({a},{b})'

    v, f = torus_mesh()
    c, r = spheres_from_mesh(v, f, n_spheres=16)
    assert np.all(r > 0)
    # no covering sphere may swallow the hole: centers stay on the ring
    ring_d = np.linalg.norm(np.asarray(c)[:, :2], axis=1)
    assert ring_d.min() > 0.2
