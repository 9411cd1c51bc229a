"""Native exactgeom backend: build + parity with the JAX geometry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu import native
from diffco_tpu.geometry import (scene_from_dict,
                                 spheres_vs_scene_signed_dist,
                                 sphere_set_self_distance)


def T(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


@pytest.fixture(scope='module')
def scene():
    s, names = scene_from_dict({
        'b': {'type': 'Box', 'params': {'extents': [1, 1, 1]},
              'transform': T([2, 0, 0])},
        's': {'type': 'Sphere', 'params': {'radius': 0.5},
              'transform': T([-2, 0, 0])},
        'c': {'type': 'Cylinder', 'params': {'radius': 0.4, 'height': 2},
              'transform': T([0, 2, 0])},
        'k': {'type': 'Capsule', 'params': {'radius': 0.3, 'height': 1},
              'transform': T([0, -2, 0])},
    })
    return s


def test_native_builds():
    assert native.available()
    assert native.load().exactgeom_version() == 1


def test_native_matches_jax_scene_query(scene, key):
    centers = np.asarray(jax.random.normal(key, (64, 5, 3))) * 1.5
    radii = np.asarray([0.1, 0.2, 0.15, 0.05, 0.3])
    ns = native.NativeScene(scene)
    got = native.spheres_vs_scene(centers, radii, ns)
    want = np.asarray(jax.vmap(
        lambda c: jnp.max(spheres_vs_scene_signed_dist(
            c, jnp.asarray(radii, jnp.float32), scene)))(
                jnp.asarray(centers, jnp.float32)))
    assert np.allclose(got, want, atol=1e-4)


def test_native_self_collision(key):
    centers = np.asarray(jax.random.normal(key, (32, 6, 3)))
    radii = np.full(6, 0.4)
    pi = np.asarray([0, 1, 2], np.int32)
    pj = np.asarray([3, 4, 5], np.int32)
    got = native.self_collision(centers, radii, pi, pj)
    want = np.asarray(jax.vmap(lambda c: jnp.max(sphere_set_self_distance(
        c, jnp.asarray(radii, jnp.float32), jnp.asarray(pi),
        jnp.asarray(pj))))(jnp.asarray(centers, jnp.float32)))
    assert np.allclose(got, want, atol=1e-4)


def test_native_point_sdf(scene, key):
    pts = np.asarray(jax.random.normal(key, (50, 3))) * 2
    ns = native.NativeScene(scene)
    got = native.point_sdf(pts, ns)
    want = np.asarray(scene.point_sdf_per_object(
        jnp.asarray(pts, jnp.float32)))
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-4)
