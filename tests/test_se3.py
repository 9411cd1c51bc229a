"""Property tests for the SE(3)/SO(3) module (exp/log identities,
quaternion round trips) — the oracles the reference implies via its
Murray-convention utilities (se3_so3_util.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu import se3


def _rand_omega(key, n, max_angle=np.pi - 1e-3):
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (n, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jax.random.uniform(k2, (n, 1), minval=0.0, maxval=max_angle)
    return axis * angle


def test_exp_log_so3_roundtrip(key):
    omega = _rand_omega(key, 256)
    R = se3.exp_so3(omega)
    back = se3.log_so3(R)
    assert np.allclose(np.asarray(back), np.asarray(omega), atol=1e-4)


def test_log_exp_so3_roundtrip_matrices(key):
    # includes near-pi and tiny angles
    angles = jnp.concatenate([
        jnp.asarray([[1e-9, 0, 0], [0, np.pi - 1e-4, 0]]),
        _rand_omega(key, 64)])
    R = se3.exp_so3(angles)
    R2 = se3.exp_so3(se3.log_so3(R))
    assert np.allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_rotation_matrix_orthonormal(key):
    R = se3.exp_so3(_rand_omega(key, 128))
    eye = jnp.matmul(R, jnp.swapaxes(R, -1, -2))
    assert np.allclose(np.asarray(eye),
                       np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    assert np.allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_quaternion_roundtrip(key):
    omega = _rand_omega(key, 256)
    q = se3.axis_angle_to_quaternion(omega)
    assert np.allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0,
                       atol=1e-6)
    back = se3.quaternion_to_axis_angle(q)
    assert np.allclose(np.asarray(back), np.asarray(omega), atol=1e-4)


def test_quaternion_matrix_consistency(key):
    omega = _rand_omega(key, 128)
    R_direct = se3.exp_so3(omega)
    R_via_q = se3.quaternion_to_matrix(se3.axis_angle_to_quaternion(omega))
    assert np.allclose(np.asarray(R_direct), np.asarray(R_via_q), atol=1e-5)
    q_back = se3.matrix_to_quaternion(R_direct)
    q_ref = se3.axis_angle_to_quaternion(omega)
    assert np.allclose(np.asarray(q_back), np.asarray(q_ref), atol=1e-4)


def test_exp_log_se3_roundtrip(key):
    k1, k2 = jax.random.split(key)
    xi = jnp.concatenate([_rand_omega(k1, 128),
                          jax.random.normal(k2, (128, 3))], axis=-1)
    T = se3.exp_se3(xi)
    back = se3.log_se3(T)
    # fp32: the V^{-1} term loses ~3 digits to cancellation near theta=pi
    assert np.allclose(np.asarray(back), np.asarray(xi),
                       rtol=1e-3, atol=1e-3)
    # homogeneous structure
    assert np.allclose(np.asarray(T[..., 3, :]),
                       np.broadcast_to([0, 0, 0, 1], T[..., 3, :].shape),
                       atol=1e-7)


def test_se3_inverse(key):
    k1, k2 = jax.random.split(key)
    xi = jnp.concatenate([_rand_omega(k1, 64),
                          jax.random.normal(k2, (64, 3))], axis=-1)
    T = se3.exp_se3(xi)
    eye = jnp.matmul(T, se3.se3_inverse(T))
    assert np.allclose(np.asarray(eye),
                       np.broadcast_to(np.eye(4), eye.shape), atol=1e-5)


def test_se3_interpolate_endpoints_and_geodesic(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    T0 = se3.exp_se3(jnp.concatenate(
        [_rand_omega(k1, 8), jax.random.normal(k2, (8, 3))], axis=-1))
    T1 = se3.exp_se3(jnp.concatenate(
        [_rand_omega(k3, 8), jax.random.normal(k4, (8, 3))], axis=-1))
    at0 = se3.se3_interpolate(T0, T1, jnp.asarray(0.0))
    at1 = se3.se3_interpolate(T0, T1, jnp.asarray(1.0))
    assert np.allclose(np.asarray(at0), np.asarray(T0), atol=1e-4)
    assert np.allclose(np.asarray(at1), np.asarray(T1), atol=1e-4)
    # composition along the geodesic: T(0.5) then T(0.5->1) equals T1
    mid = se3.se3_interpolate(T0, T1, jnp.asarray(0.5))
    second = se3.se3_interpolate(mid, T1, jnp.asarray(1.0))
    assert np.allclose(np.asarray(second), np.asarray(T1), atol=1e-4)


def test_integrate_and_error(key):
    omega0 = _rand_omega(key, 16)
    w = jnp.ones_like(omega0) * 0.1
    out = se3.integrate_axis_angle(omega0, w, 0.0)
    # zero dt -> same rotation (possibly different representative)
    assert np.allclose(np.asarray(se3.exp_so3(out)),
                       np.asarray(se3.exp_so3(omega0)), atol=1e-4)
    err = se3.angular_error(omega0, omega0)
    assert np.allclose(np.asarray(err), 0.0, atol=1e-4)


def test_jit_and_vmap_compatible(key):
    omega = _rand_omega(key, 32)
    jitted = jax.jit(se3.exp_so3)
    assert np.allclose(np.asarray(jitted(omega)),
                       np.asarray(se3.exp_so3(omega)), atol=1e-6)
    vm = jax.vmap(lambda o: se3.log_so3(se3.exp_so3(o)))(omega)
    assert np.allclose(np.asarray(vm), np.asarray(omega), atol=1e-4)


def test_gradients_flow(key):
    """exp/log are differentiable — needed for SE(3) trajopt."""
    omega = _rand_omega(key, 4)

    def loss(o):
        T = se3.exp_se3(jnp.concatenate([o, jnp.zeros_like(o)], axis=-1))
        return jnp.sum(T[..., :3, 3] ** 2) + jnp.sum(se3.log_so3(
            se3.exp_so3(o)) ** 2)

    g = jax.grad(loss)(omega)
    assert np.all(np.isfinite(np.asarray(g)))
