import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu import utils, kernels

pytestmark = pytest.mark.smoke  # fast single-core tier (pyproject)


def test_wrap2pi():
    x = np.linspace(-8 * np.pi, 8 * np.pi, 1001)
    w = np.asarray(utils.wrap2pi(jnp.asarray(x)))
    assert np.all(w >= -np.pi - 1e-6) and np.all(w < np.pi + 1e-6)
    # wrapping preserves angle mod 2pi
    assert np.allclose(np.cos(w), np.cos(x), atol=1e-5)
    assert np.allclose(np.sin(w), np.sin(x), atol=1e-5)


def test_rotations_orthonormal(key):
    phi = jax.random.uniform(key, (16, 3), minval=-np.pi, maxval=np.pi)
    R = np.asarray(utils.euler2mat(phi))
    eye = np.eye(3)
    for r in R:
        assert np.allclose(r @ r.T, eye, atol=1e-5)
        assert np.isclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_euler2mat_composition(key):
    # euler2mat = Rz @ Ry @ Rx
    phi = jax.random.normal(key, (5, 3))
    R = np.asarray(utils.euler2mat(phi))
    Rz = np.asarray(utils.rotz(phi[:, 2]))
    Ry = np.asarray(utils.roty(phi[:, 1]))
    Rx = np.asarray(utils.rotx(phi[:, 0]))
    assert np.allclose(R, Rz @ Ry @ Rx, atol=1e-5)


def test_axis_angle_matches_axis_aligned(key):
    ang = jax.random.normal(key, (7,))
    for axis, fn in [((1, 0, 0), utils.rotx), ((0, 1, 0), utils.roty),
                     ((0, 0, 1), utils.rotz)]:
        Ra = np.asarray(utils.axis_angle_mat(jnp.asarray(axis, jnp.float32), ang))
        Rf = np.asarray(fn(ang))
        assert np.allclose(Ra, Rf, atol=1e-5)


def test_dh2mat_structure(key):
    # DH transform must be a valid homogeneous transform with correct
    # closed-form entries.
    q = jax.random.normal(key, (4, 3))
    a = jnp.asarray([0.1, 0.2, 0.3])
    d = jnp.asarray([0.5, 0.0, 0.2])
    alpha = jnp.asarray([0.0, np.pi / 2, -np.pi / 2])
    tfs = np.asarray(utils.DH2mat(q, a, d, jnp.sin(alpha), jnp.cos(alpha)))
    assert tfs.shape == (4, 3, 4, 4)
    assert np.allclose(tfs[:, :, 3, :], [0, 0, 0, 1], atol=1e-6)
    qn = np.asarray(q)
    # entry checks against the standard DH matrix
    assert np.allclose(tfs[:, :, 0, 0], np.cos(qn), atol=1e-5)
    assert np.allclose(tfs[:, :, 2, 3], np.broadcast_to(d, qn.shape), atol=1e-5)
    # rotation block orthonormal
    R = tfs[:, :, :3, :3].reshape(-1, 3, 3)
    assert np.allclose(R @ np.transpose(R, (0, 2, 1)), np.eye(3), atol=1e-5)


def test_dense_path_fixed_shape():
    q = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 2.0]])
    dq = np.asarray(utils.dense_path(q, num_sub=4))
    assert dq.shape == (2 * 4 + 1, 2)
    assert np.allclose(dq[0], [0, 0]) and np.allclose(dq[-1], [1, 2])
    # equal spacing within each segment
    assert np.allclose(dq[1], [0.25, 0.0])
    assert np.allclose(dq[5], [1.0, 0.5])


def test_dense_path_params():
    q = np.array([[0.0, 0.0], [3.0, 0.0]])
    n = utils.dense_path_params(q, max_step=1.0)
    assert n == 3
    n2 = utils.dense_path_params(q, max_step=0.1, max_dense_waypoints=10)
    assert n2 == 10


# ---------------------------------------------------------------------------
# kernels: check against direct numpy formulas (independent re-derivation of
# the reference math in kernel.py).

def _np_sqdist(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


@pytest.fixture
def xy(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (13, 5))
    y = jax.random.normal(k2, (9, 5))
    return np.asarray(x), np.asarray(y)


def test_rq_kernel(xy):
    x, y = xy
    k = kernels.RQKernel(gamma=10.0, p=2)
    got = np.asarray(k(jnp.asarray(x), jnp.asarray(y)))
    want = 1.0 / (1.0 + 10.0 / 2 * _np_sqdist(x, y)) ** 2
    assert np.allclose(got, want, atol=1e-4)


def test_cauchy_kernel(xy):
    x, y = xy
    k = kernels.CauchyKernel(c=3.0)
    got = np.asarray(k(jnp.asarray(x), jnp.asarray(y)))
    want = 3.0 / (_np_sqdist(x, y) + 3.0)
    assert np.allclose(got, want, atol=1e-5)


def test_multiquadratic_kernel(xy):
    x, y = xy
    k = kernels.MultiQuadratic(epsilon=2.0)
    got = np.asarray(k(jnp.asarray(x), jnp.asarray(y)))
    want = np.sqrt(_np_sqdist(x, y) / 4.0 + 1)
    assert np.allclose(got, want, atol=1e-5)


def test_polyharmonic_odd(xy):
    x, y = xy
    k = kernels.Polyharmonic(k=1, epsilon=1.0)
    got = np.asarray(k(jnp.asarray(x), jnp.asarray(y)))
    want = np.sqrt(_np_sqdist(x, y))
    assert np.allclose(got, want, atol=1e-4)
    k3 = kernels.Polyharmonic(k=3, epsilon=2.0)
    got3 = np.asarray(k3(jnp.asarray(x), jnp.asarray(y)))
    want3 = np.sqrt(_np_sqdist(x, y)) ** 3 / 2.0
    assert np.allclose(got3, want3, atol=1e-3)


def test_polyharmonic_even_zero_diag(xy):
    x, _ = xy
    k = kernels.Polyharmonic(k=2, epsilon=1.0)
    got = np.asarray(k(jnp.asarray(x), jnp.asarray(x)))
    assert np.all(np.isfinite(got))
    assert np.allclose(np.diag(got), 0.0, atol=1e-5)
    r = np.sqrt(_np_sqdist(x, x))
    off = ~np.eye(len(x), dtype=bool)
    assert np.allclose(got[off], (r ** 2 * np.log(r + 1e-300))[off],
                       rtol=1e-4, atol=1e-3)


def test_tangent_kernel(xy):
    x, y = xy
    k = kernels.TangentKernel(a=0.1, c=0.2)
    got = np.asarray(k(jnp.asarray(x), jnp.asarray(y)))
    want = np.tanh(0.1 * x @ y.T + 0.2)
    assert np.allclose(got, want, atol=1e-4)


def test_weighted_kernel(xy):
    x, y = xy
    w = np.array([1.0, 0.5, 2.0, 0.0, 1.0])
    k = kernels.WeightedKernel(gamma=4.0, w=w, p=2)
    got = np.asarray(k(jnp.asarray(x), jnp.asarray(y)))
    want = 1.0 / (1.0 + 4.0 / 2 * _np_sqdist(x * w, y * w)) ** 2
    assert np.allclose(got, want, atol=1e-4)


def test_line_kernel(xy):
    x, y = xy
    x2 = np.concatenate([x[:6], x[6:12]], axis=1)  # [6, 10]
    y2 = np.concatenate([y[:4], y[4:8]], axis=1)
    base = kernels.RQKernel(1.0)
    k = kernels.LineKernel(base)
    got = np.asarray(k(jnp.asarray(x2), jnp.asarray(y2)))
    w1 = 1.0 / (1.0 + 0.5 * _np_sqdist(x2[:, :5], y2[:, :5])) ** 2
    w2 = 1.0 / (1.0 + 0.5 * _np_sqdist(x2[:, 5:], y2[:, 5:])) ** 2
    assert np.allclose(got, (w1 + w2) / 2, atol=1e-4)


def test_temporal_fk_kernel():
    fkine = lambda q: q * 2.0  # trivial "FK"
    k = kernels.TemporalFKKernel(fkine, kernels.RQKernel(1.0),
                                 kernels.RQKernel(1.0), alpha=3.0)
    xs = jnp.asarray([[0.0, 0.0, 0.1], [1.0, 0.0, 0.5]])
    ys = jnp.asarray([[0.0, 1.0, 0.2]])
    got = np.asarray(k(xs, ys))
    x_sp = np.asarray(xs[:, :2]) * 2
    y_sp = np.asarray(ys[:, :2]) * 2
    ks = 1 / (1 + 0.5 * _np_sqdist(x_sp, y_sp)) ** 2
    kt = 1 / (1 + 0.5 * _np_sqdist(np.asarray(xs[:, 2:]),
                                   np.asarray(ys[:, 2:]))) ** 2
    assert np.allclose(got, ks * kt ** 3, atol=1e-5)


def test_kernel_grad_finite(key):
    # Polyharmonic k=1 must have finite gradients even at support points.
    x = jax.random.normal(key, (4, 3))
    k = kernels.Polyharmonic(k=1, epsilon=1.0)

    def f(q):
        return k(q[None], x).sum()

    g = jax.grad(f)(x[0])
    assert np.all(np.isfinite(np.asarray(g)))
