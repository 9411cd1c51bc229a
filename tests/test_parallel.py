"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu.parallel import (
    make_mesh, sharded_score_sweep, support_parallel_score_fn,
    sharded_gram, distributed_fit_step, distributed_trajopt_step,
)
from diffco_tpu import kernels
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.geometry import Obstacles2D, planar_robot_signed_dist
from diffco_tpu.ops.fused_score import _poly_score_xla


@pytest.fixture(scope='module')
def mesh():
    assert len(jax.devices()) == 8, 'tests expect 8 virtual devices'
    return make_mesh(('dp', 'tp'), (4, 2))


def test_sharded_score_sweep(mesh):
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([('circle', (1.5, 1.0), 0.6)])
    q = robot.rand_configs(1000, jax.random.PRNGKey(0))

    def gt(qq):
        return planar_robot_signed_dist(robot, obs, qq).max(axis=-1)

    out = sharded_score_sweep(gt, q, mesh)
    ref = gt(q)
    assert out.shape == (1000,)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_support_parallel_score(mesh, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    supports = jax.random.normal(k1, (100, 6))
    weights = jax.random.normal(k2, (100,))
    valid = jnp.arange(100) < 77
    x = jax.random.normal(k3, (32, 6))
    fn = support_parallel_score_fn(supports, weights, valid, mesh)
    got = np.asarray(jax.jit(fn)(x)).reshape(-1)
    want = np.asarray(_poly_score_xla(
        x, supports, weights * valid)).reshape(-1)
    assert np.allclose(got, want, atol=1e-3)


def test_sharded_gram(mesh, key):
    X = jax.random.normal(key, (50, 4))
    kern = kernels.RQKernel(5.0)
    K = sharded_gram(kern, X, mesh)
    Kref = kern(X, X)
    assert np.allclose(np.asarray(K), np.asarray(Kref), atol=1e-4)


def test_distributed_fit_step(mesh, key):
    X = jax.random.normal(key, (64, 4))
    y = jnp.sign(X[:, 0])
    kern = kernels.RQKernel(5.0)
    gains, hyp, nodes = distributed_fit_step(kern, X, y, mesh, n_iters=64)
    acc = float(jnp.mean((hyp > 0) == (y > 0)))
    assert acc > 0.8
    assert np.all(np.isfinite(np.asarray(nodes)))


def test_distributed_trajopt_step(mesh, key):
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    k1, k2, k3 = jax.random.split(key, 3)
    supports = jax.random.normal(k1, (64, 4))
    weights = jax.random.normal(k2, (64,)) * 0.01

    def score_fn(p):
        pts = robot.fkine(p).reshape(p.shape[0], -1)
        return _poly_score_xla(pts, supports, weights).reshape(-1)

    inits = jax.random.uniform(k3, (8, 10, 2), minval=-1, maxval=1)
    out = distributed_trajopt_step(robot.fkine, score_fn, inits,
                                   robot.limits, mesh)
    out = np.asarray(out)
    assert out.shape == (8, 10, 2)
    # endpoints unchanged
    assert np.allclose(out[:, 0], np.asarray(inits)[:, 0], atol=1e-6)
    assert np.allclose(out[:, -1], np.asarray(inits)[:, -1], atol=1e-6)
    assert np.all(np.isfinite(out))
