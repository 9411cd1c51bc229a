import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu import kernels
from diffco_tpu.perceptron import MultiDimDiffCo
from diffco_tpu.geometry import Obstacles2D, planar_robot_signed_dist
from diffco_tpu.robots import RevolutePlanarRobot


def test_multidim_rq_kernel_shape(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (5, 3, 2))   # 5 configs, 3 control pts, 2d
    y = jax.random.normal(k2, (7, 3, 2))
    kern = kernels.MultiDimRQKernel(gamma=2.0)
    K = kern(x, y)
    assert K.shape == (5, 7, 3)
    # per-control-point value matches scalar RQ on that point
    scalar = kernels.RQKernel(2.0)
    want = np.asarray(scalar(x[:, 1, :], y[:, 1, :]))
    assert np.allclose(np.asarray(K[:, :, 1]), want, atol=1e-4)


def test_multidim_diffco_trains(key):
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (1.5, 1.0), 0.6), ('rect', (-1.2, -1.0), (1.2, 1.2))])
    q = robot.rand_configs(500, key)
    sd = planar_robot_signed_dist(robot, obs, q)
    y = (jnp.max(sd, -1) > 0) * 2.0 - 1.0

    clf = MultiDimDiffCo(kernel_func=kernels.MultiDimRQKernel(10.0),
                         transform=lambda x: robot.fkine(x))
    clf.train(q, y, max_iteration=1500)
    score = np.asarray(clf.score_original(q)).reshape(-1)
    acc = np.mean((score > 0) == (np.asarray(y) > 0))
    assert acc > 0.85
    # vector gains: one gain per control point per support
    assert clf.gains.ndim == 2 and clf.gains.shape[1] == 2

    clf.fit_poly(kernels.MultiDimRQKernel(10.0), target='label')
    ps = np.asarray(clf.poly_score(q)).reshape(-1)
    acc_poly = np.mean((ps > 0) == (np.asarray(y) > 0))
    assert acc_poly > 0.8
