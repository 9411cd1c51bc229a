import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu import kernels
from diffco_tpu.dynamics import (LinearMotion, SineMotion, Dynamic1DChecker,
                                 temporal_dataset)
from diffco_tpu.perceptron import DiffCo
from diffco_tpu.robots import PointRobot1D
from diffco_tpu.profiling import Timers, CheckCounter


def test_motions():
    # reference signatures (deprecated/Obstacles.py:74-89):
    # LinearMotion(A, B) = A*t + B, called via predict()
    lin = LinearMotion(0.5, 2.0)
    assert np.isclose(float(lin.predict(jnp.asarray(4.0))), 4.0)
    assert np.isclose(float(lin(jnp.asarray(4.0))), 4.0)   # __call__
    # SineMotion(A, alpha, beta, bias) = A*sin(alpha*t + beta) + bias
    sin = SineMotion(2.0, np.pi / 2, 0.0, 1.0)
    assert np.isclose(float(sin.predict(jnp.asarray(1.0))), 3.0, atol=1e-5)
    # vector-valued motion (extension; position() alias retained)
    lin2 = LinearMotion([1.0, 0.0], [0.0, 1.0])
    p = np.asarray(lin2.position(jnp.asarray([0.0, 2.0])))
    assert np.allclose(p, [[0, 1], [2, 1]], atol=1e-6)


def test_dynamic_checker_and_temporal_fit(key):
    gt = Dynamic1DChecker([(LinearMotion(0.5, 2.0), 0.6),
                           (SineMotion(2.0, 0.8, 0.0, 7.0), 0.5)])
    limits = [[0.0, 10.0], [0.0, 10.0]]
    xt, labels, dists = temporal_dataset(gt, limits, 2000, key)
    assert 0.05 < float(jnp.mean(labels > 0)) < 0.8

    robot = PointRobot1D(limits)
    kern = kernels.TemporalFKKernel(
        fkine=lambda x: x, rqkernel=kernels.RQKernel(100.0),
        t_rqkernel=kernels.RQKernel(100.0), alpha=3.0)
    clf = DiffCo(kernel_func=kern)
    xt_n = robot.normalize(xt)
    clf.train(xt_n, labels, max_iteration=2000)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')
    k2 = jax.random.split(key)[0]
    xt2, y2, _ = temporal_dataset(gt, limits, 1000, k2)
    preds = (np.asarray(clf.poly_score(robot.normalize(xt2))).reshape(-1)
             > 0) * 2 - 1
    acc = (preds == np.asarray(y2)).mean()
    assert acc > 0.9


def test_timers_and_counter():
    timers = Timers()
    with timers.span('a'):
        sum(range(1000))
    with timers.span('a'):
        pass
    s = timers.summary()
    assert s['a']['count'] == 2 and s['a']['total_s'] >= 0

    counter = CheckCounter()
    fn = counter.wrap(lambda q: q)
    fn(jnp.zeros((7, 2)))
    fn(jnp.zeros((3, 2)))
    assert counter.count == 10
