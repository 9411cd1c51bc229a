import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu import kernels
from diffco_tpu.perceptron import (
    DiffCo, DiffCoBeta, MultiDiffCo, perceptron_train_loop, masked_rbf_solve,
)
from diffco_tpu.geometry import Obstacles2D, planar_robot_signed_dist
from diffco_tpu.robots import RevolutePlanarRobot


def _dataset(key, n=400):
    """2-link planar robot vs circle+rect world, labeled by the JAX-native
    geometric ground truth."""
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (1.5, 1.0), 0.6),
        ('rect', (-1.0, -1.2), (1.2, 1.2)),
    ])
    q = robot.rand_configs(n, key)
    sd = planar_robot_signed_dist(robot, obs, q)
    dist = jnp.max(sd, axis=-1)
    labels = (dist > 0) * 2.0 - 1.0
    return robot, obs, q, labels, dist


def test_train_loop_separates(key):
    robot, obs, q, labels, dist = _dataset(key)
    K = kernels.RQKernel(10.0)(q, q)
    gains, hyp, it = perceptron_train_loop(K, labels, 1.0, 2000)
    acc = float(jnp.mean((hyp > 0) == (labels > 0)))
    assert acc > 0.95
    assert int(jnp.sum(gains != 0)) < len(q)  # sparse support set
    # hypothesis consistency: K @ gains == hypothesis
    assert np.allclose(np.asarray(K @ gains), np.asarray(hyp), atol=1e-2)


@pytest.mark.smoke
def test_diffco_train_and_scores(key):
    robot, obs, q, labels, dist = _dataset(key)
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0), beta=1.0)
    clf.train(q, labels, max_iteration=2000, distance=dist)
    # training accuracy on the training set via raw score
    score = np.asarray(clf.score_original(q)).reshape(-1)
    acc = np.mean((score > 0) == (np.asarray(labels) > 0))
    assert acc > 0.9
    # padded state invariants
    S = clf.support_points.shape[0]
    assert S % 128 == 0
    assert clf.gains.shape == (S,)
    nv = clf.num_valid
    assert np.all(np.asarray(clf.gains[nv:]) == 0)
    # hypothesis = kernel_matrix @ gains on the valid block (ref assert :196)
    km = np.asarray(clf.kernel_matrix)
    assert np.allclose(km[:nv, :nv] @ np.asarray(clf.gains[:nv]),
                       np.asarray(clf.hypothesis[:nv]), atol=1e-2)


def test_fit_poly_interpolates(key):
    robot, obs, q, labels, dist = _dataset(key)
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0))
    clf.train(q, labels, max_iteration=2000)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')
    # the RBF surrogate interpolates the labels at the supports
    nv = clf.num_valid
    sc = np.asarray(clf.poly_score(clf.support_points[:nv])).reshape(-1)
    yv = np.asarray(clf.y[:nv])
    assert np.allclose(sc, yv, atol=1e-2)


def test_poly_score_grad(key):
    robot, obs, q, labels, _ = _dataset(key, n=300)
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0))
    clf.train(q, labels, max_iteration=1500)
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')
    g = jax.grad(lambda x: clf.poly_score(x[None]).sum())(q[0])
    assert np.all(np.isfinite(np.asarray(g)))
    # numeric gradient check
    eps = 1e-2
    f = lambda x: float(clf.poly_score(x[None]).sum())
    for i in range(2):
        dq = np.zeros(2, np.float32)
        dq[i] = eps
        num = (f(q[0] + dq) - f(q[0] - dq)) / (2 * eps)
        assert np.isclose(num, float(g[i]), rtol=0.2, atol=5e-2)


def test_update_warm_start(key):
    """Active-learning style update: new samples + existing supports."""
    robot, obs, q, labels, _ = _dataset(key, n=500)
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0), max_num_supports=256)
    clf.train(q, labels, max_iteration=2000)
    it_first = clf.train_iterations
    nv = clf.num_valid
    supports = clf.support_points[:nv]

    k2 = jax.random.split(key)[0]
    new_q = robot.rand_configs(200, k2)
    obs2 = Obstacles2D.from_obstacle_list([
        ('circle', (1.4, 1.1), 0.6), ('rect', (-1.0, -1.2), (1.2, 1.2))])
    q_all = jnp.concatenate([new_q, supports], axis=0)
    sd = planar_robot_signed_dist(robot, obs2, q_all)
    labels_all = (jnp.max(sd, -1) > 0) * 2.0 - 1.0
    exist_mask = jnp.concatenate([
        jnp.zeros(len(new_q), bool), jnp.ones(nv, bool)])
    clf.train(q_all, labels_all, update=True, exist_mask=exist_mask,
              max_iteration=2000)
    score = np.asarray(clf.score_original(q_all)).reshape(-1)
    acc = np.mean((score > 0) == (np.asarray(labels_all) > 0))
    assert acc > 0.9


def test_max_num_supports_cap(key):
    robot, obs, q, labels, _ = _dataset(key)
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0), max_num_supports=32)
    clf.train(q, labels, max_iteration=2000)
    assert clf.support_points.shape[0] == 32
    assert clf.num_valid <= 32


def test_masked_rbf_solve():
    rng = np.random.RandomState(0)
    n, nv = 8, 5
    A = rng.rand(nv, nv).astype(np.float32)
    A = A @ A.T + np.eye(nv, dtype=np.float32)
    K = np.zeros((n, n), np.float32)
    K[:nv, :nv] = A
    y = np.zeros(n, np.float32)
    y[:nv] = rng.rand(nv)
    mask = np.arange(n) < nv
    w = np.asarray(masked_rbf_solve(jnp.asarray(K), jnp.asarray(y),
                                    jnp.asarray(mask)))
    want = np.linalg.solve(A, y[:nv])
    assert np.allclose(w[:nv], want, atol=1e-3)
    assert np.allclose(w[nv:], 0.0)


def test_multidiffco(key):
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (1.5, 1.0), 0.6, 0),
        ('rect', (-1.0, -1.2), (1.4, 1.4), 1),
    ])
    q = robot.rand_configs(600, key)
    sd = planar_robot_signed_dist(robot, obs, q)  # [N, 2]
    y = (sd > 0) * 2.0 - 1.0
    clf = MultiDiffCo(kernel_func=kernels.RQKernel(10.0))
    clf.train(q, y, max_iteration=3000)
    scores = np.asarray(clf.score(q))
    acc = np.mean((scores > 0) == (np.asarray(y) > 0))
    assert acc > 0.9
    clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')
    ps = np.asarray(clf.poly_score(q))
    assert ps.shape == (600, 2)
    acc_poly = np.mean((ps > 0) == (np.asarray(y) > 0))
    assert acc_poly > 0.85


def test_diffco_beta_distance_regression(key):
    robot, obs, q, labels, dist = _dataset(key, n=500)
    clf = DiffCoBeta(kernel_func=kernels.RQKernel(10.0),
                     rbf_kernel=kernels.Polyharmonic(1, 1))
    clf.train(q, dist, max_iteration=2000, n_left_out_points=100)
    est = np.asarray(clf.rbf_score(q)).reshape(-1)
    true = np.asarray(dist)
    # distance estimates correlate strongly with true distances
    corr = np.corrcoef(est, true)[0, 1]
    assert corr > 0.75


def test_fit_full_poly(key):
    """Polyharmonic + linear tail interpolation (ref fit_full_poly
    :321-354)."""
    robot, obs, q, labels, dist = _dataset(key, n=300)
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0))
    clf.train(q, labels, max_iteration=1500)
    clf.fit_full_poly(epsilon=1, k=2, lmbd=0.01, target='label')
    nv = clf.num_valid
    sc = np.asarray(clf.full_poly_score(clf.support_points[:nv])).reshape(-1)
    yv = np.asarray(clf.y[:nv])
    # interpolates labels at supports (looser: the linear tail + lmbd
    # regularization trade exactness for smoothness)
    assert np.mean((sc > 0) == (yv > 0)) > 0.95
    # and generalizes
    sc_all = np.asarray(clf.full_poly_score(q)).reshape(-1)
    acc = np.mean((sc_all > 0) == (np.asarray(labels) > 0))
    assert acc > 0.85


def test_lazy_train_loop_matches_dense(key):
    """perceptron_train_loop_lazy computes kernel rows on the fly via the
    identical pairwise_sqdist expansion, so it must reproduce the dense
    trainer's update sequence exactly."""
    from diffco_tpu.perceptron import perceptron_train_loop_lazy
    robot, obs, q, labels, dist = _dataset(key)
    kf = kernels.RQKernel(10.0)
    K = kf(q, q)
    g_d, h_d, it_d = perceptron_train_loop(K, labels, 1.0, 2000)
    g_l, h_l, it_l = perceptron_train_loop_lazy(q, labels, kf, 1.0, 2000)
    assert int(it_d) == int(it_l)
    assert np.allclose(np.asarray(g_d), np.asarray(g_l), atol=1e-4)
    assert np.allclose(np.asarray(h_d), np.asarray(h_l), atol=1e-4)


def test_lazy_multiclass_matches_dense(key):
    from diffco_tpu.perceptron import (
        multiclass_train_loop, multiclass_train_loop_lazy)
    robot, obs, q, labels, dist = _dataset(key)
    # two classes: collision-with-anything, and near-boundary band
    y2 = jnp.stack([labels, (jnp.abs(dist) < 0.3) * 2.0 - 1.0], axis=1)
    kf = kernels.RQKernel(10.0)
    K = kf(q, q)
    g_d, h_d, it_d = multiclass_train_loop(K, y2, 1.0, 2000, 2)
    g_l, h_l, it_l = multiclass_train_loop_lazy(q, y2, kf, 1.0, 2000, 2)
    assert int(it_d) == int(it_l)
    # the dense loop reads the diagonal off the materialized Gram while the
    # lazy loop computes k(x_i, x_i) directly — identical math up to fp32
    # cancellation in the |x|^2+|y|^2-2xy expansion, so allow small drift
    assert np.allclose(np.asarray(g_d), np.asarray(g_l), atol=2e-3)
    assert np.allclose(np.asarray(h_d), np.asarray(h_l), atol=2e-3)


def test_diffco_lazy_path_parity(key):
    """DiffCo.train routes through the lazy trainer above the threshold and
    produces the same support set / scores as the dense path."""
    robot, obs, q, labels, dist = _dataset(key, n=600)
    dense = DiffCo(kernel_func=kernels.RQKernel(10.0), beta=1.0)
    dense.train(q, labels, max_iteration=3000, distance=dist)
    lazy = DiffCo(kernel_func=kernels.RQKernel(10.0), beta=1.0)
    lazy.lazy_gram_threshold = 0           # force the large-N path
    lazy.train(q, labels, max_iteration=3000, distance=dist)
    assert lazy.num_valid == dense.num_valid
    assert np.allclose(np.asarray(lazy.support_points),
                       np.asarray(dense.support_points), atol=1e-5)
    assert np.allclose(np.asarray(lazy.kernel_matrix),
                       np.asarray(dense.kernel_matrix), atol=1e-4)
    qq = robot.rand_configs(64, jax.random.fold_in(key, 7))
    assert np.allclose(np.asarray(lazy.score_original(qq)),
                       np.asarray(dense.score_original(qq)), atol=1e-3)
    # warm-start update through the lazy path
    q2 = robot.rand_configs(200, jax.random.fold_in(key, 9))
    sd2 = planar_robot_signed_dist(robot, obs, q2)
    lab2 = (jnp.max(sd2, axis=-1) > 0) * 2.0 - 1.0
    nv = lazy.num_valid
    X_up = jnp.concatenate([lazy.support_points[:nv], q2], axis=0)
    sd_s = planar_robot_signed_dist(robot, obs, lazy.support_points[:nv])
    lab_s = (jnp.max(sd_s, axis=-1) > 0) * 2.0 - 1.0
    y_up = jnp.concatenate([lab_s, lab2], axis=0)
    mask = jnp.concatenate(
        [jnp.ones(nv, bool), jnp.zeros(len(q2), bool)], axis=0)
    lazy.train(X_up, y_up, update=True, exist_mask=mask, max_iteration=3000)
    score = np.asarray(lazy.score_original(X_up)).reshape(-1)
    assert np.mean((score > 0) == (np.asarray(y_up) > 0)) > 0.85


def test_lazy_large_n_memory_smoke(key):
    """A 20k-row training set never materializes the [N, N] Gram
    (~1.6 GB); the lazy path trains it in O(N) memory."""
    robot, obs, q, labels, dist = _dataset(key, n=20000)
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0), beta=1.0)
    assert clf.lazy_gram_threshold < 20000
    clf.train(q, labels, max_iteration=60000)  # converges ~21k iters / 10 s
    score = np.asarray(clf.score_original(q)).reshape(-1)
    acc = np.mean((score > 0) == (np.asarray(labels) > 0))
    assert acc > 0.9


def test_pad_size_hysteresis(key):
    """The auto pad size never shrinks once grown: support counts that
    hover around a 128-slot boundary must not flip the padded shape (a
    flip recompiles every S-shaped program downstream)."""
    robot, obs, q, labels, dist = _dataset(key, n=600)
    clf = DiffCo(kernel_func=kernels.RQKernel(10.0), beta=1.0)
    clf.train(q, labels, max_iteration=3000)
    S0 = clf.support_points.shape[0]
    # retrain on a tiny subset -> far fewer supports, same pad size
    clf2_count_pad = clf._pad_size(2)
    assert clf2_count_pad == S0
    clf.train(q[:100], labels[:100], max_iteration=500)
    assert clf.support_points.shape[0] == S0
    # explicit max_num_supports still wins
    capped = DiffCo(kernel_func=kernels.RQKernel(10.0), beta=1.0,
                    max_num_supports=256)
    capped.train(q, labels, max_iteration=3000)
    assert capped.support_points.shape[0] == 256
