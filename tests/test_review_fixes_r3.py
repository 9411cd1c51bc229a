"""Regression tests for the round-3 review findings: meshed multi-output
sweep guard, score-program cache reuse across refits, the keyless-robot
geometry cache, and the fused-kernel frame-order guard."""
import gc

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffco_tpu as dc
from diffco_tpu.geometry import Obstacles2D, planar_robot_collision
from diffco_tpu.geometry import geometry2d
from diffco_tpu.parallel import make_mesh
from diffco_tpu.perceptron import MultiDiffCo
from diffco_tpu.robots import RevolutePlanarRobot


@pytest.fixture(scope='module')
def mesh():
    return make_mesh(('dp',), (8,))


def _planar_world():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (1.2, 0.8), 0.5), ('rect', (-1.0, -1.0), (0.8, 0.8))])

    def gt(qq):
        return planar_robot_collision(robot, obs, qq)

    return robot, obs, gt


def test_mesh_sweep_multi_output_matches_direct(mesh):
    """A multi-output ([B, C]) perceptron's meshed sweep must keep the
    class axis per shard (an earlier per-shard [b, 1] flatten interleaved
    classes): _sweep_scores must match the direct poly_score route to
    float tolerance (shard boundaries reorder the reductions), mesh or
    no mesh."""
    robot, obs, gt = _planar_world()
    ck = dc.RBFDiffCo(robot=robot, gt_check_func=gt, seed=2, mesh=mesh,
                      perceptron_class=MultiDiffCo)
    q = robot.rand_configs(96, jax.random.PRNGKey(0))
    labels = np.where(np.asarray(gt(q)), 1.0, -1.0)
    y = np.stack([labels, -labels], axis=1)    # 2 classes, [B, 2]
    ck.perceptron.train(jnp.asarray(q), jnp.asarray(y),
                        max_iteration=3 * 96)
    from diffco_tpu import kernels
    ck.perceptron.fit_poly(kernel_func=kernels.Polyharmonic(1, 1),
                           target='label')

    qs = robot.rand_configs(37, jax.random.PRNGKey(5))
    direct = np.asarray(ck.perceptron.poly_score(qs)).reshape(-1)
    swept = np.asarray(ck._sweep_scores(qs))
    assert swept.shape == direct.shape == (37 * 2,)
    assert np.allclose(swept, direct, atol=1e-4)
    # interleaving-detector: each config's per-class pair must line up
    # exactly (class 1 was trained as the negation of class 0)
    pairs = swept.reshape(37, 2)
    assert np.allclose(pairs[:, 0], -pairs[:, 1], atol=1e-4)


def test_refit_reuses_score_programs(mesh):
    """fit() / update() must NOT rebuild the jitted score wrappers when
    the inference kernel is unchanged — the trained state travels as jit
    operands, so invalidating per refit forces a pointless retrace (and a
    full XLA recompile per active-learning update on backends without a
    persistent cache)."""
    robot, obs, gt = _planar_world()
    ck = dc.RBFDiffCo(robot=robot, gt_check_func=gt, seed=7, mesh=mesh)
    ck.fit(num_samples=128, verify_ratio=0.25)

    # force both caches to build
    fn1 = ck.score_fn()
    q = robot.rand_configs(16, jax.random.PRNGKey(1))
    np.asarray(fn1(q))
    np.asarray(ck._sweep_scores(robot.rand_configs(24, jax.random.PRNGKey(2))))
    score_obj = ck._score_fn
    sweep_obj = ck._mesh_sweep_fn
    assert score_obj is not None and sweep_obj is not None

    ck.update(num_samples=16)
    assert ck._score_fn is score_obj
    assert ck._mesh_sweep_fn is sweep_obj

    # the reused programs must serve the NEW state (operands, not burned
    # into the trace): scores after the update reflect the refit support
    s = np.asarray(ck.score_fn()(q)).reshape(-1)
    perc = ck.perceptron
    kv = np.asarray(perc.rbf_kernel(perc._apply_transform(q),
                                    perc.support_transformed))
    kv = kv * np.asarray(perc.valid_mask, np.float32)[None, :]
    expect = kv @ np.asarray(perc.rbf_nodes).reshape(-1) + ck.safety_bias
    assert np.allclose(s, expect, atol=1e-4)


def test_keyless_robot_geometry_cache_not_global():
    """Robots without geom_static_key stash their compiled geometry
    closures on the instance: the module-global cache must not grow (an
    id()-keyed global entry would pin every instance for the process
    lifetime)."""
    obs = Obstacles2D.from_obstacle_list([('circle', (1.0, 1.0), 0.5)])

    class KeylessRobot(RevolutePlanarRobot):
        geom_static_key = None      # opt out of the static-geometry key

    before = len(geometry2d._planar_sd_cache)
    robots = []
    for i in range(3):
        r = KeylessRobot(1.0, link_width=0.2, dof=2)
        q = r.rand_configs(8, jax.random.PRNGKey(i))
        np.asarray(planar_robot_collision(r, obs, q))
        assert getattr(r, '_planar_sd_fns_cache', None) is not None
        robots.append(r)
    assert len(geometry2d._planar_sd_cache) == before
    del robots
    gc.collect()


def test_static_key_cache_shared_across_instances():
    """Same static geometry -> one cache entry, reused across instances."""
    obs = Obstacles2D.from_obstacle_list([('circle', (1.0, 1.0), 0.5)])
    r1 = RevolutePlanarRobot(1.3, link_width=0.25, dof=3)
    r2 = RevolutePlanarRobot(1.3, link_width=0.25, dof=3)
    q = r1.rand_configs(8, jax.random.PRNGKey(0))
    np.asarray(planar_robot_collision(r1, obs, q))
    n = len(geometry2d._planar_sd_cache)
    np.asarray(planar_robot_collision(r2, obs, q))
    assert len(geometry2d._planar_sd_cache) == n


def test_robot_spec_rejects_unsorted_frames():
    """Unsorted point_specs frame ids must raise (not assert: the fused
    kernel's suffix-sum backward would be silently wrong under -O)."""
    from diffco_tpu.ops import fk_score
    from diffco_tpu.robots import PandaFK

    class BadOrder(PandaFK):
        def __init__(self):
            super().__init__()
            self._point_specs = list(reversed(self._point_specs))

    with pytest.raises(ValueError, match='non-decreasing'):
        fk_score.robot_spec(BadOrder())


def test_bench_tput_fallback_nonzero():
    """bench.py's estimator must never emit a zero headline record when
    the difference of minima degenerates."""
    import importlib
    bench = importlib.import_module('bench')
    # healthy case: pure difference quotient
    assert bench._difference_tput(100, 5, 10, 1.0, 1.5) == 100 * 5 / 0.5
    # spike landed on the long run -> conservative naive fallback, not 0
    assert bench._difference_tput(100, 5, 10, 2.0, 1.5) == 100 * 10 / 1.5
    assert bench._difference_tput(100, 5, 10, 1.5, 1.5) > 0
