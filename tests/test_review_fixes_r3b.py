"""Regression tests for the second round-3 review pass: mesh routing of
the FK checker's score sweep and the hybrid checker's ground-truth
recheck, the lazy trainer's no-replication contract, and the benchmark
harness's short-config-file accounting."""
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffco_tpu as dc
from diffco_tpu.geometry import Obstacles2D, planar_robot_collision
from diffco_tpu.parallel import make_mesh
from diffco_tpu.robots import RevolutePlanarRobot

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))


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


def test_fk_checker_collision_score_uses_mesh_sweep(mesh):
    """ForwardKinematicsDiffCo.collision_score(q) must route through the
    dp-sharded sweep when a mesh is set (its q_link_pos override used to
    shadow the base class's mesh path entirely), and still agree with the
    direct perceptron route."""
    robot, obs, gt = _planar_world()
    ck = dc.ForwardKinematicsDiffCo(robot=robot, gt_check_func=gt, seed=3,
                                    mesh=mesh)
    ck.fit(num_samples=128, verify_ratio=0.25)

    ck._mesh_sweep_fn = None     # forget any program built during fit
    q = robot.rand_configs(37, jax.random.PRNGKey(4))
    got = np.asarray(ck.collision_score(q)).reshape(-1)
    assert ck._mesh_sweep_fn is not None, (
        'collision_score(q) bypassed the meshed sweep')
    direct = (np.asarray(ck.perceptron.poly_score(q)).reshape(-1)
              + ck.safety_bias)
    assert got.shape == direct.shape
    assert np.allclose(got, direct, atol=1e-5)

    # the link-position entry point this override exists for still works
    pts = ck.tensorized_fkine(q)
    via_points = np.asarray(ck.collision_score(q_link_pos=pts)).reshape(-1)
    assert np.allclose(via_points, got, atol=1e-5)


def test_hybrid_gt_recheck_is_mesh_sharded(mesh):
    """HybridForwardKinematicsDiffCo.collision must run its exact-geometry
    recheck through _gt_labels (padded + dp-sharded under a mesh), not a
    raw gt_check_func call on the unsharded batch."""
    robot, obs, gt = _planar_world()
    seen_batches = []

    def recording_gt(qq):
        seen_batches.append(int(jnp.asarray(qq).shape[0]))
        return gt(qq)

    ck = dc.HybridForwardKinematicsDiffCo(
        robot=robot, gt_check_func=recording_gt, seed=5, mesh=mesh)
    ck.fit(num_samples=128, verify_ratio=0.25)

    seen_batches.clear()
    q = robot.rand_configs(37, jax.random.PRNGKey(6))
    labels = np.asarray(ck.collision(q))
    assert labels.shape == (37,)
    # 37 rows on an 8-device data axis pad to 40: the recheck went
    # through _pad_shard, proving the sharded route
    assert seen_batches == [40]

    # semantics unchanged: uncertain rows take GT, certain rows the proxy
    unbias = np.asarray(ck.collision_score(q, bias=0)).reshape(-1)
    uncertain = ((unbias + ck.safety_bias > 0)
                 & (unbias - ck.safety_bias < 0))
    gt_labels = np.asarray(gt(q)).reshape(-1)
    expect = np.where(uncertain, gt_labels,
                      unbias + ck.safety_bias > 0)
    assert np.array_equal(labels, expect.astype(bool))


def test_lazy_mesh_train_skips_replication(mesh, monkeypatch):
    """The lazy (large-N) sharded trainer must not build a fully
    replicated copy of the feature matrix — O(N) per-device memory is the
    whole point of the lazy path."""
    from diffco_tpu.parallel import sharding as sh
    from diffco_tpu.perceptron import DiffCo
    from diffco_tpu import kernels

    calls = []
    real_replicate = sh.replicate

    def counting_replicate(x, m):
        calls.append(np.shape(x))
        return real_replicate(x, m)

    monkeypatch.setattr(sh, 'replicate', counting_replicate)

    robot, obs, gt = _planar_world()
    key = jax.random.PRNGKey(7)
    q = robot.rand_configs(96, key)
    y = jnp.where(jnp.asarray(gt(q)), 1.0, -1.0)

    perc = DiffCo(kernel_func=kernels.RQKernel(10), mesh=mesh)
    perc.lazy_gram_threshold = 64          # force the lazy path at N=96
    perc.train(q, y, max_iteration=3 * 96)
    assert perc.num_valid > 0
    # the dataset rows must never have been replicated ([96-ish, F]);
    # small warm-start/state vectors are allowed
    assert not any(len(s) >= 2 and s[0] >= 96 for s in calls), calls

    # parity: same data, same knobs, unsharded reference run
    perc_ref = DiffCo(kernel_func=kernels.RQKernel(10))
    perc_ref.lazy_gram_threshold = 64
    perc_ref.train(q, y, max_iteration=3 * 96)
    qs = robot.rand_configs(17, jax.random.PRNGKey(8))
    a = np.asarray(perc.score(qs)).reshape(-1)
    b = np.asarray(perc_ref.score(qs)).reshape(-1)
    assert np.allclose(a, b, atol=1e-4)


def test_load_test_configs_short_file_warns(tmp_path, capsys):
    """A configs file with fewer pairs than requested must warn loudly
    (short envs silently skewed per-env matrix stats)."""
    import speed_compare

    d = {'env_name': 'dummy', 'start_cfgs': [[0.0, 0.0], [0.1, 0.1]],
         'target_cfgs': [[1.0, 1.0], [0.9, 0.9]]}
    path = tmp_path / 'test_configs_dummy_2d.json'
    path.write_text(json.dumps(d))
    pairs = speed_compare.load_test_configs(str(tmp_path), 'dummy', 2, 5)
    assert len(pairs) == 2
    out = capsys.readouterr().out
    assert 'WARNING' in out and '2/5' in out
