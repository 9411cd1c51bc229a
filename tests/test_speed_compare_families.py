"""Env-family bundles of the benchmark harness (scripts/speed_compare.py).

The harness dispatches env names to families (planar arms / SE2 rigid
body / Baxter-vs-3D-scene) through a uniform bundle; every downstream
stage (methods, repair, RRT escalation, corridor AL) is family-agnostic.
These tests build each family at tiny sizes and check the bundle
contract the stages rely on. Full-size e2e rows are recorded in
benchmarks/speed_compare_matrix.json.
"""
import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                'scripts'))
import speed_compare as sc


def _args(**kw):
    base = dict(num_train=400, seed=3, fit_target='dist',
                link_length=3.5, safety_margin=-0.3)
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.mark.parametrize('env_name,want_dof', [
    ('1rect_1circle', 2), ('se2_default', 3), ('baxter_default', 7)])
def test_bundle_contract(env_name, want_dof):
    b = sc.build_env_bundle(env_name, 2, _args())
    robot = b['robot']
    limits = np.asarray(robot.limits)
    assert limits.shape == (want_dof, 2)
    # score closures evaluate and give finite scalars per config
    fns = b['score_fns'](b['checker'])
    q = robot.rand_configs(8, __import__('jax').random.PRNGKey(0))
    for name in ('proxy_dist', 'proxy_binary', 'gt_dist'):
        v = np.asarray(fns[name](q))
        assert v.shape == (8,) and np.all(np.isfinite(v)), name
    # exact-collision closure agrees with the sign of gt_dist
    col = np.asarray(b['gt_col'](q))
    assert col.shape == (8,)
    assert np.array_equal(col, np.asarray(fns['gt_dist'](q)) > 0)
    # corridor retraining (the public corridor_update API the harness now
    # calls) rebuilds a proxy of the same kind on a widened dataset
    from diffco_tpu.checkers import corridor_update
    cfgs, labels, dists = b['base_dataset']
    assert len(cfgs) == 400 and cfgs.shape[1] == want_dof
    path = np.stack([cfgs[0], cfgs[1]])
    ck2, samples, sd = corridor_update(
        (cfgs, labels, dists), [path], limits, fns['gt_dist'],
        b['retrain'], np.random.RandomState(0), n_total=64)
    assert samples.shape == (64, want_dof) and sd.shape == (64,)
    assert type(ck2) is type(b['checker'])
    v2 = np.asarray(b['score_fns'](ck2)['proxy_dist'](q))
    assert np.all(np.isfinite(v2))
    assert isinstance(b['margin'], float) and b['margin'] < 0
