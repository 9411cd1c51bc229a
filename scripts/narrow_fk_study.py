#!/usr/bin/env python
"""Narrow-passage representation study: can a better FEATURE SPACE let a
proxy thread 7d_narrow without the escalation ladder?

Round-4 finding (benchmarks/RESULTS.md corridor-AL study): the RQ+
polyharmonic proxy on RAW joint angles cannot pin a 300-box wall in 7-D
— corridor retraining raises band accuracy but carves false-free tunnels
(missed-collisions 0.003 -> 0.075), and every single-init method's
strict/feasible stays 0.0 on the 7d_narrow row. The reference's own
design answer to exactly this regime is the FK workspace transform
(ref collision_checkers.py:345-394: kernel distances over link control
points instead of joint angles). This study measures, on the SAME env,
dataset size and staged problems as the matrix row:

  variants:
    raw          — RQKernel(10) on joint angles (the matrix proxy)
    fk_g{g}      — RQKernel(g) on fkine link endpoints, g swept
    fk+al        — best fk variant + corridor retrain (corridor_update)
    raw+al       — raw + corridor retrain (round-4 comparison point)
    multi_k{K}   — MultiDiffCo: per-class gains over K x-binned box
                   clusters, served as max over class scores

  metrics per variant:
    holdout acc/missed-col on 2000 fresh uniform configs
    corridor-band acc/missed-col on path_band_samples around a GT plan
      (round-4 methodology, same scales)
    trajopt: adam + AL on the 5 staged problems,
      straight-line + random restarts (NO plan seeding, NO repair),
      margin -0.05 / dense_sub 8 (the corridor-AL re-run rules) —
      'threads' = feasible AND GT-valid optimizer path.

Writes benchmarks/narrow_fk_study.json incrementally. The GT corridor
plan (RRT-Connect on exact geometry, minutes) is cached in /tmp.

Usage: python scripts/run_cpu.py scripts/narrow_fk_study.py [--quick]
"""
import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu import kernels, optim
from diffco_tpu.perceptron import DiffCo, MultiDiffCo
from diffco_tpu.checkers import corridor_update
from diffco_tpu.sampler import path_band_samples
from diffco_tpu.geometry import (Obstacles2D, planar_robot_signed_dist,
                                 planar_robot_collision)
from diffco_tpu.envs.presets2d import get_env
from diffco_tpu.robots import RevolutePlanarRobot

from speed_compare import (load_test_configs, plan_gt_path, validate_gt,
                           CORRIDOR_BUCKET)

OUT = 'benchmarks/narrow_fk_study.json'
PLAN_CACHE = '/tmp/narrow_fk_plan.pkl'


def band_metrics(score_fn, samples, gt_free):
    """acc + missed-collision rate (proxy says free, world says not)."""
    s = np.asarray(score_fn(jnp.asarray(samples))).reshape(len(samples))
    pred_free = s <= 0
    acc = float(np.mean(pred_free == gt_free))
    n_col = max(1, int((~gt_free).sum()))
    missed = float(np.sum(pred_free & ~gt_free) / n_col)
    return {'acc': round(acc, 4), 'missed_col': round(missed, 4),
            'n': int(len(samples)), 'n_col': int((~gt_free).sum())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true',
                    help='tiny sizes, smoke only')
    ap.add_argument('--num-train', type=int, default=6000)
    ap.add_argument('--seed', type=int, default=1917)
    args = ap.parse_args()
    if args.quick:
        args.num_train = 800

    dof = 7
    link_length = 3.5 * 2 / dof
    obstacles = get_env('7d_narrow')
    # x-binned cluster classes for the multi-class variant: boxes sharing
    # an x-band form one class, so each class boundary is a simpler shape
    # than the whole wall
    K_CLUST = 8
    xs = np.asarray([o[1][0] for o in obstacles])
    bins = np.clip(((xs + 8.0) / 16.0 * K_CLUST).astype(int), 0,
                   K_CLUST - 1)
    obstacles_cls = [(o[0], o[1], o[2], int(b))
                     for o, b in zip(obstacles, bins)]

    robot = RevolutePlanarRobot(link_length, link_width=0.3, dof=dof)
    obs = Obstacles2D.from_obstacle_list(obstacles_cls)
    classes = np.asarray(obs.obstacle_classes)

    @jax.jit
    def gt_sd_all(q):                     # [B, n_obs]
        return planar_robot_signed_dist(robot, obs, q)

    def gt_dist(q):
        return gt_sd_all(q).max(axis=-1)

    def gt_col(q):
        return planar_robot_collision(robot, obs, q)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    cfgs = robot.rand_configs(args.num_train, k1)
    sd = np.asarray(gt_sd_all(cfgs))                    # [N, n_obs]
    dists = sd.max(axis=-1)
    labels = (dists > 0) * 2.0 - 1.0
    # per-class distances for MultiDiffCo
    dist_cls = np.stack([
        np.where(classes[None, :] == c, sd, -np.inf).max(axis=-1)
        for c in range(K_CLUST)], axis=-1)              # [N, K]
    label_cls = (dist_cls > 0) * 2.0 - 1.0

    q_hold = robot.rand_configs(2000, k2)
    hold_free = np.asarray(gt_dist(q_hold)) <= 0

    def retrain_raw(c, l, d):
        ck = DiffCo(kernel_func=kernels.RQKernel(10.0))
        ck.train(jnp.asarray(c), jnp.asarray(l),
                 max_iteration=3 * len(c), distance=jnp.asarray(d))
        ck.fit_poly(kernels.Polyharmonic(1, 1), target='dist')
        return ck

    def make_retrain_fk(gamma):
        def retrain(c, l, d):
            ck = DiffCo(kernel_func=kernels.RQKernel(gamma),
                        transform=robot.fkine)
            ck.train(jnp.asarray(c), jnp.asarray(l),
                     max_iteration=3 * len(c), distance=jnp.asarray(d))
            ck.fit_poly(kernels.Polyharmonic(1, 1), target='dist')
            return ck
        return retrain

    out = {'env': '7d_narrow', 'dof': dof, 'num_train': args.num_train,
           'seed': args.seed, 'k_clusters': K_CLUST, 'variants': {}}
    if os.path.exists(OUT) and not args.quick:
        out = json.load(open(OUT))

    def save():
        with open(OUT, 'w') as f:
            json.dump(out, f, indent=1)

    # ---- GT corridor plan (cached: RRT on exact geometry takes minutes)
    pairs = load_test_configs('benchmarks/test_configs', '7d_narrow',
                              dof, 5)
    assert pairs is not None, 'staged 7d_narrow configs required'
    if args.quick:
        pairs = pairs[:1]
    if os.path.exists(PLAN_CACHE):
        plan = pickle.load(open(PLAN_CACHE, 'rb'))
    else:
        s0, t0 = pairs[0]
        print('planning GT corridor path (RRT-Connect on exact '
              'geometry)...', flush=True)
        t0_ = time.time()
        plan = plan_gt_path(robot, gt_col, s0, t0, args.seed)
        print(f'plan: {None if plan is None else len(plan)} waypoints in '
              f'{time.time() - t0_:.0f}s', flush=True)
        assert plan is not None, 'GT planner failed — rerun with new seed'
        pickle.dump(plan, open(PLAN_CACHE, 'wb'))

    rng = np.random.RandomState(args.seed)
    band = path_band_samples([plan], np.asarray(robot.limits), rng,
                             n_total=4096 if not args.quick else 512)
    band_free = np.asarray(gt_dist(jnp.asarray(band))) <= 0
    out['band_free_fraction'] = round(float(band_free.mean()), 4)

    # ---- variants --------------------------------------------------------
    def add_variant(name, ck, score_fn):
        if name in out['variants'] and 'trajopt' in out['variants'][name] \
                and not args.quick:
            print(f'{name}: cached, skipping', flush=True)
            return
        t0 = time.time()
        v = {'train_time': None,
             'n_support': int(ck.num_valid) if ck is not None else None,
             'holdout': band_metrics(score_fn, np.asarray(q_hold),
                                     hold_free),
             'band': band_metrics(score_fn, band, band_free)}
        print(f'{name}: holdout {v["holdout"]} band {v["band"]}',
              flush=True)
        # trajopt: straight-line + random restarts, no plan, no repair
        topts = {'N_WAYPOINTS': 20, 'NUM_RE_TRIALS': 5, 'MAXITER': 200,
                 'safety_margin': -0.05, 'dense_sub': 8, 'max_speed': 2.0,
                 'seed': args.seed}
        if args.quick:
            topts.update(NUM_RE_TRIALS=1, MAXITER=20)
        tj = {}
        for method, fn in (
                ('adam', optim.adam_traj_optimize),
                ('al', optim.al_traj_optimize)):
            recs = []
            for pi, (s, t) in enumerate(pairs):
                o = dict(topts, seed=args.seed + pi)
                r = fn(robot, score_fn, jnp.asarray(s), jnp.asarray(t), o)
                valid = validate_gt(gt_col, np.asarray(r['solution']))
                recs.append({'success': bool(r['success']),
                             'valid': bool(valid),
                             'time': round(float(r['time']), 2)})
                print(f'  {name}/{method} p{pi}: success '
                      f'{r["success"]} valid {valid}', flush=True)
            tj[method] = {
                'success_rate': float(np.mean([r['success']
                                               for r in recs])),
                'valid_rate': float(np.mean([r['valid'] for r in recs])),
                'threads_rate': float(np.mean([
                    r['success'] and r['valid'] for r in recs])),
                'records': recs}
        v['trajopt'] = tj
        v['wall'] = round(time.time() - t0, 1)
        out['variants'][name] = v
        save()

    # raw (the matrix proxy)
    ck_raw = retrain_raw(cfgs, labels, dists)
    add_variant('raw', ck_raw,
                lambda q: ck_raw.poly_score(q).reshape(-1))

    # fk gamma sweep: band/holdout only first, then trajopt on the best
    fk_cks = {}
    for g in (1.0, 0.3, 0.1):
        name = f'fk_g{g}'
        ck = make_retrain_fk(g)(cfgs, labels, dists)
        fk_cks[g] = ck
        sf = (lambda c: lambda q: c.poly_score(q).reshape(-1))(ck)
        add_variant(name, ck, sf)

    # corridor retrains on raw and on the best-band fk
    best_g = max(fk_cks, key=lambda g:
                 out['variants'][f'fk_g{g}']['band']['acc']
                 - out['variants'][f'fk_g{g}']['band']['missed_col'])
    out['best_fk_gamma'] = best_g
    n_corr = CORRIDOR_BUCKET if not args.quick else 256
    ck_raw_al, _, _ = corridor_update(
        (np.asarray(cfgs), labels, dists), [plan],
        np.asarray(robot.limits), gt_dist, retrain_raw,
        np.random.RandomState(args.seed + 1), n_total=n_corr)
    add_variant('raw+al', ck_raw_al,
                lambda q: ck_raw_al.poly_score(q).reshape(-1))
    ck_fk_al, _, _ = corridor_update(
        (np.asarray(cfgs), labels, dists), [plan],
        np.asarray(robot.limits), gt_dist, make_retrain_fk(best_g),
        np.random.RandomState(args.seed + 1), n_total=n_corr)
    add_variant(f'fk_g{best_g}+al', ck_fk_al,
                lambda q: ck_fk_al.poly_score(q).reshape(-1))

    # multi-class over box clusters (per-class gains, max-served)
    mck = MultiDiffCo(kernel_func=kernels.RQKernel(10.0))
    mck.train(cfgs, jnp.asarray(label_cls),
              max_iteration=3 * len(np.asarray(cfgs)),
              distance=jnp.asarray(dist_cls))
    mck.fit_poly(kernels.Polyharmonic(1, 1), target='dist')
    add_variant(f'multi_k{K_CLUST}', mck,
                lambda q: jnp.max(mck.poly_score(q), axis=-1).reshape(-1))

    save()
    print(json.dumps({k: {'band': v['band'],
                          'threads': {m: v['trajopt'][m]['threads_rate']
                                      for m in v['trajopt']}}
                      for k, v in out['variants'].items()}, indent=1))
    print('wrote', OUT)


if __name__ == '__main__':
    main()
