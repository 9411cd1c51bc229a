#!/usr/bin/env python
"""Main benchmark harness: per-env / per-method trajectory optimization
with ground-truth validation, repair, and JSON resume.

Parity targets: /root/reference/scripts/speed_compare.py — the methods
list (:404-424: fclgradfree, fcldist, adamdiffco, bidiffco,
diffcogradfree, givengrad, trust-constr), exact-checker validation of each
optimized trajectory (:431-454), a repair stage for failed paths
(:477-497) and result-JSON resume (:566-582). The exact checker here is
the batched geometric engine instead of FCL; 'fcl*' method names map to
'gt*' (ground-truth-driven) equivalents.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu import kernels, optim, routines, utils
from diffco_tpu.checkers import corridor_update
from diffco_tpu.perceptron import DiffCo
from diffco_tpu.geometry import (Obstacles2D, planar_robot_signed_dist,
                                 planar_robot_collision)
from diffco_tpu.envs.presets2d import get_env

METHODS = ['adamdiffco', 'aldiffco', 'bidiffco', 'diffcogradfree',
           'givengrad', 'trustconstr', 'gtgradfree', 'gtdist',
           'rrtadamdiffco']

# methods that optimize against the LEARNED proxy — the ones corridor-
# targeted active learning can help (gt* methods already see the exact
# geometry; re-teaching them is meaningless)
PROXY_METHODS = {'adamdiffco', 'aldiffco', 'bidiffco', 'diffcogradfree',
                 'givengrad', 'trustconstr', 'rrtadamdiffco'}


def build_world(env_name, dof, link_length, num_train, seed,
                fit_target='dist', return_dataset=False):
    obstacles = get_env(env_name)
    dataset = routines.autogenerate_2d_dataset(
        num_init_points=num_train, dof=dof, link_length=link_length,
        link_width=0.3, obstacles=obstacles, label_type='binary', seed=seed)
    cfgs, labels, dists, _, robot = routines.unpack_dataset(dataset)
    obs = Obstacles2D.from_obstacle_list(obstacles)
    checker = DiffCo(kernel_func=kernels.RQKernel(10.0))
    checker.train(cfgs, labels[:, 0], max_iteration=3 * len(cfgs),
                  distance=dists[:, 0])
    # fitting the surrogate on the signed DISTANCES (not bare labels)
    # gives the optimizers a usable gradient field away from the
    # boundary — measured prerequisite for valid trajectories
    # (benchmarks/RESULTS.md trajopt notes)
    checker.fit_poly(kernels.Polyharmonic(1, 1), target=fit_target)
    if return_dataset:
        return robot, obs, checker, (np.asarray(cfgs),
                                     np.asarray(labels[:, 0]),
                                     np.asarray(dists[:, 0]))
    return robot, obs, checker


# -- env families -------------------------------------------------------------
# The reference's experiment design spans env families beyond the planar
# arms (speed_compare.py:355-424 sweeps per-env configs; the SE2/SE3
# worlds live in manual_trajopt_se2/se3.py and 3d_trajopt.py). Each
# family returns the same bundle so every method/repair/corridor-AL
# stage below is family-agnostic:
#   robot        — .limits + .fkine (what the optimizer cores use)
#   checker      — trained proxy (DiffCo API: poly_score)
#   score_fns(ck)— proxy/gt score closures for a given proxy
#   gt_col(q)    — compiled exact collision [B] bool (validation/planner)
#   base_dataset — (cfgs, labels, dists) numpy, for corridor retraining
#   retrain(...) — rebuilds the SAME proxy on a widened dataset
#   margin       — family default safety margin (workspace units differ:
#                  planar arms live in a ~7-unit box, the Baxter scene
#                  in meters)

# Envs whose proxy trains on FK WORKSPACE features (link endpoints via
# robot.fkine) instead of raw joint angles — the reference's own design
# answer for cluttered scenes (ref collision_checkers.py:345-394,
# FKDiffCo). Measured on 7d_narrow (benchmarks/narrow_fk_study.json,
# round 5): raw-config RQ cannot pin the 300-box wall (corridor-band acc
# 0.47; a corridor retrain carves false-free tunnels), while RQ(0.1) on
# fkine features reads band acc 0.81 / missed-col 0.027, is GT-valid on
# 2/5 staged problems single-init (raw: 0/5), and after a corridor
# retrain THREADS the targeted corridor strictly (raw+al: 0/5).
FK_FEATURE_ENVS = {'7d_narrow'}
FK_FEATURE_GAMMA = 0.1


def _planar_bundle(env_name, dof, args):
    link_length = args.link_length * 2 / dof
    robot, obs, checker, base = build_world(
        env_name, dof, link_length, args.num_train, args.seed,
        fit_target=args.fit_target, return_dataset=True)

    def score_fns(ck):
        return make_score_fns(robot, obs, ck)

    fk_features = env_name in FK_FEATURE_ENVS

    def retrain(cfgs, labels, dists):
        if fk_features:
            ck = DiffCo(kernel_func=kernels.RQKernel(FK_FEATURE_GAMMA),
                        transform=robot.fkine)
        else:
            ck = DiffCo(kernel_func=kernels.RQKernel(10.0))
        ck.train(jnp.asarray(cfgs), jnp.asarray(labels),
                 max_iteration=3 * len(cfgs),
                 distance=jnp.asarray(dists))
        ck.fit_poly(kernels.Polyharmonic(1, 1), target=args.fit_target)
        return ck

    if fk_features:
        # retrain the proxy on FK features; build_world's raw-config
        # checker is discarded (the base dataset is reused as-is)
        checker = retrain(*base)

    return {'robot': robot, 'checker': checker, 'score_fns': score_fns,
            'gt_col': lambda q: planar_robot_collision(robot, obs, q),
            'base_dataset': base, 'retrain': retrain,
            'margin': args.safety_margin}


def _se2_bundle(env_name, dof, args):
    """SE(2) rigid body (the trajopt_se2.py L-shape world; ref
    manual_trajopt_se2.py): dof is always 3 (x, y, theta)."""
    from diffco_tpu.geometry import rigid_body_signed_dist
    from diffco_tpu.robots import RigidPlanarBody
    body = [((0.0, 0.0), (1.0, 0.25)), ((0.75, 0.0), (0.25, 0.75))]
    parts = [(p_[0], p_[1]) for p_ in body]
    robot = RigidPlanarBody([('rect', c, (h[0] * 2, h[1] * 2))
                             for c, h in body],
                            limits=[[-8, 8], [-8, 8], [-np.pi, np.pi]])
    obs = Obstacles2D.from_obstacle_list([
        ('rect', (4, 4), (3, 3), 0),
        ('circle', (-4, -4), 2.0, 1),
        ('rect', (-4, 4), (2, 4), 1),
    ])

    @jax.jit
    def gt_sd(q):
        return jnp.max(rigid_body_signed_dist(parts, obs, q), axis=-1)

    key = jax.random.PRNGKey(args.seed)
    cfgs = robot.rand_configs(args.num_train, key)
    dists = gt_sd(cfgs)
    labels = (dists > 0) * 2.0 - 1.0

    def retrain(c, l, d):
        ck = DiffCo(kernel_func=kernels.RQKernel(1.0))
        ck.train(jnp.asarray(c), jnp.asarray(l),
                 max_iteration=3 * len(c), distance=jnp.asarray(d))
        ck.fit_poly(kernels.Polyharmonic(1, 1), target=args.fit_target)
        return ck

    checker = retrain(cfgs, labels, dists)

    def score_fns(ck):
        def proxy_dist(q):
            return ck.poly_score(q).reshape(-1)

        def proxy_binary(q):
            return (ck.poly_score(q).reshape(-1) > 0).astype(jnp.float32)

        return {'proxy_dist': proxy_dist, 'proxy_binary': proxy_binary,
                'gt_dist': gt_sd}

    return {'robot': robot, 'checker': checker, 'score_fns': score_fns,
            'gt_col': lambda q: gt_sd(q) > 0,
            'base_dataset': (np.asarray(cfgs), np.asarray(labels),
                             np.asarray(dists)),
            'retrain': retrain, 'margin': -0.2}


def _baxter_bundle(env_name, dof, args):
    """7-DOF Baxter arm vs a 3-primitive 3D scene (the
    baxter_trajopt_benchmark.py world; ref scripts/3d_trajopt.py):
    capsule-chain exact geometry, FK-transformed proxy."""
    from diffco_tpu.robots import BaxterLeftArmFK
    from diffco_tpu.robots.capsule_chain import CapsuleChainCollision
    from diffco_tpu.envs import ShapeEnv

    def T(t):
        m = np.eye(4)
        m[:3, 3] = t
        return m

    robot = BaxterLeftArmFK()
    env = ShapeEnv(shapes={
        'table': {'type': 'Box', 'params': {'extents': [0.8, 0.8, 0.05]},
                  'transform': T([0.7, 0.0, -0.1])},
        'pole': {'type': 'Cylinder',
                 'params': {'radius': 0.1, 'height': 1.2},
                 'transform': T([0.6, 0.3, 0.5])},
        'ball': {'type': 'Sphere', 'params': {'radius': 0.15},
                 'transform': T([0.4, -0.35, 0.3])},
    })
    gt = CapsuleChainCollision(robot, link_radius=0.07, per_seg=4)

    def gt_sd(q):
        return gt.signed_dist(q, env)

    key = jax.random.PRNGKey(args.seed)
    cfgs = robot.rand_configs(args.num_train, key)
    dists = gt_sd(cfgs)
    labels = (dists > 0) * 2.0 - 1.0

    def retrain(c, l, d):
        ck = DiffCo(kernel_func=kernels.RQKernel(10.0),
                    transform=robot.fkine)
        ck.train(jnp.asarray(c), jnp.asarray(l),
                 max_iteration=3 * len(c), distance=jnp.asarray(d))
        ck.fit_poly(kernels.Polyharmonic(1, 1), target=args.fit_target)
        return ck

    checker = retrain(cfgs, labels, dists)

    def score_fns(ck):
        def proxy_dist(q):
            return ck.poly_score(q).reshape(-1)

        def proxy_binary(q):
            return (ck.poly_score(q).reshape(-1) > 0).astype(jnp.float32)

        return {'proxy_dist': proxy_dist, 'proxy_binary': proxy_binary,
                'gt_dist': gt_sd}

    # margins in METERS here (scene scale ~1 m vs the planar arms'
    # ~7-unit box): the proxy is distance-fitted on the capsule signed
    # distance, so -0.05 demands ~5 cm clearance
    return {'robot': robot, 'checker': checker, 'score_fns': score_fns,
            'gt_col': lambda q: gt_sd(q) > 0,
            'base_dataset': (np.asarray(cfgs), np.asarray(labels),
                             np.asarray(dists)),
            'retrain': retrain, 'margin': -0.05}


def build_env_bundle(env_name, dof, args):
    if env_name.startswith('se2'):
        return _se2_bundle(env_name, 3, args)
    if env_name.startswith('baxter'):
        return _baxter_bundle(env_name, 7, args)
    return _planar_bundle(env_name, dof, args)


def validate_gt(gt_col, solution, num_sub=8):
    """Exact validation of an optimized path (ref :431-454); generic over
    the env family via its compiled collision closure."""
    dense = utils.dense_path(jnp.asarray(solution, jnp.float32), num_sub)
    return not bool(np.asarray(gt_col(dense)).any())


def validate(robot, obs, solution, num_sub=8):
    """Planar-family convenience wrapper (kept for external callers,
    e.g. scripts/reference_flag_parity.py)."""
    return validate_gt(lambda q: planar_robot_collision(robot, obs, q),
                       solution, num_sub)


def make_score_fns(robot, obs, checker):
    """Build the per-env score closures ONCE: the optimizer cores jit
    with dist_est as a static argument, so a fresh closure per problem
    would recompile the whole trajopt program every problem (~1 min per
    compile on TPU) and fold that compile into every reported time."""
    def proxy_dist(q):
        return checker.poly_score(q).reshape(-1)

    def proxy_binary(q):
        return (checker.poly_score(q).reshape(-1) > 0).astype(jnp.float32)

    def gt_dist(q):
        return planar_robot_signed_dist(robot, obs, q).max(axis=-1)

    return {'proxy_dist': proxy_dist, 'proxy_binary': proxy_binary,
            'gt_dist': gt_dist}


def repair(robot, fns, solution, options):
    """Repair a failed path with ground-truth-driven optimization
    (ref :477-497). Repair must sample the collision term at least as
    densely as validate() judges it (8 per segment) — a sparser repair
    can clear its own samples yet still fail validation. Five trials,
    not one: trial 0 starts from the failed path, but a diverged scipy
    solution (givengrad at 10-20x the valid-path cost) is a WORSE init
    than random — the restart trials run in the same vmapped program and
    the core prefers any trial that reaches validity. Repair targets a
    small GT clearance (-0.05, as the 2d pipeline's repair does), not
    the method's proxy margin: validation is binary collision-freedom,
    and demanding the full -0.3 clearance made repair fail corridors the
    gtdist method itself clears."""
    opts = dict(options)
    opts['init_solution'] = jnp.asarray(solution, jnp.float32)
    opts['NUM_RE_TRIALS'] = 5
    opts['safety_margin'] = -0.05
    opts['dense_sub'] = max(8, int(opts.get('dense_sub', 3)))
    return optim.adam_traj_optimize(
        robot, fns['gt_dist'], jnp.asarray(solution[0]),
        jnp.asarray(solution[-1]), opts)


def plan_gt_path(robot, gt_col, start, target, seed, max_iters=30000):
    """RRT-Connect on the EXACT geometry for the repair escalation. One
    budget-exhausted retry with a fresh seed before giving up: RRT-Connect
    is probabilistically complete but narrow passages (7d_narrow's 300-box
    wall) can exhaust a single run's budget. Returns [N, dof] or None."""
    from diffco_tpu.planning import MotionPlanner

    for attempt in range(3):
        planner = MotionPlanner(
            robot, gt_col,
            step_size=0.5, seed=int(seed) + 7919 * attempt)
        path = planner.plan(np.asarray(start, np.float64),
                            np.asarray(target, np.float64),
                            max_iters=max_iters)
        # re-check at the VALIDATION density (8/segment): the planner
        # motion-checks at its own step resolution, and a plan that
        # threads between its own samples would poison every downstream
        # consumer (corridor-AL inits, RRT fallback) — measured once on
        # 7d_narrow (matrix record: raw fallback failed validate_gt)
        if path is not None and validate_gt(gt_col, path):
            return path
    return None


def _wp_for_init(path_len, base_n, cap=60, step=10):
    """Waypoint count that preserves a planner init's resolution.

    Resampling a 70-waypoint corridor plan down to the default 20
    waypoints DESTROYED its validity before any optimization ran
    (measured on 7d_narrow problem 4: plan valid, resampled-to-20
    invalid, resampled-to-30+ valid) — every plan-seeded optimization
    must run at the plan's own resolution. Buckets of ``step`` bound the
    per-env compile count (each distinct N_WAYPOINTS is one more jitted
    trajopt program). Plans longer than ``cap`` ARE resampled below their
    own resolution — exactly the validity-destroying mode above — so the
    cap is loud, not silent: downstream callers re-validate the smoothed
    result against GT anyway, but the log line marks the suspect runs."""
    if path_len <= base_n:
        return base_n
    if path_len > cap:
        print(f'    [wp_for_init] plan length {path_len} exceeds cap '
              f'{cap}: resampling BELOW plan resolution (validity of the '
              f'seeded run may be degraded; GT re-validation still '
              f'applies)', flush=True)
    return min(cap, int(np.ceil(path_len / step) * step))


def repair_rrt(robot, fns, solution, path, options):
    """Escalated repair for paths the GT-Adam repair cannot fix: smooth a
    ground-truth RRT-Connect path with GT-Adam. The Adam repair's
    straight-line and random restarts stay in the start's free component —
    in narrow envs the failure is topological, not a local minimum, and
    only a planner can cross it. Mirrors the reference's practice of
    feeding planner output into the optimizers (OMPL inits in
    manual_trajopt_se3.py:585-700, record_moveit_path.py). The plan is
    computed once per (env, problem) and shared across every method's
    repair (plan_gt_path); this function only smooths it."""
    opts = dict(options)
    opts['init_solution'] = jnp.asarray(path, jnp.float32)
    opts['NUM_RE_TRIALS'] = 2  # RRT path + the straight line; no randoms
    opts['safety_margin'] = -0.05
    opts['dense_sub'] = max(8, int(opts.get('dense_sub', 3)))
    opts['N_WAYPOINTS'] = _wp_for_init(len(path), opts['N_WAYPOINTS'])
    rec = optim.adam_traj_optimize(
        robot, fns['gt_dist'], jnp.asarray(solution[0]),
        jnp.asarray(solution[-1]), opts)
    rec['rrt_path'] = path.tolist()
    return rec


# -- corridor-targeted active learning ---------------------------------------
# When proxy trajopt AND the GT-Adam repair both fail, the failure is
# topological: the proxy has never SEEN the narrow corridor (uniform
# training samples almost never land inside it), so every proxy gradient
# pushes the path back out of the passage. But at that point the harness
# holds exactly the missing information — the GT planner's path through
# the corridor and the method's own failed path (configurations the proxy
# scores free but the world does not). Densify bands around both, label
# them with the exact geometry, retrain the proxy on base + corridor
# samples, and re-run the METHOD'S OWN optimizer on the updated proxy —
# the returned trajectory is then the optimizer's (smooth, cost-optimized)
# path, not the raw planner fallback. This is the paper's own
# active-learning idea (ref collision_checkers.py:220-252 exploits around
# supports) aimed at the corridor instead of the support set.

CORRIDOR_BUCKET = 2048  # fixed corridor-sample count: the retrain program
#     and the re-fit poly solve compile ONCE per env (shape drift on the
#     TPU would recompile ~1 min per failing problem)

# the corridor stage itself is a product surface now
# (diffco_tpu.checkers.corridor_update wrapping sampler.path_band_samples;
# checker objects expose the same thing as update(exploit_paths=...)) —
# the harness just calls it with the family's retrain closure


def run_method(method, robot, checker, fns, start, target, options):
    proxy_dist = fns['proxy_dist']
    proxy_binary = fns['proxy_binary']
    gt_dist = fns['gt_dist']

    if method == 'adamdiffco':
        return optim.adam_traj_optimize(robot, proxy_dist, start, target,
                                        options)
    if method == 'aldiffco':
        return optim.al_traj_optimize(robot, proxy_dist, start, target,
                                      options)
    if method == 'bidiffco':
        return optim.gradient_free_traj_optimize(robot, proxy_binary,
                                                 start, target, options)
    if method == 'diffcogradfree':
        return optim.gradient_free_traj_optimize(robot, proxy_dist,
                                                 start, target, options)
    if method == 'givengrad':
        return optim.givengrad_traj_optimize(robot, proxy_dist, start,
                                             target, options)
    if method == 'trustconstr':
        # gradient+Hessian scipy trust-constr (ref optim.py:324-516)
        return optim.trustconstr_traj_optimize(robot, proxy_dist, start,
                                               target, options)
    if method == 'gtgradfree':
        return optim.gradient_free_traj_optimize(robot, gt_dist, start,
                                                 target, options)
    if method == 'gtdist':
        return optim.adam_traj_optimize(robot, gt_dist, start, target,
                                        options)
    if method == 'rrtadamdiffco':
        # pipeline method: batched RRT-Connect on the PROXY finds a path
        # in the right C-space component (random start/target pairs in
        # narrow envs usually straddle components — RESULTS.md 7d_narrow
        # notes), then Adam refines it. The reference reaches for
        # pre-generated feasible configs instead (speed_compare.py:355-359);
        # this makes the fix part of the method.
        from diffco_tpu.planning import MotionPlanner

        def col(q):
            return np.asarray(checker.poly_score(
                jnp.asarray(q, jnp.float32)).reshape(-1) > 0)

        t0 = time.time()
        planner = MotionPlanner(robot, col, step_size=0.5,
                                seed=int(options['seed']))
        path = planner.plan(np.asarray(start, np.float64),
                            np.asarray(target, np.float64),
                            max_iters=4000)
        plan_time = time.time() - t0
        opts = dict(options)
        if path is not None:
            # trial 0 of the optimizer takes the RRT path; the other
            # NUM_RE_TRIALS-1 restarts stay random (vmapped, same program)
            opts['init_solution'] = jnp.asarray(path, jnp.float32)
        rec = optim.adam_traj_optimize(robot, proxy_dist, start, target,
                                       opts)
        rec['time'] += plan_time
        rec['cnt_check'] += planner.cnt_check
        rec['rrt_found'] = path is not None
        return rec
    raise ValueError(method)


def load_test_configs(configs_dir, env_name, dof, num_problems):
    """Pre-generated start/goal pairs (ref speed_compare.py:355-359 uses
    per-env JSONs from generate_test_configs.py). Returns None if the
    file is absent."""
    if not configs_dir:
        return None
    path = os.path.join(configs_dir, f'test_configs_{env_name}_{dof}d.json')
    if not os.path.exists(path):
        return None
    d = json.load(open(path))
    starts = np.asarray(d['start_cfgs'], np.float32)
    targets = np.asarray(d['target_cfgs'], np.float32)
    n = min(num_problems, len(starts))
    if n < num_problems:
        # loud, because a short env makes per-env summary stats
        # incomparable with the rest of the matrix
        print(f'WARNING: {path} holds only {n} pairs; env will run '
              f'{n}/{num_problems} problems')
    return [(jnp.asarray(starts[i]), jnp.asarray(targets[i]))
            for i in range(n)]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--envs', nargs='+', default=['1rect_1circle', '3circle'],
                   help="env names, optionally 'name:dof' (e.g. "
                        "3circle_7d:7) to override --dof per env")
    p.add_argument('--methods', nargs='+', default=['adamdiffco',
                                                    'gtgradfree'])
    p.add_argument('--dof', type=int, default=2)
    p.add_argument('--link-length', type=float, default=3.5)
    p.add_argument('--num-train', type=int, default=6000)
    p.add_argument('--num-problems', type=int, default=5)
    p.add_argument('--waypoints', type=int, default=20)
    p.add_argument('--maxiter', type=int, default=200)
    p.add_argument('--trials', type=int, default=5)
    p.add_argument('--seed', type=int, default=1917)
    p.add_argument('--fit-target', default='dist',
                   choices=['dist', 'label'])
    p.add_argument('--safety-margin', type=float, default=-0.3)
    p.add_argument('--trustconstr-free-waypoints', type=int, default=0,
                   help='control-waypoint count for trustconstr '
                        '(options["free_waypoints"]). 0 = auto: 8 on '
                        'dof>=7 envs, full elsewhere — measured 2.5x '
                        'faster AND GT-valid 1.0 vs 0.6 at full (study: '
                        'benchmarks/trustconstr_free_waypoints.json); '
                        '-1 = always full')
    p.add_argument('--test-configs-dir', default=None,
                   help='directory of generate_test_configs.py JSONs; '
                        'problems are sampled inline when absent')
    p.add_argument('--output', default='results/speed_compare.json')
    p.add_argument('--no-resume', action='store_true')
    args = p.parse_args()

    os.makedirs(os.path.dirname(args.output) or '.', exist_ok=True)
    results = {}
    if os.path.exists(args.output) and not args.no_resume:
        results = json.load(open(args.output))
        print(f'resuming: {len(results)} env/method records present')

    for env_spec in args.envs:
        env_name, _, dof_s = env_spec.partition(':')
        dof = int(dof_s) if dof_s else args.dof
        bundle = build_env_bundle(env_name, dof, args)
        robot = bundle['robot']
        checker = bundle['checker']
        base_dataset = bundle['base_dataset']
        gt_col = bundle['gt_col']
        dof = int(np.asarray(robot.limits).shape[0])
        fns = bundle['score_fns'](checker)
        # corridor-AL helpers: ONE jitted labeler per env (eager geometry
        # costs a device dispatch per op — design invariant), one RNG, and
        # a per-problem cache of corridor-retrained proxies shared by all
        # methods that fail that problem
        gt_label_fn = fns['gt_dist']
        limits_np = np.asarray(robot.limits, np.float64)
        rng_al = np.random.RandomState(args.seed + 31337)
        corridor_worlds = {}
        pairs = load_test_configs(args.test_configs_dir, env_name, dof,
                                  args.num_problems)
        if pairs is None:
            # a DISTINCT key: PRNGKey(seed) is the dataset key, and
            # threefry's counter structure makes rand_configs(512, key)
            # bit-identical to the first 512 TRAINING configs — every
            # fallback problem would start at an interpolation-exact
            # training point
            key = jax.random.PRNGKey(args.seed + 7)
            q = robot.rand_configs(512, key)
            free = ~np.asarray(gt_col(q))
            idx = np.where(free)[0]
            if len(idx) < 2 * args.num_problems:
                raise SystemExit(
                    f'{env_spec}: only {len(idx)}/512 sampled configs are '
                    f'free — too few for {args.num_problems} distinct '
                    f'problem pairs; supply --test-configs-dir (narrow '
                    f'envs need certified pairs anyway)')
            pairs = [(q[idx[2 * i]], q[idx[-1 - 2 * i]])
                     for i in range(args.num_problems)]
        # dense_sub densifies the collision term between waypoints (the
        # invariant that stops the optimizer threading obstacles between
        # waypoints); a slightly negative margin on the distance-fitted
        # surrogate keeps paths off the boundary
        # num_sub deliberately NOT set: gradient_free/trustconstr default
        # to 4/segment; givengrad defaults to the reference's
        # dense-by-step density (see optim.givengrad_traj_optimize —
        # forcing 4 there measurably breaks both its strict flag and its
        # raw validity)
        options = {'N_WAYPOINTS': args.waypoints,
                   'NUM_RE_TRIALS': args.trials, 'MAXITER': args.maxiter,
                   'history': False,
                   'safety_margin': bundle['margin'],
                   'dense_sub': 3,
                   'max_speed': 2.0, 'seed': args.seed}
        # coarse control waypoints for trustconstr on high-DOF envs: the
        # [n_free, n_free] constraint Hessian + scipy's interior-point
        # algebra are superlinear in n_free, and the K=8 problem is also
        # BETTER conditioned (trustconstr_free_waypoints.json: 2.5x
        # faster, feasible 0.8->1.0, GT-valid 0.6->1.0 on 3circle_7d)
        tc_k = args.trustconstr_free_waypoints
        if tc_k == 0:
            tc_k = 8 if dof >= 7 else None
        elif tc_k < 0:
            tc_k = None
        tc_extra = {'free_waypoints': tc_k} if tc_k else {}
        # GT plans for the repair escalation, computed lazily ONCE per
        # problem and shared by every method's repair (the plan depends
        # only on the env geometry and endpoints, not the method)
        gt_plans = {}
        for method in args.methods:
            tag = f'{env_spec}/{method}'
            if tag in results:  # resume (ref :566-582)
                continue
            recs = []
            for pi, (s, t) in enumerate(pairs):
                rec = run_method(
                    method, robot, checker, fns, s, t,
                    {**options, 'seed': args.seed + pi,
                     **(tc_extra if method == 'trustconstr' else {})})
                rec['valid'] = validate_gt(gt_col,
                                        np.asarray(rec['solution']))
                if not rec['valid']:
                    t0 = time.time()
                    fixed = repair(robot, fns, np.asarray(rec['solution']),
                                   options)
                    ok = validate_gt(gt_col, np.asarray(fixed['solution']))
                    if not ok:
                        # topological failure: get a GT plan through the
                        # corridor (computed once per problem, shared)
                        if pi not in gt_plans:
                            gt_plans[pi] = plan_gt_path(
                                robot, gt_col, s, t, args.seed + pi)
                    if (not ok and method in PROXY_METHODS
                            and gt_plans[pi] is not None):
                        # corridor-targeted active learning: retrain the
                        # proxy on GT-labeled bands around the plan (round
                        # 1, cached per problem) and around this method's
                        # failed path too (round 2), then re-run the
                        # METHOD'S OWN optimizer — the returned path is
                        # the optimizer's, not the planner's
                        al_t0 = time.time()
                        failed_paths = [np.asarray(rec['solution'])]
                        rounds = 0
                        rec2 = None
                        wholesale = False
                        while rounds < 2 and not ok:
                            rounds += 1
                            if rounds == 1:
                                if pi not in corridor_worlds:
                                    ck2, _, _ = corridor_update(
                                        base_dataset, [gt_plans[pi]],
                                        limits_np, gt_label_fn,
                                        bundle['retrain'], rng_al,
                                        n_total=CORRIDOR_BUCKET)
                                    corridor_worlds[pi] = (
                                        ck2, bundle['score_fns'](ck2))
                                ck2, fns2 = corridor_worlds[pi]
                            else:
                                ck2, _, _ = corridor_update(
                                    base_dataset,
                                    [gt_plans[pi]] + failed_paths,
                                    limits_np, gt_label_fn,
                                    bundle['retrain'], rng_al,
                                    n_total=CORRIDOR_BUCKET)
                                fns2 = bundle['score_fns'](ck2)
                            # corridor re-run, three measured rules
                            # (debug record: RESULTS.md 7d_narrow AL
                            # notes): (1) the narrow passage is tighter
                            # than the env's default clearance — the
                            # full margin is infeasible there (AL
                            # re-runs at -0.3 failed 4/4, the optimizer
                            # pushes the path back out), so use the
                            # repair stage's clearance and its
                            # validation-density collision term;
                            # (2) run at the PLAN's waypoint resolution
                            # (resampling a 70-waypoint corridor plan
                            # to 20 destroyed its validity outright);
                            # (3) no random restarts — the retrained
                            # proxy still carries false-free regions
                            # off-corridor and a shortcut through one
                            # outscores the corridor path.
                            al_opts = {
                                **options, 'seed': args.seed + pi,
                                'safety_margin': max(
                                    -0.05, options['safety_margin']),
                                'dense_sub': max(
                                    8, options.get('dense_sub', 3)),
                                'N_WAYPOINTS': _wp_for_init(
                                    len(gt_plans[pi]),
                                    options['N_WAYPOINTS']),
                                'NUM_RE_TRIALS': min(
                                    2, options['NUM_RE_TRIALS']),
                                'init_solution': jnp.asarray(
                                    gt_plans[pi], jnp.float32)}
                            rec2 = run_method(method, robot, ck2, fns2,
                                              s, t, al_opts)
                            sol2 = np.asarray(rec2['solution'])
                            dense2 = utils.dense_path(
                                jnp.asarray(sol2, jnp.float32), 8)
                            frac_bad = float(np.mean(
                                np.asarray(gt_col(dense2))))
                            ok = frac_bad == 0.0
                            wholesale = frac_bad > 0.3
                            if not ok and not wholesale:
                                # near-miss polish: the AL path found
                                # the corridor homotopy class; GT-Adam
                                # clears residual pokes
                                rec3 = repair(robot, fns, sol2, al_opts)
                                if validate_gt(gt_col,
                                               np.asarray(rec3['solution'])):
                                    rec2, ok = rec3, True
                            if not ok:
                                failed_paths.append(sol2)
                            if wholesale:
                                # measured futility gate (RESULTS.md
                                # corridor-AL study): a >30%-colliding
                                # re-run means the retrain missed the
                                # wall entirely — the round-2 retrain
                                # and the polish were both nulls there
                                break
                        rec['corridor_al'] = {
                            'rounds': rounds, 'valid': bool(ok),
                            'wholesale': bool(wholesale),
                            'time': time.time() - al_t0}
                        if ok:
                            fixed = rec2
                    elif not ok:
                        fixed2 = None
                        if gt_plans[pi] is not None:
                            fixed2 = repair_rrt(robot, fns,
                                                np.asarray(rec['solution']),
                                                gt_plans[pi],
                                                {**options,
                                                 'seed': args.seed + pi})
                        if fixed2 is not None:
                            ok2 = validate_gt(gt_col,
                                           np.asarray(fixed2['solution']))
                            if not ok2 and fixed2.get('rrt_path') is not None:
                                # GT-Adam re-broke it; the raw densified
                                # RRT path is motion-checked by the planner
                                fixed2['solution'] = fixed2['rrt_path']
                                ok2 = validate_gt(gt_col,
                                               np.asarray(fixed2['solution']))
                                if ok2:
                                    fixed2['rrt_fallback'] = True
                            if ok2:
                                fixed, ok = fixed2, True
                                rec['repair_rrt'] = True
                                if fixed2.get('rrt_fallback'):
                                    rec['rrt_fallback'] = True
                    if (not ok and rec.get('corridor_al') is not None
                            and gt_plans[pi] is not None):
                        # corridor AL failed twice: fall back to the RRT
                        # escalation so the row still records a valid path
                        # (the corridor_al.valid=False key records the miss)
                        fixed2 = repair_rrt(robot, fns,
                                            np.asarray(rec['solution']),
                                            gt_plans[pi],
                                            {**options,
                                             'seed': args.seed + pi})
                        ok2 = validate_gt(gt_col,
                                       np.asarray(fixed2['solution']))
                        if not ok2 and fixed2.get('rrt_path') is not None:
                            fixed2['solution'] = fixed2['rrt_path']
                            ok2 = validate_gt(gt_col,
                                           np.asarray(fixed2['solution']))
                            if ok2:
                                rec['rrt_fallback'] = True
                        if ok2:
                            fixed, ok = fixed2, True
                            rec['repair_rrt'] = True
                    rec['repair_time'] = time.time() - t0
                    rec['repaired_valid'] = ok
                    if rec['repaired_valid']:
                        rec['solution'] = (fixed['solution'] if isinstance(
                            fixed['solution'], list)
                            else np.asarray(fixed['solution']).tolist())
                        rec['valid'] = True
                recs.append(rec)
            summary = {
                'dof': dof,
                'n_problems': len(recs),
                'backend': jax.default_backend(),
                'success_rate': float(np.mean([r['success'] for r in recs])),
                # scipy-path records carry 'feasible' (constraint
                # satisfaction at the solution, decoupled from scipy's
                # convergence flag — see optim docstrings); on-device
                # optimizers' success IS feasibility already
                'feasible_rate': float(np.mean(
                    [r.get('feasible', r['success']) for r in recs])),
                'valid_rate': float(np.mean([r['valid'] for r in recs])),
                'mean_cost': float(np.mean([r['cost'] for r in recs])),
                'mean_time': float(np.mean([r['time'] for r in recs])),
                'mean_cnt_check': float(np.mean([r['cnt_check']
                                                 for r in recs])),
                # corridor-AL bookkeeping: how many returned paths came
                # from the optimizer after corridor retraining, and how
                # many degraded all the way to the raw planner path
                'corridor_al_rate': float(np.mean(
                    [bool(r.get('corridor_al', {}).get('valid'))
                     for r in recs])),
                'rrt_fallback_rate': float(np.mean(
                    [bool(r.get('rrt_fallback')) for r in recs])),
                'records': recs,
            }
            results[tag] = summary
            with open(args.output, 'w') as f:
                json.dump(results, f, indent=1)
            print(f"{tag}: success {summary['success_rate']:.2f} "
                  f"valid {summary['valid_rate']:.2f} "
                  f"time {summary['mean_time']:.3f}s "
                  f"checks {summary['mean_cnt_check']:.0f}")
    print(f'results written to {args.output}')


if __name__ == '__main__':
    main()
