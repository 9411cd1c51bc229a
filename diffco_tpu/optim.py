"""Trajectory optimization over waypoint matrices (TPU-native).

Functional parity targets (reference: /root/reference/diffco/optim.py):
  adam_traj_optimize (:13), givengrad_traj_optimize (:166),
  trustconstr_traj_optimize (:324), gradient_free_traj_optimize (:519),
  TrajOptimizer / Weighted (:632).

TPU-first design: the reference runs a host-side Python loop of ~2000
score+grad evaluations per problem (10 restarts x 200 Adam steps,
optim.py:55-127). Here the whole optimization — all restarts, all steps —
compiles to ONE XLA program: ``lax.scan`` over iterations, ``vmap`` over
restarts, zero host round trips. The scipy SLSQP / trust-constr paths
(optim.py:289-299, 486-492), which ping-pong between C and torch every
iteration, are replaced by an on-device augmented-Lagrangian method with
the same constraint semantics; scipy-backed versions are kept for parity
testing where scipy is available.
"""
from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import optax

from . import utils


def _default_options(options: Optional[Dict]) -> Dict:
    o = dict(options or {})
    o.setdefault('N_WAYPOINTS', 20)
    o.setdefault('NUM_RE_TRIALS', 10)
    o.setdefault('MAXITER', 200)
    o.setdefault('history', False)
    o.setdefault('safety_margin', 0.0)
    o.setdefault('max_speed', 1.5)
    o.setdefault('seed', 0)
    # densify the collision term between waypoints by default — the
    # CLAUDE.md trajopt invariant (dense_sub >= 3); undensified optimizers
    # thread between waypoints. Callers can still pass 1 explicitly.
    o.setdefault('dense_sub', 3)
    o.setdefault('extra_optimizer_options', {})
    return o


def _resample_init(init, n_waypoints):
    """Resample an ``init_solution`` of any length (>= 2 waypoints — e.g.
    an RRT plan with its own waypoint count) onto exactly ``n_waypoints``
    by densifying each segment then picking evenly spaced rows. Every
    optimizer accepts arbitrary-length inits through this; indexing the
    raw path would silently mismatch the constraint dimensions.

    Parity deviation (deliberate): the reference returns immediately with
    success=True when init_solution has exactly 2 waypoints
    (ref optim.py:266-278). Here a 2-waypoint init is upsampled to
    ``n_waypoints`` and optimized like any other init, so the record's
    success/cost/cnt_check reflect a real optimization run rather than a
    skipped one. Runs in host numpy: every intermediate's shape depends on
    ``len(init)`` (the value-dependent-size invariant — eager jnp here
    would retrace per init length and round-trip a remote device)."""
    init = np.asarray(init, np.float32)
    if init.shape[0] < 2:
        # ref asserts len(init) >= 2 (optim.py:266); fail with the cause
        # instead of a ZeroDivisionError in the resampling arithmetic
        raise ValueError(
            f'init_solution needs >= 2 waypoints, got {init.shape[0]}')
    if init.shape[0] != n_waypoints:
        # densify like utils.dense_path (num_sub points per segment, last
        # row appended), then pick evenly spaced rows
        num_sub = max(1, -(-(n_waypoints - 1) // (init.shape[0] - 1)))
        fr = (np.arange(num_sub, dtype=np.float32) / num_sub)[None, :, None]
        seg_start = init[:-1][:, None, :]
        delta = (init[1:] - init[:-1])[:, None, :]
        dense = (seg_start + fr * delta).reshape(-1, init.shape[1])
        dense = np.concatenate([dense, init[-1:]], axis=0)
        idx = np.linspace(0, dense.shape[0] - 1, n_waypoints).astype(int)
        init = dense[idx]
    return jnp.asarray(init)


def _scipy_exec_backend(o):
    """Numeric execution backend for the host scipy optimizer paths.

    With ``options['scipy_fp64']`` (the default) every value / jacobian /
    Hessian callable handed to scipy is traced in float64 and executed on
    the host CPU backend: calls re-enter a scoped
    ``jax.experimental.enable_x64`` context (the jit cache keys on it) and
    commit their inputs to the CPU device, so a TPU-resident checker's
    trained state is pulled host-side once at lowering and the scipy loop
    never round-trips the device tunnel. Rationale: f32 gradient noise
    (~1e-3 relative — benchmarks/trustconstr_termination_study.json) sits
    exactly at scipy's termination tolerances, which suppressed the strict
    ``success`` flag (0.0-0.2) while the paths were geometrically feasible
    (0.8-1.0); float64 host derivatives remove that noise floor. TPU
    serving (adam/al cores, fused Pallas kernels) is untouched.

    Returns ``(wrap, jdt)``: ``wrap(fn)`` jits ``fn`` for the chosen
    backend and ``jdt`` is the jnp dtype the traced closures cast with.
    """
    if not bool(o.get('scipy_fp64', True)):
        return jax.jit, jnp.float32
    cpu0 = jax.devices('cpu')[0]

    def wrap(fn):
        jitted = jax.jit(fn)

        def call(*args):
            with jax.enable_x64(True):
                put = [jax.device_put(np.asarray(a, np.float64), cpu0)
                       for a in args]
                return jitted(*put)
        return call
    return wrap, jnp.float64


def _loss_terms(p, robot_fkine, dist_est, limits, safety_margin, max_speed):
    """Shared penalty terms; formulas match optim.py:88-99 exactly."""
    scores = dist_est(p)
    collision = jnp.sum(jnp.maximum(scores - safety_margin, 0.0))
    cp = robot_fkine(p)  # [N, M, d]
    seg = cp[1:] - cp[:-1]
    max_move = jnp.sum(jnp.maximum(
        jnp.sum(seg ** 2, axis=2) - max_speed ** 2, 0.0))
    joint_limit = jnp.sum(jnp.maximum(limits[:, 0] - p, 0.0)
                          + jnp.maximum(p - limits[:, 1], 0.0))
    diff = jnp.sum(seg ** 2)
    return diff, collision, max_move, joint_limit


@functools.partial(
    jax.jit,
    static_argnames=('robot_fkine', 'dist_est', 'n_waypoints', 'num_trials',
                     'maxiter', 'lr', 'history', 'dense_sub',
                     'trial_sharding'))
def _adam_traj_core(start_cfg, target_cfg, limits, init_first, key,
                    robot_fkine: Callable, dist_est: Callable,
                    n_waypoints: int, num_trials: int, maxiter: int,
                    lr: float, safety_margin, max_speed: float,
                    history: bool = False, dense_sub: int = 1,
                    trial_sharding=None):
    """All restarts in parallel (vmap), all steps in one scan.

    Weights and convergence thresholds match the reference
    (optim.py:19-23, :113, :126): dif 1, collision/max_move/joint_limit 10,
    valid iff constraint <= 1e-2, converged additionally needs
    ||grad|| < 1e-4.

    ``trial_sharding`` (a NamedSharding, hashable hence static) shards the
    restart axis over a device mesh: each device runs its own restarts of
    the same compiled program, selection reduces across the mesh
    (parallel.sharding.distributed_trajopt).
    """
    dof = start_cfg.shape[-1]
    collision_w, max_move_w, joint_limit_w, dif_w = 10.0, 10.0, 10.0, 1.0

    def loss_fn(p):
        # dense_sub > 1 evaluates the collision term on a densified path
        # (configuration-space interpolation between waypoints) — the
        # reference only does this in its scipy constraint paths
        # (optim.py:190-207); on TPU the extra batch is nearly free and
        # prevents the optimizer from threading between waypoints.
        # The fixed endpoints are excluded from the collision term (like
        # the reference's dense_p[1:-1], optim.py:196): they cannot move,
        # so a false-positive proxy score there would make the constraint
        # unsatisfiable for every path.
        p_check = (utils.dense_path(p, dense_sub)
                   if dense_sub > 1 else p)[1:-1]
        diff, collision, max_move, joint_limit = _loss_terms(
            p, robot_fkine, lambda _: dist_est(p_check), limits,
            safety_margin, max_speed)
        constraint = (collision_w * collision + max_move_w * max_move
                      + joint_limit_w * joint_limit)
        objective = dif_w * diff
        return objective + constraint, (objective, constraint)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    opt = optax.adam(lr)

    # initial paths: trial 0 = straight line (or provided), others random
    rand = jax.random.uniform(
        key, (num_trials, n_waypoints, dof), dtype=start_cfg.dtype)
    rand = rand * (limits[:, 1] - limits[:, 0]) + limits[:, 0]
    straight = jnp.linspace(start_cfg, target_cfg, n_waypoints)
    had_init = ~jnp.isnan(init_first).any()
    init_first = jnp.where(had_init, init_first, straight)
    inits = rand.at[0].set(init_first)
    if num_trials > 1:
        # an explicit init (RRT seed, repair of a failed path) must not
        # COST the straight-line trial: random restarts are jagged
        # 20-waypoint noise with a far rougher loss landscape, and losing
        # the straight seed measurably loses problems the plain optimizer
        # solves (speed_compare 2class_1 repair study, round 3)
        inits = inits.at[1].set(jnp.where(had_init, straight, inits[1]))
    inits = inits.at[:, 0].set(start_cfg)
    inits = inits.at[:, -1].set(target_cfg)
    if trial_sharding is not None:
        inits = lax.with_sharding_constraint(inits, trial_sharding)

    endpoint_mask = jnp.ones((n_waypoints, 1), start_cfg.dtype)
    endpoint_mask = endpoint_mask.at[0].set(0.0).at[-1].set(0.0)

    def one_trial(p0):
        opt_state = opt.init(p0)
        big = jnp.asarray(jnp.inf, p0.dtype)

        def step(carry, it):
            p, opt_state, done, best = carry
            (loss, (objective, constraint)), g = grad_fn(p)
            g = g * endpoint_mask
            gnorm = jnp.sqrt(jnp.sum(g ** 2))
            updates, new_opt_state = opt.update(g, opt_state, p)
            freeze = done.astype(p.dtype)
            p_new = optax.apply_updates(p, jax.tree.map(
                lambda u: u * (1.0 - freeze), updates))
            opt_state = jax.tree.map(
                lambda a, b: jnp.where(done, a, b), opt_state, new_opt_state)
            p_next = jnp.where(done, p, p_new)

            (b_loss, b_loss_p, b_loss_obj, b_loss_step,
             b_valid_obj, b_valid_p, b_valid_step, found) = best
            better_loss = jnp.logical_and(~done, loss < b_loss)
            b_loss = jnp.where(better_loss, loss, b_loss)
            b_loss_p = jnp.where(better_loss, p, b_loss_p)
            b_loss_obj = jnp.where(better_loss, objective, b_loss_obj)
            b_loss_step = jnp.where(better_loss, it, b_loss_step)
            valid = constraint <= 1e-2
            better_valid = jnp.logical_and(
                ~done, jnp.logical_and(valid, objective < b_valid_obj))
            b_valid_obj = jnp.where(better_valid, objective, b_valid_obj)
            b_valid_p = jnp.where(better_valid, p, b_valid_p)
            b_valid_step = jnp.where(better_valid, it, b_valid_step)
            found = jnp.logical_or(found, valid)
            done = jnp.logical_or(done, jnp.logical_and(valid, gnorm < 1e-4))
            best = (b_loss, b_loss_p, b_loss_obj, b_loss_step,
                    b_valid_obj, b_valid_p, b_valid_step, found)
            out = p if history else None
            return (p_next, opt_state, done, best), out

        best0 = (big, p0, big, 0, big, p0, 0, jnp.asarray(False))
        (p, _, _, best), hist = lax.scan(
            step, (p0, opt_state, jnp.asarray(False), best0),
            jnp.arange(maxiter))
        return best, hist

    bests, hists = jax.vmap(one_trial)(inits)
    (b_loss, b_loss_p, b_loss_obj, b_loss_step,
     b_valid_obj, b_valid_p, b_valid_step, found) = bests

    # prefer the first trial with a valid solution (reference breaks out of
    # the trial loop at the first success, optim.py:130-132)
    any_found = jnp.any(found)
    valid_rank = jnp.where(found, jnp.arange(num_trials), num_trials)
    first_valid = jnp.argmin(valid_rank)
    lowest = jnp.argmin(b_loss)
    sel = jnp.where(any_found, first_valid, lowest)
    solution = jnp.where(any_found, b_valid_p[sel], b_loss_p[sel])
    cost = jnp.where(any_found, b_valid_obj[sel], b_loss_obj[sel])
    step_sel = jnp.where(any_found, b_valid_step[sel], b_loss_step[sel])
    return solution, cost, any_found, step_sel, hists


def _trial_sharding_from_options(o, num_trials):
    """Resolve options['mesh'] into a NamedSharding over the restart axis
    (rounding trials up to a device multiple). Returns (sharding, trials).

    Passing ``mesh`` in the options dict makes any optimizer here run its
    restarts device-parallel — the same compiled program, partitioned by
    GSPMD over the mesh's first axis (extra restarts from rounding only
    raise the chance of finding a valid path)."""
    mesh = o.get('mesh')
    if mesh is None:
        return None, num_trials
    from jax.sharding import NamedSharding, PartitionSpec
    from .parallel.sharding import data_axis
    ax = data_axis(mesh)
    n_dev = int(mesh.shape[ax])
    num_trials = -(-num_trials // n_dev) * n_dev
    return NamedSharding(mesh, PartitionSpec(ax)), num_trials


def adam_traj_optimize(robot, dist_est, start_cfg, target_cfg, options=None):
    """Penalty-method Adam trajectory optimization (ref optim.py:13-163).

    ``options['mesh']`` (a jax.sharding.Mesh) shards the restarts across
    devices. Returns the reference's record dict:
    {start_cfg, target_cfg, cnt_check, cost, time, success, seed, solution}.
    """
    o = _default_options(options)
    lr = float(o['extra_optimizer_options'].get('lr', 5e-1))
    start_cfg = jnp.asarray(start_cfg, jnp.float32)
    target_cfg = jnp.asarray(target_cfg, jnp.float32)
    n_waypoints = int(o['N_WAYPOINTS'])
    key = jax.random.PRNGKey(int(o['seed']))

    if 'init_solution' in o and o['init_solution'] is not None:
        init_first = _resample_init(o['init_solution'], n_waypoints)
    else:
        init_first = jnp.full((n_waypoints, start_cfg.shape[-1]), jnp.nan,
                              jnp.float32)

    fkine = robot.fkine
    limits = jnp.asarray(robot.limits if hasattr(robot, 'limits')
                         else robot.joint_limits, jnp.float32)
    margin = jnp.asarray(o['safety_margin'], jnp.float32)

    trial_sharding, num_trials = _trial_sharding_from_options(
        o, int(o['NUM_RE_TRIALS']))

    start_t = time.time()
    solution, cost, success, step_sel, _ = _adam_traj_core(
        start_cfg, target_cfg, limits, init_first, key,
        fkine, dist_est, n_waypoints, num_trials,
        int(o['MAXITER']), lr, margin, float(o['max_speed']),
        history=bool(o['history']), dense_sub=int(o.get('dense_sub', 1)),
        trial_sharding=trial_sharding)
    solution = np.asarray(jax.device_get(solution))
    elapsed = time.time() - start_t

    # every trial evaluates the densified interior batch each step (ref
    # counts per-eval, optim.py:90); with dense_sub > 1 each step checks
    # (n_waypoints - 1) * dense_sub - 1 points, else the n - 2 interior ones
    dsub = int(o.get('dense_sub', 1))
    n_check = ((n_waypoints - 1) * dsub - 1) if dsub > 1 else n_waypoints - 2
    return {
        'start_cfg': np.asarray(start_cfg).tolist(),
        'target_cfg': np.asarray(target_cfg).tolist(),
        'cnt_check': num_trials * int(o['MAXITER']) * n_check,
        'cost': float(cost),
        'time': elapsed,
        'success': bool(success),
        'seed': int(o['seed']),
        'solution': solution.tolist(),
    }


@functools.partial(
    jax.jit,
    static_argnames=('robot_fkine', 'dist_est', 'n_waypoints', 'num_trials',
                     'maxiter', 'lr', 'dense_sub', 'problem_sharding'))
def _adam_batch_core(starts, targets, limits, init_firsts, keys,
                     robot_fkine: Callable, dist_est: Callable,
                     n_waypoints: int, num_trials: int, maxiter: int,
                     lr: float, safety_margin, max_speed: float,
                     dense_sub: int = 1, problem_sharding=None):
    """P problems x T restarts x maxiter steps as ONE XLA program.

    ``problem_sharding`` (NamedSharding over the leading axis) spreads the
    problems across a mesh — each device optimizes its own problems end to
    end, no collectives until the host gathers the results."""
    if problem_sharding is not None:
        starts = lax.with_sharding_constraint(starts, problem_sharding)
        targets = lax.with_sharding_constraint(targets, problem_sharding)
        init_firsts = lax.with_sharding_constraint(
            init_firsts, problem_sharding)

    def one_problem(s, t, init_first, key):
        sol, cost, success, step_sel, _ = _adam_traj_core(
            s, t, limits, init_first, key, robot_fkine, dist_est,
            n_waypoints, num_trials, maxiter, lr, safety_margin,
            max_speed, history=False, dense_sub=dense_sub,
            trial_sharding=None)
        return sol, cost, success, step_sel

    return jax.vmap(one_problem)(starts, targets, init_firsts, keys)


def adam_traj_optimize_batch(robot, dist_est, start_cfgs, target_cfgs,
                             options=None):
    """Solve a whole BATCH of trajectory-optimization problems in one
    compiled program — P problems x NUM_RE_TRIALS restarts x MAXITER Adam
    steps, no host round trips anywhere.

    No reference counterpart: /root/reference/diffco/optim.py:13-163 runs
    one problem at a time in a Python loop (its speed_compare harness then
    loops over problems, scripts/speed_compare.py:500-511). On TPU the
    problem axis is just more batch for the same fused score kernel, so
    large problem sets amortize both compile and dispatch: this is the
    serving-shaped entry point (e.g. planning queries arriving in bulk).

    Per-problem seeds follow the harness convention (seed + problem
    index), so results match P independent ``adam_traj_optimize`` calls
    with those seeds exactly (same compiled math, parity-tested in
    tests/test_optim_batch.py). ``options['mesh']`` shards the PROBLEM
    axis over the mesh's first axis (problems round up to a device
    multiple internally; only the original P records are returned).

    Returns a list of P reference-style record dicts.
    """
    o = _default_options(options)
    lr = float(o['extra_optimizer_options'].get('lr', 5e-1))
    starts = jnp.asarray(start_cfgs, jnp.float32)
    targets = jnp.asarray(target_cfgs, jnp.float32)
    assert starts.shape == targets.shape and starts.ndim == 2
    P, dof = starts.shape
    n_waypoints = int(o['N_WAYPOINTS'])
    num_trials = int(o['NUM_RE_TRIALS'])
    seed = int(o['seed'])
    keys = jnp.stack([jax.random.PRNGKey(seed + i) for i in range(P)])
    if o.get('init_solutions') is not None:
        # warm starts, e.g. batched repair initialized from proxy solutions
        init_firsts = jnp.asarray(o['init_solutions'], jnp.float32)
        assert init_firsts.shape == (P, n_waypoints, dof)
    else:
        # trial 0 of each problem resolves to its straight line in the core
        init_firsts = jnp.full((P, n_waypoints, dof), jnp.nan, jnp.float32)

    fkine = robot.fkine
    limits = jnp.asarray(robot.limits if hasattr(robot, 'limits')
                         else robot.joint_limits, jnp.float32)
    margin = jnp.asarray(o['safety_margin'], jnp.float32)
    dsub = int(o.get('dense_sub', 1))

    problem_sharding = None
    mesh = o.get('mesh')
    n_pad = P
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from .parallel.sharding import data_axis
        ax = data_axis(mesh)
        n_dev = int(mesh.shape[ax])
        n_pad = -(-P // n_dev) * n_dev
        if n_pad != P:
            reps = jnp.arange(n_pad - P) % P
            starts = jnp.concatenate([starts, starts[reps]])
            targets = jnp.concatenate([targets, targets[reps]])
            init_firsts = jnp.concatenate([init_firsts, init_firsts[reps]])
            keys = jnp.concatenate([keys, keys[reps]])
        problem_sharding = NamedSharding(mesh, PartitionSpec(ax))

    start_t = time.time()
    sols, costs, succs, steps = jax.device_get(_adam_batch_core(
        starts, targets, limits, init_firsts, keys,
        fkine, dist_est, n_waypoints, num_trials, int(o['MAXITER']),
        lr, margin, float(o['max_speed']), dense_sub=dsub,
        problem_sharding=problem_sharding))
    elapsed = time.time() - start_t

    n_check = ((n_waypoints - 1) * dsub - 1) if dsub > 1 else n_waypoints - 2
    records = []
    for i in range(P):
        records.append({
            'start_cfg': np.asarray(starts[i]).tolist(),
            'target_cfg': np.asarray(targets[i]).tolist(),
            'cnt_check': num_trials * int(o['MAXITER']) * n_check,
            'cost': float(costs[i]),
            'time': elapsed / P,
            'success': bool(succs[i]),
            'seed': seed + i,
            'solution': np.asarray(sols[i]).tolist(),
        })
    return records


# ---------------------------------------------------------------------------
# Augmented-Lagrangian optimizer (on-device SLSQP / trust-constr replacement)


@functools.partial(
    jax.jit,
    static_argnames=('robot_fkine', 'dist_est', 'n_waypoints', 'num_trials',
                     'outer_iters', 'inner_iters', 'lr', 'num_sub',
                     'restore_iters', 'trial_sharding'))
def _al_traj_core(start_cfg, target_cfg, limits, init_first, key,
                  robot_fkine: Callable, dist_est: Callable,
                  n_waypoints: int, num_trials: int, outer_iters: int,
                  inner_iters: int, lr: float, safety_margin,
                  num_sub: int, restore_iters: int = 0,
                  trial_sharding=None):
    """Augmented-Lagrangian trajopt, vmapped over restarts.

    Constraints (match givengrad_traj_optimize, optim.py:190-226):
      g_col[s]  = sum over dense points in segment s of
                  clamp(dist_est - margin, 0)        (<= 0 required)
      g_jl      = total joint-limit violation         (<= 0 required)
    Objective: sum of squared control-point displacements.
    Inner minimization: Adam on the AL; outer: multiplier updates
    lambda <- max(0, lambda + mu * g).

    ``restore_iters > 0`` appends a feasibility-restoration phase: Adam
    on 0.5*sum(g^2) ALONE, each trial frozen the step it first reaches
    max(g) <= 1e-4. Measured motivation (benchmarks/baxter_al_budget.json):
    when the collision constraint is active at the optimum the AL outer
    loop's residual decays with budget (22mm -> 0.3mm over a 16x sweep on
    baxter_default) but plateaus ABOVE the 1e-4 strict-success gate;
    polishing feasibility alone at the DEFAULT budget closes the same
    problem from 22mm to 0.1mm (restore400), and gradient descent on
    sum(g^2) only ever moves the path AWAY from violated constraints.
    """
    dof = start_cfg.shape[-1]

    def constraints(p):
        dense = utils.dense_path(p, num_sub)
        g_col = utils.segment_violations(dist_est(dense[1:-1]),
                                         n_waypoints - 1, num_sub,
                                         safety_margin)
        g_jl = jnp.sum(jnp.maximum(limits[:, 0] - p, 0.0)
                       + jnp.maximum(p - limits[:, 1], 0.0))
        return jnp.concatenate([g_col, g_jl[None]])

    def objective(p):
        cp = robot_fkine(p)
        return jnp.sum((cp[1:] - cp[:-1]) ** 2)

    n_con = n_waypoints  # (n_waypoints - 1) segments + 1 joint-limit

    rand = jax.random.uniform(
        key, (num_trials, n_waypoints, dof), dtype=start_cfg.dtype)
    rand = rand * (limits[:, 1] - limits[:, 0]) + limits[:, 0]
    straight = jnp.linspace(start_cfg, target_cfg, n_waypoints)
    init_first = jnp.where(jnp.isnan(init_first).any(), straight, init_first)
    inits = rand.at[0].set(init_first)
    inits = inits.at[:, 0].set(start_cfg)
    inits = inits.at[:, -1].set(target_cfg)
    if trial_sharding is not None:
        inits = lax.with_sharding_constraint(inits, trial_sharding)

    endpoint_mask = jnp.ones((n_waypoints, 1), start_cfg.dtype)
    endpoint_mask = endpoint_mask.at[0].set(0.0).at[-1].set(0.0)

    def one_trial(p0):
        lam0 = jnp.zeros(n_con, p0.dtype)
        mu0 = jnp.asarray(10.0, p0.dtype)

        def al_loss(p, lam, mu):
            g = constraints(p)
            return objective(p) + jnp.sum(lam * g) + 0.5 * mu * jnp.sum(g * g)

        grad_fn = jax.value_and_grad(al_loss)
        opt = optax.adam(lr)

        def outer(carry, _):
            p, lam, mu = carry

            def inner(inner_carry, _):
                p, opt_state = inner_carry
                _, g = grad_fn(p, lam, mu)
                g = g * endpoint_mask
                updates, opt_state = opt.update(g, opt_state, p)
                return (optax.apply_updates(p, updates), opt_state), None

            (p, _), _ = lax.scan(inner, (p, opt.init(p)),
                                 None, length=inner_iters)
            gv = constraints(p)
            lam = jnp.maximum(lam + mu * gv, 0.0)
            mu = jnp.minimum(mu * 2.0, 1e4)
            return (p, lam, mu), None

        (p, _, _), _ = lax.scan(outer, (p0, lam0, mu0),
                                None, length=outer_iters)

        if restore_iters:
            def feas_loss(p):
                g = constraints(p)
                return 0.5 * jnp.sum(g * g), jnp.max(g)

            feas_grad = jax.value_and_grad(feas_loss, has_aux=True)
            r_opt = optax.adam(lr)

            def restore(carry, _):
                p, opt_state, done = carry
                (_, gmax), gr = feas_grad(p)
                done = jnp.logical_or(done, gmax <= 1e-4)
                freeze = done.astype(p.dtype)
                gr = gr * endpoint_mask
                updates, new_state = r_opt.update(gr, opt_state, p)
                p_new = optax.apply_updates(p, jax.tree.map(
                    lambda u: u * (1.0 - freeze), updates))
                opt_state = jax.tree.map(
                    lambda a, b: jnp.where(done, a, b), opt_state, new_state)
                return (jnp.where(done, p, p_new), opt_state, done), None

            (p, _, _), _ = lax.scan(
                restore, (p, r_opt.init(p), jnp.asarray(False)),
                None, length=restore_iters)

        g = constraints(p)
        feasible = jnp.max(g) <= 1e-4
        return p, objective(p), jnp.sum(g), feasible

    ps, objs, viols, feas = jax.vmap(one_trial)(inits)
    any_found = jnp.any(feas)
    obj_rank = jnp.where(feas, objs, jnp.inf)
    best_feasible = jnp.argmin(obj_rank)
    best_viol = jnp.argmin(viols)
    sel = jnp.where(any_found, best_feasible, best_viol)
    return ps[sel], objs[sel], any_found, jnp.max(constraints(ps[sel]))


def al_traj_optimize(robot, dist_est, start_cfg, target_cfg, options=None):
    """On-device augmented-Lagrangian trajectory optimization — the
    TPU-native replacement for the scipy SLSQP / trust-constr paths
    (ref optim.py:166-516). Same record format as adam_traj_optimize;
    ``options['mesh']`` shards the restarts across devices."""
    o = _default_options(options)
    o.setdefault('outer_iters', 10)
    o.setdefault('inner_iters', max(1, int(o['MAXITER']) // 10))
    o.setdefault('num_sub', 4)
    # feasibility-restoration epilogue (see _al_traj_core docstring);
    # 'restore_iters': 0 disables. 400 is the measured sufficient budget
    # (benchmarks/baxter_al_budget.json: restore100 leaves 5.5 mm on the
    # worst baxter_default problem, restore400 closes it to 0.1 mm); the
    # epilogue is execution-cheap (~0.1 s post-compile) because frozen
    # trials no-op once strictly feasible.
    o.setdefault('restore_iters', 400)
    lr = float(o['extra_optimizer_options'].get('lr', 1e-1))
    start_cfg = jnp.asarray(start_cfg, jnp.float32)
    target_cfg = jnp.asarray(target_cfg, jnp.float32)
    n_waypoints = int(o['N_WAYPOINTS'])
    key = jax.random.PRNGKey(int(o['seed']))
    if 'init_solution' in o and o['init_solution'] is not None:
        # arbitrary-length inits (planner paths) resample to the
        # waypoint grid, same as every other optimizer path (adam :300,
        # scipy paths :694/:832/:1013) — this was the one core that
        # crashed on a 70-waypoint RRT init at N_WAYPOINTS=60
        init_first = jnp.asarray(
            _resample_init(o['init_solution'], n_waypoints), jnp.float32)
    else:
        init_first = jnp.full((n_waypoints, start_cfg.shape[-1]), jnp.nan,
                              jnp.float32)
    limits = jnp.asarray(robot.limits if hasattr(robot, 'limits')
                         else robot.joint_limits, jnp.float32)
    margin = jnp.asarray(o['safety_margin'], jnp.float32)

    trial_sharding, num_trials = _trial_sharding_from_options(
        o, int(o['NUM_RE_TRIALS']))

    start_t = time.time()
    solution, cost, success, max_viol = _al_traj_core(
        start_cfg, target_cfg, limits, init_first, key,
        robot.fkine, dist_est, n_waypoints, num_trials,
        int(o['outer_iters']), int(o['inner_iters']), lr, margin,
        int(o['num_sub']), restore_iters=int(o['restore_iters']),
        trial_sharding=trial_sharding)
    elapsed = time.time() - start_t
    n_dense = (n_waypoints - 1) * int(o['num_sub']) + 1
    return {
        'start_cfg': np.asarray(start_cfg).tolist(),
        'target_cfg': np.asarray(target_cfg).tolist(),
        'cnt_check': num_trials * (int(o['outer_iters'])
                                   * int(o['inner_iters'])
                                   + int(o['restore_iters'])) * n_dense,
        'cost': float(cost),
        'time': elapsed,
        'success': bool(success),
        'max_violation': float(max_viol),
        'seed': int(o['seed']),
        'solution': np.asarray(jax.device_get(solution)).tolist(),
    }


# ---------------------------------------------------------------------------
# scipy-backed parity paths (host loop; kept for cross-checking against the
# reference's SLSQP / trust-constr behavior — scipy is an optional import)


def givengrad_traj_optimize(robot, dist_est, start_cfg, target_cfg,
                            options=None):
    """SLSQP with analytic JAX jacobians (ref optim.py:166-321). Host-side
    scipy loop — use ``al_traj_optimize`` for the on-device path."""
    from scipy.optimize import minimize
    o = _default_options(options)
    n_waypoints = int(o['N_WAYPOINTS'])
    dof = int(start_cfg.shape[-1])
    limits = np.asarray(robot.limits if hasattr(robot, 'limits')
                        else robot.joint_limits, np.float64)
    margin = float(np.max(np.asarray(o['safety_margin'])))
    rng = np.random.RandomState(int(o['seed']))
    start_np = np.asarray(start_cfg, np.float64)
    target_np = np.asarray(target_cfg, np.float64)
    num_sub = o.get('num_sub')
    if num_sub is None:
        # Reference parity: the reference densifies the collision
        # constraint by STEP SIZE (dense_path(p, max_speed), ref
        # optim.py:194), ~1 point/segment at its defaults — a fixed
        # num_sub=4 hands SLSQP a 4x denser (harder) feasible set, and
        # measured on the 3circle staged problems it drops strict success
        # 3/5 -> 1/5 AND raw GT-validity 4/5 -> 1/5 (the solver stalls
        # infeasible instead of converging; benchmarks/
        # reference_flag_parity.json). Match the reference's density on
        # the straight-line seed; pass options['num_sub'] to override.
        seg = float(np.linalg.norm(target_np - start_np)) / max(
            n_waypoints - 1, 1)
        num_sub = max(1, int(np.ceil(seg / float(o.get('max_speed', 2.0)))))
    num_sub = int(num_sub)

    endpoints = {}

    def _build(wrap, jdt):
        def assemble(x):
            x = jnp.asarray(x, jdt).reshape(-1, dof)
            s = jnp.asarray(endpoints['s'], jdt)[None]
            t = jnp.asarray(endpoints['t'], jdt)[None]
            return jnp.concatenate([s, x, t], axis=0)

        def con_collision(x):
            p = assemble(x)
            dense = utils.dense_path(p, num_sub)
            return -utils.segment_violations(dist_est(dense[1:-1]),
                                             n_waypoints - 1, num_sub,
                                             margin)

        def con_jl(x):
            p = assemble(x)
            return -jnp.sum(jnp.maximum(limits[:, 0] - p, 0.0)
                            + jnp.maximum(p - limits[:, 1], 0.0))

        def cost(x):
            cp = robot.fkine(assemble(x))
            return jnp.sum((cp[1:] - cp[:-1]) ** 2)

        return {'jac_col': wrap(jax.jacrev(con_collision)),
                'grad_jl': wrap(jax.grad(con_jl)),
                'grad_cost': wrap(jax.grad(cost)),
                'f_col': wrap(con_collision),
                'f_jl': wrap(con_jl),
                'f_cost': wrap(cost)}

    wrap, jdt = _scipy_exec_backend(o)
    endpoints['s'], endpoints['t'] = start_np, target_np
    fns = _build(wrap, jdt)
    if jdt == jnp.float64:
        try:  # probe: dist_est closures that cannot re-trace under x64
            fns['f_col'](np.zeros((n_waypoints - 2) * dof))
        except Exception:
            fns = _build(*_scipy_exec_backend({'scipy_fp64': False}))
    jac_col, grad_jl, grad_cost = (fns['jac_col'], fns['grad_jl'],
                                   fns['grad_cost'])
    f_col, f_jl, f_cost = fns['f_col'], fns['f_jl'], fns['f_cost']

    cnt_check = 0
    start_t = time.time()
    success = False
    lowest_const_loss = np.inf
    solution_rec = None
    for trial in range(int(o['NUM_RE_TRIALS'])):
        if trial == 0 and o.get('init_solution') is not None:
            # np.array COPIES (the endpoint writes below must not mutate
            # the caller's reusable init_solution) and _resample_init
            # fixes arbitrary-length inits (RRT plans) to n_waypoints
            init_path = np.array(
                _resample_init(o['init_solution'], n_waypoints), np.float64)
        elif trial == 0:
            init_path = np.linspace(start_np, target_np, n_waypoints)
        else:
            init_path = (rng.rand(n_waypoints, dof)
                         * (limits[:, 1] - limits[:, 0]) + limits[:, 0])
        init_path[0] = start_np
        init_path[-1] = target_np
        endpoints['s'] = init_path[0]
        endpoints['t'] = init_path[-1]
        x0 = init_path[1:-1].reshape(-1)

        def count_col(x):
            nonlocal cnt_check
            cnt_check += (n_waypoints - 1) * num_sub + 1
            return np.asarray(f_col(x), np.float64)

        res = minimize(
            lambda x: float(f_cost(x)), x0,
            jac=lambda x: np.asarray(grad_cost(x), np.float64).reshape(-1),
            method='slsqp',
            constraints=[
                {'fun': count_col, 'type': 'ineq',
                 'jac': lambda x: np.asarray(jac_col(x), np.float64).reshape(
                     n_waypoints - 1, -1)},
                {'fun': lambda x: float(f_jl(x)), 'type': 'ineq',
                 'jac': lambda x: np.asarray(grad_jl(x),
                                             np.float64).reshape(-1)},
            ],
            options={'maxiter': int(o['MAXITER']),
                     **o['extra_optimizer_options']})
        if res.success:
            success = True
            solution_rec = res
            break
        tmp = -(count_col(res.x).sum() + float(f_jl(res.x)))
        if tmp < lowest_const_loss:
            lowest_const_loss = tmp
            solution_rec = res
    elapsed = time.time() - start_t
    # snapshot BEFORE the post-hoc feasibility evaluation so cnt_check
    # keeps its during-optimization semantics in all three scipy paths
    cnt_final = cnt_check
    sol = np.concatenate([start_np[None],
                          solution_rec.x.reshape(-1, dof),
                          target_np[None]])
    # 'feasible' reports constraint satisfaction at the RETURNED solution,
    # decoupled from scipy's convergence flag ('success', the parity key):
    # a maxiter termination can still hold a fully feasible path. The
    # tolerance matches the on-device AL core's success criterion exactly
    # (max(g) <= 1e-4, _al_traj_core), so cross-path comparisons of
    # feasible_rate vs on-device success are apples-to-apples.
    feasible = bool(
        float(np.min(np.asarray(f_col(solution_rec.x)))) >= -1e-4
        and float(f_jl(solution_rec.x)) >= -1e-4)
    return {
        'start_cfg': start_np.tolist(),
        'target_cfg': target_np.tolist(),
        'cnt_check': cnt_final,
        'cost': float(solution_rec.fun),
        'time': elapsed,
        'success': success,
        'feasible': feasible,
        'seed': int(o['seed']),
        # the density is computed ONCE from the straight-line start-target
        # distance (the reference recomputes dense_path(p, max_speed) per
        # evaluation); record it so the approximation is visible at runtime
        'num_sub': num_sub,
        'solution': sol.tolist(),
    }


def gradient_free_traj_optimize(robot, checker, start_cfg, target_cfg,
                                options=None):
    """trust-constr without gradients, for binary checkers
    (ref optim.py:519-629).

    NOTE: like the reference, this method thresholds at exactly 0 and
    IGNORES ``options['safety_margin']`` — a margin has no meaning for
    the binary {0, 1} checkers this method is designed around (shifting
    a binary score by -0.3 would mark every free point as violating).
    When comparing against margin-enforcing methods (adam/al/
    trustconstr), remember their valid rates are judged with clearance
    while this one accepts zero-clearance paths."""
    from scipy.optimize import minimize, NonlinearConstraint
    o = _default_options(options)
    n_waypoints = int(o['N_WAYPOINTS'])
    dof = int(start_cfg.shape[-1])
    limits = np.asarray(robot.limits if hasattr(robot, 'limits')
                        else robot.joint_limits, np.float64)
    num_sub = int(o.get('num_sub', 4))
    rng = np.random.RandomState(int(o['seed']))
    start_np = np.asarray(start_cfg, np.float64)
    target_np = np.asarray(target_cfg, np.float64)

    cnt_check = 0
    n_dense = (n_waypoints - 1) * num_sub + 1

    def pre(x):
        return np.concatenate([start_np[None], x.reshape(-1, dof),
                               target_np[None]])

    def _build(wrap, jdt):
        def scores(p):
            dense = utils.dense_path(jnp.asarray(p, jdt), num_sub)
            return checker(dense[1:-1])
        return {'scores': wrap(scores),
                'fkine': wrap(lambda p: robot.fkine(jnp.asarray(p, jdt)))}

    wrap, jdt = _scipy_exec_backend(o)
    fns = _build(wrap, jdt)
    if jdt == jnp.float64:
        try:  # probe: checkers that cannot re-trace under x64
            fns['scores'](np.zeros((n_waypoints, dof)))
        except Exception:
            fns = _build(*_scipy_exec_backend({'scipy_fp64': False}))

    def con_collision(x):
        nonlocal cnt_check
        cnt_check += n_dense
        scores = np.asarray(fns['scores'](pre(x)))
        return -utils.segment_violations(scores, n_waypoints - 1, num_sub,
                                         0.0, xp=np)

    def con_jl(x):
        p = pre(x)
        return -np.sum(np.maximum(limits[:, 0] - p, 0)
                       + np.maximum(p - limits[:, 1], 0))

    def cost(x):
        cp = np.asarray(fns['fkine'](pre(x)))
        return float(((cp[1:] - cp[:-1]) ** 2).sum())

    start_t = time.time()
    success = False
    res = None
    for trial in range(int(o['NUM_RE_TRIALS'])):
        if trial == 0 and o.get('init_solution') is not None:
            # np.array COPIES (endpoint writes must not mutate the
            # caller's init) and _resample_init fixes arbitrary-length
            # inits (RRT plans) to n_waypoints
            init_path = np.array(
                _resample_init(o['init_solution'], n_waypoints), np.float64)
        elif trial == 0:
            init_path = np.linspace(start_np, target_np, n_waypoints)
        else:
            init_path = (rng.rand(n_waypoints, dof)
                         * (limits[:, 1] - limits[:, 0]) + limits[:, 0])
        init_path[0], init_path[-1] = start_np, target_np
        res = minimize(
            cost, init_path[1:-1].reshape(-1), method='trust-constr',
            constraints=[
                NonlinearConstraint(con_collision, 0, np.inf),
                NonlinearConstraint(con_jl, 0, np.inf)],
            options={'maxiter': int(o['MAXITER']),
                     **o['extra_optimizer_options']})
        if res.success:
            success = True
            break
    elapsed = time.time() - start_t
    # snapshot BEFORE the post-hoc feasibility evaluation (it calls the
    # counting con_collision) so cnt_check keeps during-optimization
    # semantics; tolerance matches the on-device success criterion (1e-4)
    cnt_final = cnt_check
    feasible = bool(float(np.min(con_collision(res.x))) >= -1e-4
                    and float(con_jl(res.x)) >= -1e-4)
    return {
        'start_cfg': start_np.tolist(),
        'target_cfg': target_np.tolist(),
        'cnt_check': cnt_final,
        'cost': float(res.fun),
        'time': elapsed,
        'success': success,
        'feasible': feasible,
        'seed': int(o['seed']),
        'solution': pre(res.x).tolist(),
    }


def trustconstr_traj_optimize(robot, dist_est, start_cfg, target_cfg,
                              options=None):
    """Gradient+Hessian trust-constr (ref optim.py:324-516).

    Host-side scipy trust-constr loop with analytic derivatives from JAX:
    the full per-segment collision-constraint jacobian (``jax.jacrev`` ≙
    torch.autograd.functional.jacobian, ref :369-378), the
    multiplier-weighted constraint Hessian (``jax.hessian`` of v·c(p) ≙
    torch.autograd.functional.hessian, ref :380-391), and the cost/limit
    gradients. Use ``al_traj_optimize`` for the on-device path; this one
    exists for method-parity benchmarking (speed_compare methods list).

    On a remote device the wall time is dominated by HOST<->DEVICE
    dispatches (profiled ~800 callbacks/problem; each is a tunnel round
    trip), so value+jacobian (and cost+gradient) are computed in ONE
    jitted dispatch memoized on x — scipy always evaluates them at the
    same points. ``options['constraint_hess']='bfgs'`` replaces the
    analytic constraint Hessian with scipy's quasi-Newton update,
    removing the Hessian dispatches entirely (~30% fewer round trips,
    usually similar success rate).

    ``options['free_waypoints']=K`` (default: N_WAYPOINTS) optimizes only
    K control waypoints; the returned path is still the N_WAYPOINTS-row
    linear interpolation of those controls and the collision/limit
    constraints are evaluated on the SAME densified path as the full
    problem (identical feasibility semantics, fewer decision variables).
    On 7-DOF envs the wall time is dominated by the [n_free, n_free]
    constraint Hessian and scipy's dense interior-point algebra, both
    superlinear in n_free — K=8 cuts n_free 3x (study:
    benchmarks/trustconstr_free_waypoints.json).
    """
    from scipy.optimize import minimize, NonlinearConstraint, BFGS
    o = _default_options(options)
    n_waypoints = int(o['N_WAYPOINTS'])
    dof = int(start_cfg.shape[-1])
    limits = np.asarray(robot.limits if hasattr(robot, 'limits')
                        else robot.joint_limits, np.float64)
    margin = float(np.max(np.asarray(o['safety_margin'])))
    num_sub = int(o.get('num_sub', 4))
    rng = np.random.RandomState(int(o['seed']))
    start_np = np.asarray(start_cfg, np.float64)
    target_np = np.asarray(target_cfg, np.float64)
    n_dense = (n_waypoints - 1) * num_sub + 1

    use_max_form = str(o.get('constraint_form', 'max')) == 'max'

    # coarse-control parameterization: K control waypoints, linearly
    # interpolated to the full n_waypoints rows by a FIXED matrix W
    # (host-precomputed; W rows at t=0/1 are exact so endpoints hold).
    # K == n_waypoints makes W the identity (the default, full problem).
    k_ctrl = int(o.get('free_waypoints') or n_waypoints)
    k_ctrl = max(3, min(k_ctrl, n_waypoints))
    tgrid = np.linspace(0.0, k_ctrl - 1.0, n_waypoints)
    jseg = np.minimum(tgrid.astype(int), k_ctrl - 2)
    frac = tgrid - jseg
    W_np = np.zeros((n_waypoints, k_ctrl))
    W_np[np.arange(n_waypoints), jseg] = 1.0 - frac
    W_np[np.arange(n_waypoints), jseg + 1] += frac
    # control-row indices used to subsample an [n_waypoints, dof] init
    ctrl_idx = np.round(np.linspace(0, n_waypoints - 1,
                                    k_ctrl)).astype(int)

    def _build(wrap, jdt):
        def assemble(x):
            x = jnp.asarray(x, jdt).reshape(-1, dof)
            s = jnp.asarray(start_np, jdt)[None]
            t = jnp.asarray(target_np, jdt)[None]
            ctrl = jnp.concatenate([s, x, t], axis=0)
            if k_ctrl == n_waypoints:
                return ctrl
            # W is converted at trace time (inside the x64 context the
            # f64 scipy backend traces under) — converting at _build time
            # ran outside that scope and silently truncated to f32
            W = jnp.asarray(W_np, jdt)
            return jnp.matmul(W, ctrl, precision='highest')

        def con_collision(x):
            """Per-segment collision constraint, >= 0 required.

            Default ``constraint_form='max'``: ``margin - max(score)`` per
            segment — same feasible set as the reference's summed clamped
            violations (ref con_collision_free :350-367) but with a
            nonzero jacobian on/inside the boundary, which the
            interior-point machinery needs to certify optimality (the
            clamp form is identically zero there -> rank-deficient
            jacobian -> the strict convergence flag can only fire via
            xtol). ``constraint_form='clamp'`` restores the reference
            formulation exactly."""
            p = assemble(x)
            dense = utils.dense_path(p, num_sub)
            scores = dist_est(dense[1:-1])
            if use_max_form:
                return margin - utils.segment_max_scores(
                    scores, n_waypoints - 1, num_sub)
            return -utils.segment_violations(scores, n_waypoints - 1,
                                             num_sub, margin)

        def con_jl(x):
            p = assemble(x)
            return -jnp.sum(jnp.maximum(limits[:, 0] - p, 0.0)
                            + jnp.maximum(p - limits[:, 1], 0.0))

        def cost(x):
            cp = robot.fkine(assemble(x))
            return jnp.sum((cp[1:] - cp[:-1]) ** 2)

        # ONE dispatch per x: collision value + jacobian + joint-limit
        # value + jacobian together (scipy queries them at the same x
        # back to back)
        return {
            'col_val_jac': wrap(lambda x: (con_collision(x),
                                           jax.jacrev(con_collision)(x),
                                           con_jl(x), jax.grad(con_jl)(x))),
            'cost_val_grad': wrap(lambda x: (cost(x), jax.grad(cost)(x))),
            # constraint Hessian: H(x, v) = d^2/dx^2 [v . c(x)] (ref
            # :380-391)
            'hess_col': wrap(jax.hessian(
                lambda x, v: jnp.dot(con_collision(x), v))),
        }

    n_free = (k_ctrl - 2) * dof
    wrap, jdt = _scipy_exec_backend(o)
    fns = _build(wrap, jdt)
    if jdt == jnp.float64:
        try:  # probe: dist_est closures that cannot re-trace under x64
            fns['col_val_jac'](np.zeros(n_free))
        except Exception:
            fns = _build(*_scipy_exec_backend({'scipy_fp64': False}))
    col_val_jac, cost_val_grad = fns['col_val_jac'], fns['cost_val_grad']
    hess_col = fns['hess_col']
    cnt_check = 0
    memo = {}

    def _bundle(x):
        key = np.asarray(x, np.float64).tobytes()
        if memo.get('key') != key:
            nonlocal cnt_check
            cnt_check += n_dense
            cv, cj, jv, jj = col_val_jac(x)
            memo.update(key=key,
                        col=np.asarray(cv, np.float64),
                        col_jac=np.asarray(cj, np.float64).reshape(
                            n_waypoints - 1, n_free),
                        jl=float(jv),
                        jl_jac=np.asarray(jj, np.float64).reshape(1, -1))
        return memo

    cost_memo = {}

    def _cost_bundle(x):
        key = np.asarray(x, np.float64).tobytes()
        if cost_memo.get('key') != key:
            fv, gv = cost_val_grad(x)
            cost_memo.update(key=key, f=float(fv),
                             g=np.asarray(gv, np.float64).reshape(-1))
        return cost_memo

    use_bfgs_hess = str(o.get('constraint_hess', 'analytic')) == 'bfgs'
    if use_bfgs_hess:
        hess_arg = BFGS()
    else:
        hess_arg = lambda x, v: np.asarray(
            hess_col(x, v), np.float64).reshape(n_free, n_free)

    def count_col(x):
        return _bundle(x)['col']

    start_t = time.time()
    success = False
    lowest_const_loss = np.inf
    solution_rec = None
    for trial in range(int(o['NUM_RE_TRIALS'])):
        if trial == 0 and o.get('init_solution') is not None:
            # np.array COPIES (endpoint writes must not mutate the
            # caller's init) and _resample_init fixes arbitrary-length
            # inits (RRT plans) to n_waypoints
            init_path = np.array(
                _resample_init(o['init_solution'], n_waypoints), np.float64)
        elif trial == 0:
            init_path = np.linspace(start_np, target_np, n_waypoints)
        else:
            init_path = (rng.rand(n_waypoints, dof)
                         * (limits[:, 1] - limits[:, 0]) + limits[:, 0])
        init_path[0], init_path[-1] = start_np, target_np
        res = minimize(
            lambda x: _cost_bundle(x)['f'],
            init_path[ctrl_idx][1:-1].reshape(-1),
            jac=lambda x: _cost_bundle(x)['g'],
            method='trust-constr',
            constraints=[
                NonlinearConstraint(
                    count_col, 0, np.inf,
                    jac=lambda x: _bundle(x)['col_jac'],
                    hess=hess_arg),
                NonlinearConstraint(
                    lambda x: _bundle(x)['jl'], 0, np.inf,
                    jac=lambda x: _bundle(x)['jl_jac']),
            ],
            options={'maxiter': int(o['MAXITER']),
                     **o['extra_optimizer_options']})
        if res.success:
            success = True
            solution_rec = res
            break
        tmp = -(count_col(res.x).sum() + _bundle(res.x)['jl'])
        if tmp < lowest_const_loss:
            lowest_const_loss = tmp
            solution_rec = res
    elapsed = time.time() - start_t
    # snapshot BEFORE the post-hoc feasibility _bundle (it counts when
    # solution_rec.x is not the memoized x) — during-optimization semantics
    cnt_final = cnt_check
    ctrl_sol = np.concatenate([start_np[None],
                               solution_rec.x.reshape(-1, dof),
                               target_np[None]])
    # interpolate the control solution back to the full waypoint count
    # (identity when free_waypoints is unset)
    sol = W_np @ ctrl_sol
    # constraint satisfaction at the returned solution, decoupled from
    # scipy's convergence flag (see givengrad_traj_optimize); tolerance
    # matches the on-device success criterion (1e-4)
    fin = _bundle(solution_rec.x)
    feasible = bool(float(np.min(fin['col'])) >= -1e-4
                    and fin['jl'] >= -1e-4)
    return {
        'start_cfg': start_np.tolist(),
        'target_cfg': target_np.tolist(),
        'cnt_check': cnt_final,
        'cost': float(solution_rec.fun),
        'time': elapsed,
        'success': success,
        'feasible': feasible,
        'seed': int(o['seed']),
        'solution': sol.tolist(),
    }


# ---------------------------------------------------------------------------
# stateful stepper (MPC-style), ref optim.py:632-761


class TrajOptimizer:
    def __init__(self, robot, checker, options):
        self.robot = robot
        self.checker = checker
        self.options = options
        self.normalizer = lambda x: x
        self.unnormalizer = lambda x: x

    def step(self, x):
        raise NotImplementedError

    def set_unnormalizer(self, f):
        self.unnormalizer = f

    def set_normalizer(self, f):
        self.normalizer = f

    def set_checker(self, checker):
        self.checker = checker

    def set_robot(self, robot):
        self.robot = robot


class Weighted(TrajOptimizer):
    """Weighted penalty stepper (ref optim.py:662-761): runs ``maxiter``
    Adam steps on the weighted loss, with an early break when the
    constraint loss drops below 0.5, returning the (normalized) path."""

    def __init__(self, robot, checker, options):
        super().__init__(robot, checker, options)
        self.n_waypoints = options['n_waypoints']
        self.maxiter = options['maxiter']
        self.history = options.get('history', False)
        self.dif_weight = 1.0
        self.max_move_weight = options['max_move_weight']
        self.collision_weight = options['collision_weight']
        self.joint_limit_weight = options['joint_limit_weight']
        self.safety_bias = options['safety_bias']
        self.max_speed = options['max_speed']
        self.lr = options.get('optimizer_params', {}).get('lr', 1e-1)
        self.dense_check = options.get('dense_check', False)
        self.num_sub = options.get('num_sub', 4)
        self._logger = None

    def setup_logger(self, logger):
        self._logger = logger

    def step(self, p, maxiter=None, mask=None, write=True, verbose=False):
        del write
        start_t = time.time()
        p = jnp.asarray(p, jnp.float32)
        p = self.unnormalizer(p)
        maxiter = int(maxiter if maxiter is not None else self.maxiter)
        limits = jnp.asarray(self.robot.limits, jnp.float32)
        dist_est = self.checker.rbf_score if hasattr(
            self.checker, 'rbf_score') else self.checker.poly_score
        grad_mask = (jnp.ones((p.shape[0], 1), p.dtype) if mask is None
                     else jnp.asarray(mask, p.dtype).reshape(-1, 1))

        def loss_fn(p):
            if self.collision_weight != 0:
                check_p = (utils.dense_path(p, self.num_sub)
                           if self.dense_check else p)
                collision = jnp.mean(jnp.maximum(
                    dist_est(check_p) + self.safety_bias, 0.0)) * p.shape[0]
            else:
                collision = 0.0
            cp = self.robot.fkine(p)
            seg = cp[1:] - cp[:-1]
            max_move = jnp.sum(jnp.maximum(
                jnp.sum(seg ** 2, axis=2) - self.max_speed ** 2, 0.0))
            jl = jnp.sum(jnp.maximum(limits[:, 0] - p, 0.0)
                         + jnp.maximum(p - limits[:, 1], 0.0))
            diff = jnp.sum(seg ** 2)
            constraint = (self.collision_weight * collision
                          + self.max_move_weight * max_move
                          + self.joint_limit_weight * jl)
            return self.dif_weight * diff + constraint, constraint

        # cache the compiled grad program across step() calls — an MPC
        # loop calls step() every cycle, and a fresh jit wrapper per call
        # retraces/recompiles the identical program each time. The
        # checker's trained arrays are baked into the trace as constants,
        # so the cache is keyed on their identities (refits assign new
        # arrays) plus every hyperparameter the closure captures.
        cache_key = (
            p.shape, self.num_sub, self.dense_check, self.collision_weight,
            self.max_move_weight, self.joint_limit_weight, self.safety_bias,
            self.max_speed, self.dif_weight,
            tuple(id(getattr(self.checker, a, None))
                  for a in ('support_transformed', 'rbf_nodes',
                            'valid_mask', 'gains')))
        cached = getattr(self, '_grad_fn_cache', None)
        if cached is not None and cached[0] == cache_key:
            grad_fn = cached[1]
        else:
            grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
            self._grad_fn_cache = (cache_key, grad_fn)
        opt = optax.adam(self.lr)
        opt_state = opt.init(p)
        path_history = []
        for it in range(maxiter):
            (loss, constraint), g = grad_fn(p)
            g = g * grad_mask
            updates, opt_state = opt.update(g, opt_state, p)
            p = optax.apply_updates(p, updates)
            p = self.robot.wrap(p)
            if self.history:
                path_history.append(np.asarray(self.normalizer(p)))
            if float(constraint) <= 0.5:
                break
        p = self.normalizer(p)
        from collections import namedtuple
        OptimizerResult = namedtuple('OptimizerResult', ['x', 'misc'])
        return OptimizerResult(
            x=p, misc={'path_history': path_history,
                       'time': time.time() - start_t})
