"""Measure the scipy strict-success flag of the REFERENCE optimizers on
the exact problems this repo benchmarks, side by side with ours.

Motivation (round-3 verdict, weak #2): our trustconstr cells record
``success`` 0.0 while GT-valid holds 0.8-1.0, and the f32-noise diagnosis
(benchmarks/trustconstr_termination_study.json) suggested a float64 fix.
Round 4 implemented f64 host derivatives (optim._scipy_exec_backend) and a
non-degenerate per-segment max constraint form — givengrad's strict flag
improved — but trustconstr still rarely fires ``res.success``. This script
answers the parity question directly: it runs the reference's OWN
``trustconstr_traj_optimize`` / ``givengrad_traj_optimize``
(/root/reference/diffco/optim.py:324-516) on torch CPU against a torch
twin of the identical trained proxy (same support points, same
polyharmonic weights), on the identical 5 pre-staged 3circle problems,
and records both sides' flags.

Measured result (recorded in benchmarks/reference_flag_parity.json):
the reference's trust-constr ALSO reports success 0/5 on these problems
(while producing GT-valid paths) — the sparse strict flag is inherent to
interior-point termination on this problem class, not a deficiency of
this port. See benchmarks/RESULTS.md "trust-constr strict-success flag".

Notes on the reference import:
- ``diffco/__init__`` pulls FCL/trimesh deps unavailable here, so the
  optim module is exec'd standalone with a minimal package shim.
- The reference's analytic-Hessian path hardcodes
  ``var_v = torch.tensor(v, dtype=torch.float32)`` (optim.py:382) which
  crashes under default-double tensors (torch.dot dtype mismatch) — a
  latent bug upstream. The measurement patches that single line to
  float64 so the reference's intended analytic-Hessian path can run at
  all; everything else is executed verbatim.

Usage: python scripts/reference_flag_parity.py [--env 3circle] [--dof 2]
"""
import argparse
import importlib.util as ilu
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REF_ROOT = '/root/reference'


def load_reference_optim():
    """Exec the reference optim.py with a package shim (its package
    __init__ needs FCL/trimesh which are unavailable) and the single
    documented dtype patch that unblocks its analytic-Hessian path."""
    import torch
    refpkg = types.ModuleType('diffco')
    refpkg.__path__ = [os.path.join(REF_ROOT, 'diffco')]
    sys.modules['diffco'] = refpkg
    import diffco.utils  # noqa: F401  (reference helper modules)
    import diffco.kernel_perceptrons  # noqa: F401
    # the reference calls torch.from_numpy on values that are already
    # tensors when driven programmatically; make it a no-op there
    orig_fn = torch.from_numpy
    torch.from_numpy = (lambda a: a if isinstance(a, torch.Tensor)
                        else orig_fn(a))
    path = os.path.join(REF_ROOT, 'diffco', 'optim.py')
    spec = ilu.spec_from_file_location('refoptim', path)
    mod = ilu.module_from_spec(spec)
    mod.__dict__['__package__'] = 'diffco'
    src = open(path).read()
    src = src.replace(
        "var_v = torch.tensor(v, dtype=torch.float32)",
        "var_v = torch.tensor(v, dtype=torch.float64)")
    exec(compile(src, path, 'exec'), mod.__dict__)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--env', default='3circle')
    ap.add_argument('--dof', type=int, default=2)
    ap.add_argument('--link-length', type=float, default=3.5)
    ap.add_argument('--num-problems', type=int, default=5)
    ap.add_argument('--out', default='benchmarks/reference_flag_parity.json')
    args = ap.parse_args()

    if not os.path.isdir(REF_ROOT):
        print(f'reference mount {REF_ROOT} unavailable; nothing to measure')
        return

    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    import torch
    from speed_compare import build_world, make_score_fns, validate
    from diffco_tpu import optim as om

    torch.set_default_dtype(torch.float64)

    robot, obs, checker = build_world(
        args.env, dof=args.dof, link_length=args.link_length,
        num_train=6000, seed=1917)
    fns = make_score_fns(robot, obs, checker)

    cfg_path = (f'benchmarks/test_configs/'
                f'test_configs_{args.env}_{args.dof}d.json')
    cfg = json.load(open(cfg_path))

    # ---- torch twin of the trained proxy: identical supports/weights ----
    sup = np.asarray(checker.support_points, np.float64)
    w = np.asarray(checker.rbf_nodes, np.float64).reshape(-1)
    mask = np.asarray(checker.valid_mask, bool)
    sup_t = torch.from_numpy(sup[mask])
    w_t = torch.from_numpy(w[mask])

    def ref_dist_est(q):
        # The reference densifies by STEP SIZE (utils.dense_path(p,
        # max_speed), ref optim.py:194) — a wild SLSQP line-search iterate
        # yields tens of millions of dense points and a ~300 GB cdist.
        # Chunk the cdist and refuse truly absurd sizes so a reference
        # robustness failure records as a failed problem instead of
        # killing the measurement (it is caught per-problem below).
        q = q.reshape(-1, args.dof)
        if q.shape[0] > 2_000_000:
            raise RuntimeError(
                f'reference dense path exploded to {q.shape[0]} points')
        outs = []
        for i in range(0, q.shape[0], 262144):
            r = torch.cdist(q[i:i + 262144], sup_t)
            outs.append(r @ w_t)
        return torch.cat(outs).reshape(-1, 1)

    class RobotShim:
        dof = args.dof
        limits = torch.from_numpy(np.asarray(robot.limits, np.float64))
        _ll = torch.from_numpy(
            np.asarray(robot.link_length, np.float64)).reshape(-1)

        def fkine(self, q):
            q = q.reshape(-1, self.dof)
            ang = torch.cumsum(q, dim=1)
            dx = torch.cumsum(self._ll * torch.cos(ang), dim=1)
            dy = torch.cumsum(self._ll * torch.sin(ang), dim=1)
            return torch.stack([dx, dy], dim=2)

    refoptim = load_reference_optim()
    shim = RobotShim()
    # the matrix harness's exact options (speed_compare.py main), incl.
    # the per-problem seed convention (seed + problem index)
    opts = {'N_WAYPOINTS': 20, 'NUM_RE_TRIALS': 5, 'MAXITER': 200,
            'safety_margin': -0.3, 'dense_sub': 3,
            'max_speed': 2.0, 'seed': 1917,
            'extra_optimizer_options': {}}

    out = {'env': args.env, 'dof': args.dof, 'options': dict(opts),
           'methods': {}}

    def run_side(name, fn, dist, is_ref):
        recs = []
        for i in range(args.num_problems):
            start = np.asarray(cfg['start_cfgs'][i], np.float64)
            target = np.asarray(cfg['target_cfgs'][i], np.float64)
            if is_ref:
                start, target = (torch.from_numpy(start),
                                 torch.from_numpy(target))
            t0 = time.time()
            try:
                rec = fn(shim if is_ref else robot, dist, start, target,
                         options={**opts, 'seed': opts['seed'] + i})
            except (RuntimeError, MemoryError) as e:
                # reference-side robustness failure (dense-path explosion
                # or its latent dtype bug) — record as a failed problem
                recs.append({'success': False, 'feasible': False,
                             'gt_valid': False,
                             'time': time.time() - t0,
                             'cost': float('nan'),
                             'error': str(e)[:200]})
                print(f'{name} #{i}: CRASHED: {str(e)[:120]}', flush=True)
                continue
            dt = time.time() - t0
            ok = validate(robot, obs, np.asarray(rec['solution']))
            recs.append({'success': bool(rec['success']),
                         'feasible': bool(rec.get('feasible', ok)),
                         'gt_valid': bool(ok), 'time': dt,
                         'cost': float(rec['cost'])})
            print(f'{name} #{i}: success={rec["success"]} valid={ok} '
                  f'{dt:.1f}s', flush=True)
        out['methods'][name] = {
            'success_rate': sum(r['success'] for r in recs) / len(recs),
            'gt_valid_rate': sum(r['gt_valid'] for r in recs) / len(recs),
            'records': recs}

    run_side('reference_trustconstr', refoptim.trustconstr_traj_optimize,
             ref_dist_est, is_ref=True)
    run_side('reference_givengrad', refoptim.givengrad_traj_optimize,
             ref_dist_est, is_ref=True)
    run_side('ours_trustconstr', om.trustconstr_traj_optimize,
             fns['proxy_dist'], is_ref=False)
    run_side('ours_givengrad', om.givengrad_traj_optimize,
             fns['proxy_dist'], is_ref=False)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', args.out)
    for k, v in out['methods'].items():
        print(f'{k}: success {v["success_rate"]:.1f} '
              f'valid {v["gt_valid_rate"]:.1f}')


if __name__ == '__main__':
    main()
