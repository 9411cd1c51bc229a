"""Characterize the CPU-torch baseline's thread scaling so the headline
``vs_baseline`` multiplier survives a fair multicore comparison.

Context (round-3 verdict, weak #3): every recorded bench baseline so far
ran on a 1-core builder host (~1.2-1.45e5 evals/s), so the headline
"301.6M evals/s = 2084× baseline" divides by a single-thread torch
number. This script measures the SAME baseline kernel (bench.py's
``_torch_cpu_baseline``: DH-chain Panda FK + polyharmonic score +
autograd backward) at every power-of-two thread count the host offers,
records the scaling curve, and models the break-even core count at which
the TPU chip's measured throughput stops being >= 100x the torch
baseline (assuming PERFECT linear scaling beyond the measured points —
the assumption most favorable to the baseline).

Output: benchmarks/baseline_scaling.json. Run it on the biggest host
available; the artifact records nproc so partial curves are honest.

Usage: python scripts/baseline_scaling.py [--tpu-evals-per-sec 3.016e8]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tpu-evals-per-sec', type=float, default=301.6e6,
                    help='TPU headline to model break-even against '
                         '(BENCH_r03.json)')
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--out', default='benchmarks/baseline_scaling.json')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')  # never claim the TPU
    import torch
    import bench

    ncpu = os.cpu_count() or 1
    threads = [1]
    while threads[-1] * 2 <= ncpu:
        threads.append(threads[-1] * 2)
    if threads[-1] != ncpu:
        threads.append(ncpu)

    curve = {}
    for t in threads:
        # bench._torch_cpu_baseline pins to all cores; re-pin per point
        torch.set_num_threads(t)
        orig = torch.set_num_threads
        torch.set_num_threads = lambda *_: None  # keep OUR pin
        try:
            tput = bench._torch_cpu_baseline(iters=args.iters)
        finally:
            torch.set_num_threads = orig
        curve[str(t)] = tput
        print(f'{t} thread(s): {tput:.3e} evals/s', flush=True)

    per_thread = curve['1']
    best_t = max(curve, key=lambda k: curve[k])
    best = curve[best_t]
    # efficiency at the widest measured point
    eff = best / (per_thread * int(best_t))
    # break-even core count for the 100x target under PERFECT scaling
    # from the single-thread rate (most favorable to the baseline)
    breakeven_100x = args.tpu_evals_per_sec / (100.0 * per_thread)
    out = {
        'host_cores': ncpu,
        'threads_measured': {k: round(v, 1) for k, v in curve.items()},
        'single_thread_evals_per_sec': round(per_thread, 1),
        'best_measured_evals_per_sec': round(best, 1),
        'best_measured_threads': int(best_t),
        'parallel_efficiency_at_best': round(eff, 3),
        'tpu_evals_per_sec': args.tpu_evals_per_sec,
        'vs_single_thread': round(args.tpu_evals_per_sec / per_thread, 1),
        'vs_best_measured': round(args.tpu_evals_per_sec / best, 1),
        'breakeven_cores_for_100x_perfect_scaling': round(breakeven_100x, 1),
        'note': ('breakeven assumes PERFECT linear scaling from the '
                 'single-thread rate — real torch scaling is sublinear '
                 '(see parallel_efficiency_at_best when host_cores > 1), '
                 'so the true breakeven core count is higher'),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ('host_cores', 'single_thread_evals_per_sec',
                       'vs_single_thread',
                       'breakeven_cores_for_100x_perfect_scaling')}))
    print('wrote', args.out)


if __name__ == '__main__':
    main()
