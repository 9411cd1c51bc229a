#!/usr/bin/env python
"""Render benchmarks/speed_compare_matrix.json as a markdown table
(env rows x method columns: valid% / strict-success% / mean time)."""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else \
    'benchmarks/speed_compare_matrix.json'
d = json.load(open(path))
envs, methods = [], []
for tag in d:
    e, m = tag.rsplit('/', 1)
    if e not in envs:
        envs.append(e)
    if m not in methods:
        methods.append(m)

print('| env (dof) | ' + ' | '.join(methods) + ' |')
print('|---' * (len(methods) + 1) + '|')
for e in envs:
    cells = []
    dof = None
    for m in methods:
        r = d.get(f'{e}/{m}')
        if r is None:
            cells.append('—')
            continue
        dof = r.get('dof')
        cell = (f"{r['valid_rate']:.1f} / {r['success_rate']:.1f} / "
                f"{r['mean_time']:.1f}s")
        # newer runs record 'feasible_rate' (constraint satisfaction at
        # the solution, decoupled from scipy's convergence flag); show it
        # when it differs from the strict flag
        fr = r.get('feasible_rate')
        if fr is not None and abs(fr - r['success_rate']) > 1e-9:
            cell += f' (feas {fr:.1f})'
        cells.append(cell)
    print(f'| {e} ({dof}) | ' + ' | '.join(cells) + ' |')
print()
print('cells: valid-after-repair rate / strict optimizer success rate / '
      'mean wall time per problem; "(feas x)" = feasible_rate when it '
      'differs from the strict flag')
