"""The committed tutorial notebook must stay runnable.

Executes every code cell of
notebook_tutorials/trajectory_optimization_tutorial.ipynb in order in one
shared namespace with DIFFCO_TUTORIAL_QUICK=1 — the same canonical user
journey the reference ships as
notebook_tutorials/trajectory_optimization_tutorial.ipynb (RTB Panda env
-> three ways to train -> planner init -> Adam trajopt -> exact-checker
verify), plus the mesh/bulk sections unique to this framework. On the
test's 8-virtual-device CPU mesh the scale-out cell actually exercises
the sharded fit + device-parallel trajopt.
"""
import json
import os

NB_PATH = os.path.join(os.path.dirname(__file__), '..',
                       'notebook_tutorials',
                       'trajectory_optimization_tutorial.ipynb')


def test_tutorial_notebook_executes(monkeypatch):
    monkeypatch.setenv('DIFFCO_TUTORIAL_QUICK', '1')
    with open(NB_PATH) as f:
        nb = json.load(f)
    code_cells = [''.join(c['source']) for c in nb['cells']
                  if c['cell_type'] == 'code']
    assert len(code_cells) >= 10
    ns = {}
    for i, src in enumerate(code_cells):
        exec(compile(src, f'{NB_PATH}:cell{i}', 'exec'), ns)

    # journey landmarks: trained checker (the reference's gate is
    # TPR >= 0.9, test_fkine_diffco.py:44), a ground-truth-validated
    # trajectory, a post-move update that keeps the proxy usable, and
    # bulk records
    assert ns['tpr'] is not None and ns['tpr'] >= 0.9
    assert ns['acc'] > 0.7
    assert ns['gt_valid']
    assert ns['tpr_u'] >= 0.85
    assert len(ns['recs']) == 2
