#!/usr/bin/env python
"""Generate notebook_tutorials/trajectory_optimization_tutorial.ipynb.

Parity target: the reference's canonical user journey
(notebook_tutorials/trajectory_optimization_tutorial.ipynb — RTB Panda
env -> dataset -> three ways to train -> planner init -> Adam trajopt ->
exact-checker verify), re-created on the self-contained TPU stack. The
notebook is plain JSON, generated here so the cells stay reviewable as
code; tests/test_notebook.py executes every code cell in order with
DIFFCO_TUTORIAL_QUICK=1, so the committed notebook is guaranteed
runnable.
"""
import json
import os

CELLS = []


def md(text):
    CELLS.append({'cell_type': 'markdown', 'metadata': {},
                  'source': text.splitlines(keepends=True)})


def code(text):
    CELLS.append({'cell_type': 'code', 'metadata': {},
                  'execution_count': None, 'outputs': [],
                  'source': text.strip('\n').splitlines(keepends=True)})


md("""# Trajectory optimization with diffco_tpu

The canonical DiffCo journey: build an environment, train a differentiable
collision proxy three ways, plan an initial path, optimize a trajectory
through the proxy's gradients, and verify the result against the exact
geometric checker. Everything runs self-contained — the ground truth is the
batched geometric engine (no FCL/simulator), and every step scales from one
chip to a TPU mesh unchanged.

Set `DIFFCO_TUTORIAL_QUICK=1` to run with reduced sample counts (the test
suite does this); defaults reproduce realistic sizes.""")

code("""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import diffco_tpu as dc

QUICK = bool(int(os.environ.get('DIFFCO_TUTORIAL_QUICK', '0')))
N_FIT = 2500 if QUICK else 3000
MAXITER = 50 if QUICK else 200
N_TRIALS = 2 if QUICK else 8
print(f'devices: {jax.devices()}  quick={QUICK}')
""")

md("""## 1. Environment + robot

`PandaSingleCylinderEnv` is one of the ready-made tutorial environments
(the reference builds these with roboticstoolbox + Swift; here the same
scene runs on the self-contained URDF Panda + geometric collision
engine). Any `ShapeEnv` dict of Box/Sphere/Cylinder/Capsule/Mesh
obstacles works the same way.""")

code("""
from diffco_tpu.envs.panda_envs import PandaSingleCylinderEnv

# QUICK drops the gripper dofs and uses a coarser sphere decomposition —
# a much smaller geometry program (CPU XLA compiles of the 24-sphere
# self-distance run minutes; the journey is identical)
penv = PandaSingleCylinderEnv(
    **({'load_gripper': False, 'link_spheres': 6} if QUICK else {}))
robot, env = penv.robot, penv.env
print(robot.spec.n_dofs, 'dofs;', env.n_objects, 'obstacle(s)')
""")

md("""## 2. Train the proxy — three ways

**(a) Fully automatic**: the checker samples configurations, labels them
with the batched geometric ground truth (one compiled device call, not a
per-config FCL loop), trains the kernel perceptron, re-fits the smooth
polyharmonic surrogate, and verifies on a held-out split.""")

code("""
checker = dc.ForwardKinematicsDiffCo(robot=robot, environment=env)
t0 = time.time()
acc, tpr, tnr = checker.fit(num_samples=N_FIT)
print(f'fit {time.time() - t0:.1f}s  acc={acc:.3f} tpr={tpr:.3f} '
      f'tnr={tnr:.3f}  supports={checker.perceptron.num_valid}')
""")

md("""**(b) Checker API with your own data** — bring pre-labeled
configurations (e.g. from a logged deployment) and fit on those:""")

code("""
q_own = robot.rand_configs(N_FIT, jax.random.PRNGKey(0))
labels_own = robot.collision(q_own, other=env)      # one device call
acc_b, tpr_b, tnr_b = checker.fit(q=q_own, labels=labels_own)
print(f'own-data fit  acc={acc_b:.3f} tpr={tpr_b:.3f} tnr={tnr_b:.3f}')
""")

md("""**(c) Raw perceptron API** — full control over kernel and
transform (here the FK transform maps joint angles to link control
points, the geometry the kernel should be smooth in):""")

code("""
from diffco_tpu import kernels
from diffco_tpu.perceptron import DiffCo

clf = DiffCo(kernel_func=kernels.RQKernel(10.0),
             transform=robot.fkine)
y = 2.0 * jnp.asarray(labels_own, jnp.float32) - 1
clf.train(q_own, y, max_iteration=3 * len(q_own))
clf.fit_poly(kernels.Polyharmonic(1, 1), target='label')
raw_acc = float(((clf.poly_score(q_own).reshape(-1) > 0) == (y > 0))
                .mean())
print(f'raw perceptron train acc={raw_acc:.3f}, '
      f'{clf.num_valid} supports')
""")

md("""## 3. Pick a problem + initial path (optional)

Start/target must be collision-free. `MotionPlanner` is a batched
RRT-Connect: every round validates a whole batch of candidate motions in
two device calls (the reference's OMPL wrapper checks one edge at a
time). Using the *proxy* as its validity oracle keeps planning entirely
off the exact checker.""")

code("""
cand = robot.rand_configs(512, jax.random.PRNGKey(1))
free_q = np.asarray(cand)[~np.asarray(robot.collision(cand, other=env))]
d = np.linalg.norm(free_q[:64, None] - free_q[None, :64], axis=-1)
i, j = np.unravel_index(np.abs(d - np.median(d[d > 0])).argmin(), d.shape)
start, target = free_q[i], free_q[j]

from diffco_tpu.planning import MotionPlanner
planner = MotionPlanner(robot, lambda q: checker.collision(q),
                        step_size=0.4)
init_path = planner.plan(start, target,
                         max_iters=1600 if QUICK else 2000)
print('planner found' if init_path is not None else 'no init path',
      f'({planner.cnt_check} proxy checks)')
""")

md("""## 4. Trajectory optimization

All restarts × iterations compile into **one XLA program** (the
reference loops both on the host: ~2000 eager score+grad round trips per
problem). `dense_sub` adds interpolated points between waypoints to the
collision penalty; `init_solution` seeds trial 0 (the remaining restarts
stay random). `optim.al_traj_optimize` is the on-device
augmented-Lagrangian alternative; `optim.givengrad_traj_optimize` /
`optim.trustconstr_traj_optimize` keep scipy-parity paths.""")

code("""
from diffco_tpu import optim

dist_est = checker.score_fn(bias=0.0)
options = {'N_WAYPOINTS': 20, 'NUM_RE_TRIALS': N_TRIALS,
           'MAXITER': MAXITER, 'safety_margin': -checker.safety_bias,
           'max_speed': 2.0, 'seed': 0, 'dense_sub': 4,
           'history': False}
if init_path is not None:
    options['init_solution'] = jnp.asarray(init_path, jnp.float32)
rec = optim.adam_traj_optimize(robot, dist_est, start, target, options)
print(f"success={rec['success']} cost={rec['cost']:.3f} "
      f"time={rec['time']:.2f}s checks={rec['cnt_check']}")
""")

md("""## 5. Verify — and repair — with the exact checker

Every optimized path gets validated against the exact geometry on a
densified interpolation (the reference's speed_compare validate stage).
Because the geometric engine is JAX, the exact signed distance is
*itself differentiable* — a failed path is repaired by re-optimizing
directly against it, seeded with the proxy solution.""")

code("""
from diffco_tpu import utils

sol = jnp.asarray(rec['solution'], jnp.float32)
dense = utils.dense_path(sol, 8)
gt_valid = not bool(np.asarray(
    robot.collision(dense[1:-1], other=env)).any())
print('ground-truth valid:', gt_valid)

if not gt_valid:
    def gt_dist(q):
        env_sd, self_sd = robot.collision_signed_dist(q, env)
        return jnp.maximum(jnp.max(env_sd, axis=-1), self_sd)

    rec = optim.adam_traj_optimize(
        robot, gt_dist, start, target,
        {**options, 'NUM_RE_TRIALS': 1, 'MAXITER': 200,
         'safety_margin': -0.03, 'dense_sub': 8,
         'init_solution': sol})
    sol = jnp.asarray(rec['solution'], jnp.float32)
    gt_valid = not bool(np.asarray(robot.collision(
        utils.dense_path(sol, 8)[1:-1], other=env)).any())
    print('after repair:', gt_valid)
""")

md("""## 6. Obstacles moved? Active update

`ShapeEnv` obstacles are a registered pytree: moving one re-uses every
compiled program (no recompilation). `update` runs the active-learning
step — exploit samples around the current supports + uniform explore
samples + the supports themselves, warm-starting the perceptron from its
previous state.""")

code("""
T_new = np.eye(4)
T_new[:3, 3] = [0.45, 0.25, 0.4]
env.update_transform('cylinder1', T_new)

t0 = time.time()
checker.update(num_samples=200 if QUICK else 300)
print(f'update {time.time() - t0:.1f}s  '
      f'supports={checker.perceptron.num_valid}')
acc_u, tpr_u, tnr_u = checker.verify(
    robot.rand_configs(1000, jax.random.PRNGKey(3)))
print(f'post-move verify  acc={acc_u:.3f} tpr={tpr_u:.3f}')
""")

md("""**Path-targeted update** — when the optimizer keeps failing in one
region (a narrow passage the uniform training set never sampled), feed
`update` the failing trajectory and/or a planner path through the
region: it retrains on ground-truth-labeled jittered bands around those
paths instead of around the supports, then you re-run the optimizer on
the sharpened proxy.""")

code("""
failed_path = np.asarray(rec['solution'])  # the optimizer's output
t0 = time.time()
checker.update(exploit_paths=[failed_path],
               num_exploit_samples=256 if QUICK else 1024)
print(f'path-targeted update {time.time() - t0:.1f}s  '
      f'supports={checker.perceptron.num_valid}')
""")

md("""## 7. Scale out over a device mesh

Every step above scales over multiple chips by passing a
`jax.sharding.Mesh` — same numerics, partitioned by GSPMD: labeling and
verification sweeps shard over configurations, the Gram matrix (or the
lazy kernel rows past the memory ceiling) shards over rows, and trajopt
restarts run device-parallel. The low-level axes live in
`diffco_tpu.parallel` for custom compositions.""")

code("""
if len(jax.devices()) > 1:
    from diffco_tpu.parallel import make_mesh

    mesh = make_mesh(('dp',))              # all local devices
    ck_mesh = dc.ForwardKinematicsDiffCo(robot=robot, environment=env,
                                         mesh=mesh)
    acc_m, tpr_m, _ = ck_mesh.fit(num_samples=600 if QUICK else N_FIT)
    rec_m = optim.adam_traj_optimize(
        robot, ck_mesh.score_fn(bias=0.0), start, target,
        {**options, 'NUM_RE_TRIALS': len(jax.devices()), 'mesh': mesh})
    print(f'meshed fit acc={acc_m:.3f}; '
          f"meshed trajopt cost={rec_m['cost']:.3f}")
else:
    print('single device — mesh section skipped')
""")

md("""## 8. Bulk solving — many problems in one program

When planning queries arrive in bulk (serving, dataset generation,
benchmark sweeps) the problem axis is just more batch: all
`P × NUM_RE_TRIALS` optimizations run as one compiled program, and with
a mesh the problem axis shards across chips with zero collectives until
the host gather. One v5e chip solves + validates + repairs 64 Baxter
problems in under 10 s (~150 ms per problem).""")

code("""
# the obstacle MOVED in section 6 — re-check the endpoints against the
# updated world first (endpoints are excluded from the collision
# penalty, so an in-collision endpoint would silently yield an
# unexecutable 'success')
assert not bool(robot.collision(jnp.stack([start, target]),
                                other=env).any()), \\
    'endpoints invalid after obstacle motion; resample them'
starts = jnp.stack([jnp.asarray(start), jnp.asarray(target)])
targets = jnp.stack([jnp.asarray(target), jnp.asarray(start)])
recs = optim.adam_traj_optimize_batch(
    robot, dist_est, starts, targets,
    {'N_WAYPOINTS': 20, 'NUM_RE_TRIALS': N_TRIALS, 'MAXITER': MAXITER,
     'safety_margin': -checker.safety_bias, 'max_speed': 2.0,
     'seed': 0, 'dense_sub': 3})
print([f"cost={r['cost']:.2f} success={r['success']}" for r in recs])
""")


def main():
    nb = {
        'cells': CELLS,
        'metadata': {
            'kernelspec': {'display_name': 'Python 3',
                           'language': 'python', 'name': 'python3'},
            'language_info': {'name': 'python', 'version': '3.12'},
        },
        'nbformat': 4,
        'nbformat_minor': 5,
    }
    out = os.path.join(os.path.dirname(__file__), '..',
                       'notebook_tutorials',
                       'trajectory_optimization_tutorial.ipynb')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'w') as f:
        json.dump(nb, f, indent=1)
    print(f'wrote {os.path.normpath(out)} ({len(CELLS)} cells)')


if __name__ == '__main__':
    main()
