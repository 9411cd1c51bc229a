#!/usr/bin/env python
"""SE(3) free-flying rigid-body trajectory optimization.

Parity targets: /root/reference/scripts/se3_data_generation.py
(generate_one :70, mesh-world datasets) and scripts/manual_trajopt_se3.py
(:585-700: DiffCoBeta(FKKernel(fkine, RQ(10)), Polyharmonic(3, 1)) trained
on distances, safety_bias=-0.3, trajopt from planner-initialized paths).

The free-flyer body is sphere-decomposed (from a mesh when given,
otherwise an analytic multi-sphere probe); the world is a ShapeEnv of
primitives/meshes with closed-form SDFs — all batched on device.
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

from diffco_tpu import kernels, optim, utils
from diffco_tpu.perceptron import DiffCo, DiffCoBeta
from diffco_tpu.envs import ShapeEnv
from diffco_tpu.geometry import spheres_vs_scene_signed_dist
from diffco_tpu.geometry.mesh import load_mesh, spheres_from_mesh
from diffco_tpu.robots import RigidBody
from diffco_tpu.utils import euler2mat


def build_body(mesh_path=None, scale=1.0, n_spheres=16):
    """Body spheres in the body frame + keypoints for the RigidBody
    model."""
    if mesh_path and os.path.exists(mesh_path):
        verts, faces = load_mesh(mesh_path)
        verts = verts * scale
        verts = verts - verts.mean(0)
        centers, radii = spheres_from_mesh(verts, faces,
                                           n_spheres=n_spheres)
        robot = RigidBody.from_vertices(verts)
    else:
        # default analytic body: an elongated 3-sphere probe
        centers = np.asarray([[-0.3, 0, 0], [0, 0, 0], [0.3, 0, 0]],
                             np.float32)
        radii = np.full(3, 0.18, np.float32)
        robot = RigidBody(keypoints=centers)
    return robot, jnp.asarray(centers), jnp.asarray(radii)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--mesh', default=None,
                   help='body mesh (e.g. the teapot asset)')
    p.add_argument('--scale', type=float, default=1.0)
    p.add_argument('--num-samples', type=int, default=6000)
    p.add_argument('--use-beta', action='store_true')
    p.add_argument('--waypoints', type=int, default=20)
    p.add_argument('--maxiter', type=int, default=300)
    p.add_argument('--safety-bias', type=float, default=-0.3)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--output', default=None)
    args = p.parse_args()

    robot, body_c, body_r = build_body(args.mesh, args.scale)
    robot.limits = jnp.asarray(
        [[-3, 3], [-3, 3], [-3, 3],
         [-np.pi, np.pi], [-np.pi, np.pi], [-np.pi, np.pi]], jnp.float32)
    T = lambda t: np.r_[np.c_[np.eye(3), np.asarray(t)], [[0, 0, 0, 1]]]
    env = ShapeEnv(shapes={
        'pillar1': {'type': 'Cylinder',
                    'params': {'radius': 0.5, 'height': 6.0},
                    'transform': T([1.2, 1.2, 0.0])},
        'pillar2': {'type': 'Cylinder',
                    'params': {'radius': 0.5, 'height': 6.0},
                    'transform': T([-1.2, -1.2, 0.0])},
        'shelf': {'type': 'Box', 'params': {'extents': [2.0, 0.4, 2.0]},
                  'transform': T([0.0, 1.8, 0.0])},
        'ball': {'type': 'Sphere', 'params': {'radius': 0.6},
                 'transform': T([-1.5, 1.5, 1.0])},
    })

    @jax.jit
    def gt_signed(q):
        """q [B, 6] -> max signed distance over objects (>0 collision).
        Jitted: eager GT labeling pays a tunnel dispatch per op
        (CLAUDE.md jit-boundary rule)."""
        q = jnp.atleast_2d(q)
        R = euler2mat(q[:, 3:])                          # [B, 3, 3]
        centers = jnp.einsum('bij,pj->bpi', R, body_c,
                             precision='highest') + q[:, None, :3]

        def per_cfg(c):
            return jnp.max(spheres_vs_scene_signed_dist(
                c, body_r, env.scene))
        return jax.vmap(per_cfg)(centers)

    key = jax.random.PRNGKey(args.seed)
    q = robot.rand_configs(args.num_samples, key)
    dist = gt_signed(q)
    labels = (dist > 0) * 2.0 - 1.0
    print(f'dataset: {float(jnp.mean(labels > 0)):.2%} in collision')

    t0 = time.time()
    if args.use_beta:
        # ref manual_trajopt_se3.py:16: DiffCoBeta(FKKernel(fkine, RQ(10)),
        # Polyharmonic) trained on distances
        clf = DiffCoBeta(kernel_func=kernels.RQKernel(10.0),
                         rbf_kernel=kernels.Polyharmonic(1, 1),
                         transform=lambda x: robot.fkine(x))
        clf.train(q, dist, max_iteration=3 * args.num_samples,
                  n_left_out_points=300)
        dist_est = lambda pp: clf.rbf_score(pp).reshape(-1)
    else:
        clf = DiffCo(kernel_func=kernels.RQKernel(10.0),
                     transform=lambda x: robot.fkine(x))
        clf.train(q, labels, max_iteration=3 * args.num_samples, distance=dist)
        clf.fit_poly(kernels.Polyharmonic(1, 1), target='dist')
        dist_est = lambda pp: clf.poly_score(pp).reshape(-1)
    print(f'train: {time.time() - t0:.2f}s supports {clf.num_valid}')

    k2 = jax.random.split(key)[0]
    qt = robot.rand_configs(2000, k2)
    st = np.asarray(dist_est(qt))
    dt = np.asarray(gt_signed(qt))
    acc = float(((st > 0) == (dt > 0)).mean())
    corr = float(np.corrcoef(st, dt)[0, 1])
    print(f'proxy: acc={acc:.3f} corr={corr:.3f}')

    free = np.where(dt <= -0.1)[0]
    start, target = qt[free[0]], qt[free[-1]]
    options = {'N_WAYPOINTS': args.waypoints, 'NUM_RE_TRIALS': 8,
               'MAXITER': args.maxiter, 'history': False,
               'safety_margin': args.safety_bias, 'max_speed': 2.0,
               'seed': args.seed, 'dense_sub': 4}
    rec = optim.adam_traj_optimize(robot, dist_est, start, target, options)
    sol = jnp.asarray(rec['solution'], jnp.float32)
    gt_valid = not bool(jnp.any(gt_signed(utils.dense_path(sol, 8)) > 0))
    print(f"trajopt: success={rec['success']} cost={rec['cost']:.3f} "
          f"time={rec['time']:.3f}s GT-valid={gt_valid}")
    if args.output:
        json.dump({'acc': acc, 'corr': corr, 'rec': rec,
                   'gt_valid': gt_valid}, open(args.output, 'w'), indent=1)


if __name__ == '__main__':
    main()
