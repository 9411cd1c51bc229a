"""High-level collision-checker API.

Functional parity targets (reference:
/root/reference/diffco/collision_checkers.py):
  CollisionChecker (:28), RBFDiffCo (:127) [fit :163, update :220, verify
  :254, collision_score :295], ForwardKinematicsDiffCo (:318)
  [tensorized fkine :374-394, collision_score :475,
  _calculate_safety_bias :497], HybridForwardKinematicsDiffCo (:511),
  OptimisticChecker (:550).

These wire a robot + environment + ground-truth checker + kernel
perceptron together: dataset generation, fit/verify/update with the
safety-bias rule, and the jit-compiled ``collision_score`` used by the
trajectory optimizers. Ground truth runs batched on device (the geometric
engine in diffco_tpu.geometry) instead of per-config FCL host loops.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from . import kernels as kernel
from .perceptron import DiffCo
from .envs.shape_env import ShapeEnv
from .robots.urdf import URDFRobot


class CollisionChecker:
    """Base: resolves robot/environment arguments and the ground-truth
    check function (ref collision_checkers.py:39-125)."""

    def __init__(self, robot=None, robot_base_transform=None,
                 environment=None, robot_topic=None,
                 planning_scene_topic=None, gt_check_func=None,
                 device=None, seed: int = 0, mesh=None):
        """``mesh`` (a jax.sharding.Mesh) scales the checker out over
        devices: ground-truth labeling, training, verification sweeps and
        safety-bias estimation shard their batch dimensions over the
        mesh's first axis (SURVEY §2.3 — new TPU design surface; the
        reference is single-device)."""
        del device
        self.mesh = mesh
        if isinstance(robot, str):
            if os.path.isfile(robot):
                assert robot_topic is None
                name = os.path.basename(robot).split('.')[0]
                robot = URDFRobot(robot, name=name,
                                  base_transform=robot_base_transform)
            else:
                raise ValueError('Invalid robot URDF file path')
        if robot_topic is not None:
            from .ros_interface import ROSRobotEnv
            robot = ROSRobotEnv(robot_topic=robot_topic,
                                planning_scene_topic=planning_scene_topic)
        self.robot = robot
        if environment is not None and isinstance(environment, Dict):
            environment = ShapeEnv(environment)
        self.environment = environment

        if gt_check_func is None:
            if environment is not None:
                self.gt_check_func = partial(self.robot.collision,
                                             other=self.environment)
            else:
                self.gt_check_func = self.robot.collision
        else:
            self.gt_check_func = gt_check_func
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _next_rng(self) -> np.random.Generator:
        """Host-side RNG derived from the checker's key stream. The
        active-update path assembles its (value-dependent-size) batches in
        numpy: every jnp op whose shape depends on the support count would
        recompile each update — ~1-2 s per tiny program over a remote TPU
        backend, which dominated the measured steady-state update latency.
        Seeded from ALL key words (a single word discards half the key's
        entropy and raises the chance of repeated host streams over many
        active-learning updates)."""
        words = np.asarray(jax.random.key_data(self._next_key()),
                           np.uint32).reshape(-1)
        return np.random.default_rng([int(w) for w in words])

    def _pad_shard(self, q):
        """Pad the leading dim to a device multiple and shard it over the
        mesh's data axis. Returns (sharded q, true batch size)."""
        from .parallel.sharding import (_pad_to_multiple, shard_batch,
                                        data_axis)
        ax = data_axis(self.mesh)
        qp, B = _pad_to_multiple(jnp.asarray(q), self.mesh.shape[ax])
        return shard_batch(qp, self.mesh, ax), B

    def _gt_labels(self, q):
        """Ground-truth sweep; dp-sharded over the mesh when one is set
        (the TPU replacement for the reference's host-side per-config FCL
        loop, urdf_interface.py:450-513)."""
        if self.mesh is None:
            return self.gt_check_func(q)
        qp, B = self._pad_shard(q)
        return jnp.asarray(self.gt_check_func(qp))[:B]

    def collision(self, q):
        return self._gt_labels(q)

    def fkine(self, q, return_collision=False, **kwargs):
        return self.robot.compute_forward_kinematics_all_links(
            q, return_collision=return_collision, **kwargs)

    def normalizer(self, unnormalized_q):
        raise NotImplementedError

    def unnormalizer(self, normalized_q):
        raise NotImplementedError

    def _generate_dataset(self, q, labels, dists, num_samples,
                          fix_joints=None, fix_joint_values=None,
                          sample_transform=None, verbose=False):
        """Random configs + ground-truth labels
        (ref collision_checkers.py:108-125). ``sample_transform`` draws
        the configurations uniformly on that transform's manifold via
        Jacobian-determinant rejection (ref :396-452) instead of uniformly
        in joint space."""
        if q is None:
            if sample_transform is not None:
                from .sampler import uniform_sample_on_transformed_manifold
                q = uniform_sample_on_transformed_manifold(
                    self.robot, sample_transform, num_samples,
                    self._next_key())
            else:
                q = self.robot.rand_configs(num_samples, self._next_key())
        q = jnp.asarray(q)
        if fix_joints is not None:
            q = q.at[:, jnp.asarray(fix_joints)].set(
                jnp.asarray(fix_joint_values, q.dtype))
        num_samples = q.shape[0]
        if labels is None:
            if verbose:
                print('Generating labels...')
                t0 = time.time()
            labels = self._gt_labels(q)
            labels = jnp.asarray(labels).astype(q.dtype)
            if verbose:
                print(f'Labels generated in {time.time() - t0:.2f}s')
        else:
            labels = (jnp.asarray(labels) > 0).astype(q.dtype)
        if dists is None:
            dists = jnp.zeros(num_samples, q.dtype)
        return q, labels, dists


class RBFDiffCo(CollisionChecker):
    """Vanilla DiffCo over raw configurations (no FK transform).

    Ref: collision_checkers.py:127-315.
    """

    def __init__(self, robot=None, robot_base_transform=None,
                 environment=None, robot_topic=None,
                 planning_scene_topic=None, gt_check_func=None, device=None,
                 kernel_func=None, perceptron_class=DiffCo, seed: int = 0,
                 mesh=None, **perceptron_kwargs):
        super().__init__(robot=robot,
                         robot_base_transform=robot_base_transform,
                         environment=environment, robot_topic=robot_topic,
                         planning_scene_topic=planning_scene_topic,
                         gt_check_func=gt_check_func, seed=seed, mesh=mesh)
        if kernel_func is None:
            self.kernel_func = kernel.RQKernel(
                perceptron_kwargs.pop('gamma', 10))
        else:
            self.kernel_func = kernel_func
        self.perceptron = perceptron_class(kernel_func=self.kernel_func,
                                           mesh=mesh, **perceptron_kwargs)
        self.q_verify = None
        self.labels_verify = None
        self.safety_bias = 0.0
        self.perceptron_trained = False
        self._score_fn = None
        self._mesh_sweep_fn = None

    # -- fitting ------------------------------------------------------------

    def fit(self, q=None, labels=None, dists=None, update=False,
            exist_mask=None, num_samples=5000, verify_ratio=0.1,
            verbose=False, **get_dataset_kwargs):
        """Train (or warm-update) the proxy and optionally verify on a
        held-out split (ref collision_checkers.py:163-218)."""
        get_dataset_kwargs.setdefault('verbose', not self.perceptron_trained)
        q, labels, dists = self._generate_dataset(
            q, labels, dists, num_samples, **get_dataset_kwargs)
        num_samples = q.shape[0]
        labels = (2 * labels - 1).astype(q.dtype)

        if 0 < verify_ratio < 1:
            # split on the HOST: the permutation/nonzero/gather sizes all
            # depend on the support count and would recompile per update
            rng = self._next_rng()
            # at least one held-out row: tiny num_samples would otherwise
            # produce an EMPTY verify set and crash the safety-bias
            # zero-size min() reduction
            num_verify = max(1, int(verify_ratio * num_samples))
            if update and exist_mask is not None:
                # existing supports must all stay in the training split —
                # the warm start seeds their gains positionally. Draw the
                # verify set from non-support rows with an EXACT count so
                # the training shape is identical across updates (a varying
                # shape would recompile the training program every step).
                non_exist = np.where(~np.asarray(exist_mask))[0]
                num_verify = min(num_verify, len(non_exist))
                verify_idx = non_exist[
                    rng.permutation(len(non_exist))[:num_verify]]
            else:
                verify_idx = rng.permutation(num_samples)[:num_verify]
            verify_mask = np.zeros(num_samples, bool)
            verify_mask[verify_idx] = True
            q_np = np.asarray(q)
            labels_np = np.asarray(labels)
            dists_np = np.asarray(dists)
            q_train = jnp.asarray(q_np[~verify_mask])
            q_verify = jnp.asarray(q_np[verify_mask])
            labels_train = jnp.asarray(labels_np[~verify_mask])
            labels_verify = jnp.asarray(labels_np[verify_mask])
            dists_train = jnp.asarray(dists_np[~verify_mask])
            if update and exist_mask is not None:
                exist_mask = np.asarray(exist_mask)[~verify_mask]
        elif verify_ratio:
            raise ValueError(
                f'verify_ratio should be in (0, 1), got {verify_ratio}')
        else:
            q_train, labels_train, dists_train = q, labels, dists
            q_verify = self.robot.rand_configs(100, self._next_key())
            labels_verify = None

        # the reference caps training at N iterations
        # (collision_checkers.py:205); the greedy loop often needs ~2N to
        # converge at N >= 5000, and on TPU iterations are cheap — use 3N
        self.perceptron.train(
            q_train, labels_train, update=update, exist_mask=exist_mask,
            max_iteration=3 * q_train.shape[0], distance=dists_train,
            verbose=verbose)
        inference_kernel_func = kernel.Polyharmonic(k=1, epsilon=1)
        self.perceptron.fit_poly(kernel_func=inference_kernel_func,
                                 target='label')
        # The jitted score programs take the trained state as ARGUMENTS
        # (score_fn / _mesh_sweep_scores), so refits and active-learning
        # updates reuse the compiled programs (pad-size hysteresis keeps
        # shapes stable). Invalidate only when the inference kernel's
        # parameters changed — a stale trace would bake in the old kernel.
        kkey = (type(inference_kernel_func),
                tuple(sorted(inference_kernel_func.__dict__.items())))
        if getattr(self, '_score_kernel_key', None) != kkey:
            self._score_fn = None
            self._mesh_sweep_fn = None
            self._score_kernel_key = kkey

        self.safety_bias = self._calculate_safety_bias(q_verify)
        if verify_ratio:
            verify_acc, verify_tpr, verify_tnr = self.verify(
                q_verify, labels_verify, verbose=verbose)
            self.q_verify = q_verify
        else:
            verify_acc = verify_tpr = verify_tnr = None
        self.perceptron_trained = True
        return verify_acc, verify_tpr, verify_tnr

    def update(self, q=None, labels=None, dists=None, exploit_std=0.3,
               num_samples=100, num_exploit_samples=None,
               num_explore_samples=None, verify=False, verbose=False,
               exploit_paths=None, path_band_scales=(0.05, 0.15, 0.35),
               path_num_sub=8):
        """Active-learning update (ref collision_checkers.py:220-252):
        exploit samples around current supports + uniform explore samples
        + the supports themselves.

        ``exploit_paths`` — list of [N_i, dof] waypoint paths — switches
        the exploit set to GT-labeled bands around those paths instead of
        around the supports (path-targeted active learning: densify the
        paths, jitter at multiple scales, label with the ground truth,
        warm-retrain). This is the corridor retraining that closed
        7d_narrow records in the speed_compare harness (RESULTS.md
        corridor-AL study), promoted to the product API: feed it the
        failed trajectory and/or a planner path through the region the
        proxy mislabels, then re-run the optimizer on the updated proxy."""
        n_exploit = (num_samples if num_exploit_samples is None
                     else num_exploit_samples)
        n_explore = (num_samples if num_explore_samples is None
                     else num_explore_samples)
        # the reference forwards the bool straight into fit(verify_ratio=)
        # which rejects it (collision_checkers.py:248-252 / :179) — map
        # verify=True to the default held-out ratio instead
        verify_ratio = 0.1 if verify is True else float(verify)
        exist_mask = None
        if q is None:
            # All assembly here runs in HOST numpy: every intermediate's
            # shape depends on the (changing) support count, and on-device
            # versions recompiled ~10 tiny programs per update — measured
            # at ~2/3 of the 20 s steady-state update latency.
            rng = self._next_rng()
            nv = self.perceptron.num_valid
            if nv == 0:
                raise RuntimeError(
                    'update() needs a trained checker (no supports yet) — '
                    'call fit() first')
            supports = np.asarray(self.perceptron.support_points[:nv])
            dof = supports.shape[-1]
            lims = np.asarray(self.robot.joint_limits)
            if exploit_paths is not None:
                from .sampler import path_band_samples
                exploit = path_band_samples(
                    exploit_paths, lims, rng, n_total=n_exploit,
                    num_sub=path_num_sub, scales=path_band_scales)
            else:
                if n_exploit > nv:
                    reps = -(-n_exploit // nv)
                    centers = np.tile(supports, (reps, 1))[:n_exploit]
                else:
                    centers = supports[rng.permutation(nv)[:n_exploit]]
                exploit = np.clip(
                    centers + rng.normal(size=centers.shape) * exploit_std,
                    lims[:, 0], lims[:, 1])
            # bucket the total to a multiple of 256 by drawing extra explore
            # samples: the support count changes every update, and a fresh
            # dataset shape would force the TPU to recompile the training
            # program each step (~1 min) — padding with more uniform samples
            # is free and keeps shapes stable across updates. Bucket on the
            # PADDED support size (stable under pad hysteresis), not the
            # live count: nv crossing a bucket boundary (e.g. 168 at
            # 600 + nv) otherwise flips the dataset shape mid-run — a
            # measured ~57 s recompile spike of the eager labeling chain
            base_total = exploit.shape[0] + n_explore + nv
            s_pad = self.perceptron.support_points.shape[0]
            bucket = -(-(exploit.shape[0] + n_explore + s_pad) // 256) * 256
            n_explore_padded = n_explore + (bucket - base_total)
            explore = rng.uniform(lims[:, 0], lims[:, 1],
                                  (n_explore_padded, dof))
            q = jnp.asarray(np.concatenate(
                [exploit, explore, supports], axis=0), jnp.float32)
            exist_mask = np.zeros(q.shape[0], bool)
            exist_mask[-nv:] = True
        return self.fit(q, labels, dists, update=True,
                        exist_mask=exist_mask, verify_ratio=verify_ratio,
                        verbose=verbose)

    # -- verification ---------------------------------------------------------

    def verify(self, q_verify=None, labels_verify=None, num_samples=None,
               verbose=False):
        """ACC/TPR/TNR with the safety bias (ref :254-290). Returns the
        *biased* metrics (what the reference returns last)."""
        if q_verify is None:
            if num_samples is not None:
                q_verify = self.robot.rand_configs(num_samples,
                                                   self._next_key())
                self.q_verify = q_verify
            elif self.q_verify is not None:
                q_verify = self.q_verify
            else:
                raise ValueError('q_verify or num_samples required')
        scores = self._sweep_scores(q_verify)
        preds = 2 * (scores > 0) - 1
        biased_preds = 2 * (scores + self.safety_bias > 0) - 1

        if labels_verify is None:
            labels_verify = self._gt_labels(q_verify)
            labels_verify = (2 * jnp.asarray(labels_verify).astype(
                jnp.float32) - 1)
        labels_verify = jnp.asarray(labels_verify).reshape(-1)

        def metrics(p):
            n_pos = jnp.sum(labels_verify == 1)
            n_neg = jnp.sum(labels_verify == -1)
            acc = jnp.mean((p == labels_verify).astype(jnp.float32))
            tpr = jnp.sum((p == 1) & (labels_verify == 1)) / jnp.maximum(
                n_pos, 1)
            tnr = jnp.sum((p == -1) & (labels_verify == -1)) / jnp.maximum(
                n_neg, 1)
            return acc, tpr, tnr

        acc, tpr, tnr = metrics(preds)
        if verbose:
            print(f'Test acc: {acc:.4f}, TPR {tpr:.4f}, TNR {tnr:.4f}')
        bacc, btpr, btnr = metrics(biased_preds)
        if verbose:
            print(f'Biased Test acc: {bacc:.4f}, TPR {btpr:.4f}, '
                  f'TNR {btnr:.4f}')
        return (float(bacc), float(btpr), float(btnr))

    # -- inference ------------------------------------------------------------

    def collision(self, q):
        return self.collision_score(q).reshape(-1) > 0

    def collision_score(self, q, bias=None):
        """Biased smooth score, any leading batch shape (ref :295-303).
        With a mesh set the flat batch is dp-sharded through the same
        shard_map sweep as verify/safety-bias, so large inference batches
        scale across chips instead of running on one device."""
        bias = self.safety_bias if bias is None else bias
        q = jnp.asarray(q)
        shape_q = q.shape
        raw = self._sweep_raw(q.reshape(-1, shape_q[-1]))   # [B, C]
        raw = raw.reshape(shape_q[:-1] + raw.shape[1:])
        return raw + bias

    def score_fn(self, bias=None):
        """A jitted score function q[B, dof] -> [B] for the trajectory
        optimizers. The compiled program is cached on the checker and takes
        the support state as *arguments*, so refits reuse the compilation
        (``fit`` resets the cache only when the kernel/transform may have
        changed)."""
        bias = self.safety_bias if bias is None else bias
        perceptron = self.perceptron
        if self._score_fn is None:
            rbf_kernel = perceptron.rbf_kernel
            transform = perceptron._apply_transform

            @jax.jit
            def fn(q, sup, nodes, mask, b):
                pt = transform(q)
                kv = rbf_kernel(pt, sup) * mask.astype(pt.dtype)[None, :]
                return jnp.matmul(kv, nodes.reshape(-1, 1),
                                  precision='highest').reshape(-1) + b

            self._score_fn = fn
        fn = self._score_fn
        b = jnp.asarray(bias, jnp.float32)
        return lambda q: fn(q, perceptron.support_transformed,
                            perceptron.rbf_nodes, perceptron.valid_mask, b)

    def _sweep_raw(self, q):
        """Proxy-score sweep over a [B, dof] batch -> [B, C] (C=1 for
        scalar perceptrons); dp-sharded over the mesh when one is set
        (padded rows are computed then sliced off, so reductions over the
        result see only real rows). Multi-output perceptrons shard the
        same way — each device scores its local rows and keeps the class
        axis, so classes never interleave across shards."""
        if self.mesh is None:
            s = self.perceptron.poly_score(q)
            return s.reshape(s.shape[0], -1)
        qp, B = self._pad_shard(q)
        return self._mesh_sweep_scores(qp)[:B]

    def _sweep_scores(self, q):
        """Flat [B * C] view of ``_sweep_raw`` (what verify/bias use)."""
        return self._sweep_raw(q).reshape(-1)

    def _mesh_sweep_scores(self, qp):
        """poly_score under ``shard_map`` over the mesh's data axis.

        DiffCo.poly_score routes into fused Pallas kernels at large batch
        on TPU (ops/fk_score.py, ops/fused_score.py); ``pallas_call`` has
        no GSPMD partitioning rule, so feeding it a dp-sharded GLOBAL
        array would error (or silently replicate). shard_map makes each
        device score its LOCAL rows as an ordinary single-device program
        — poly_score's fused-batch gate then applies to the per-device
        shard size. The trained state travels as explicit replicated
        operands (rebound at trace time) so refits reuse the compile,
        mirroring ``score_fn``'s cache contract."""
        perc = self.perceptron
        if self._mesh_sweep_fn is None:
            from jax.sharding import PartitionSpec
            from .parallel.sharding import data_axis
            ax = data_axis(self.mesh)

            def body(q_local, sup, nodes, mask):
                saved = (perc.support_transformed, perc.rbf_nodes,
                         perc.valid_mask)
                try:
                    perc.support_transformed = sup
                    perc.rbf_nodes = nodes
                    perc.valid_mask = mask
                    s = perc.poly_score(q_local)
                    return s.reshape(s.shape[0], -1)   # keep the class axis
                finally:
                    (perc.support_transformed, perc.rbf_nodes,
                     perc.valid_mask) = saved

            self._mesh_sweep_fn = jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(PartitionSpec(ax), PartitionSpec(),
                          PartitionSpec(), PartitionSpec()),
                out_specs=PartitionSpec(ax)))
        return self._mesh_sweep_fn(qp, perc.support_transformed,
                                   perc.rbf_nodes, perc.valid_mask)

    def _calculate_safety_bias(self, q_verify):
        """min(|min score|, |max score|) / 3 (ref :497-503)."""
        if q_verify.shape[0] == 0:
            # an empty held-out split (all rows were existing supports)
            # must not crash the zero-size min() — bias off fresh samples
            q_verify = self.robot.rand_configs(100, self._next_key())
        scores = self._sweep_scores(q_verify)
        min_polar = jnp.minimum(jnp.abs(scores.min()), jnp.abs(scores.max()))
        return float(min_polar / 3)

    def normalizer(self, unnormalized_q):
        lims = self.robot.joint_limits
        return (unnormalized_q - lims[:, 0]) / (lims[:, 1] - lims[:, 0])

    def unnormalizer(self, normalized_q):
        lims = self.robot.joint_limits
        return normalized_q * (lims[:, 1] - lims[:, 0]) + lims[:, 0]


def corridor_update(base_dataset, paths, limits, gt_dist_fn, retrain, rng,
                    n_total=2048, num_sub=8, scales=(0.05, 0.15, 0.35)):
    """Path-targeted active learning for bare-perceptron flows.

    The functional twin of ``RBFDiffCo.update(exploit_paths=...)`` for
    code that holds a raw ``DiffCo`` perceptron + its training dataset
    rather than a checker object (e.g. benchmark harnesses): draw banded
    samples around ``paths`` (sampler.path_band_samples), label them with
    the exact geometry's signed distance ``gt_dist_fn`` (positive =
    collision, the library convention), widen the dataset, and rebuild
    the proxy via the caller's ``retrain(cfgs, labels, dists)`` closure —
    full retrain because a bare perceptron carries no warm-start
    bookkeeping.

    base_dataset: (cfgs, labels, dists) numpy arrays.
    Returns (new_checker, samples, signed_dists).
    """
    from .sampler import path_band_samples
    cfgs, labels, dists = base_dataset
    samples = path_band_samples(paths, limits, rng, n_total=n_total,
                                num_sub=num_sub, scales=scales)
    sd = np.asarray(gt_dist_fn(jnp.asarray(samples)))
    new_cfgs = np.concatenate([cfgs, samples], axis=0)
    new_labels = np.concatenate([labels, (sd > 0) * 2.0 - 1.0], axis=0)
    new_dists = np.concatenate([dists, sd], axis=0)
    return retrain(new_cfgs, new_labels, new_dists), samples, sd


class ForwardKinematicsDiffCo(RBFDiffCo):
    """DiffCo with the FK transform into workspace control points —
    recommended for manipulators (ref collision_checkers.py:318-509)."""

    def __init__(self, robot=None, robot_base_transform=None,
                 environment=None, robot_topic=None,
                 planning_scene_topic=None, gt_check_func=None, device=None,
                 perceptron_class=DiffCo, seed: int = 0, mesh=None,
                 **perceptron_kwargs):
        CollisionChecker.__init__(
            self, robot=robot, robot_base_transform=robot_base_transform,
            environment=environment, robot_topic=robot_topic,
            planning_scene_topic=planning_scene_topic,
            gt_check_func=gt_check_func, seed=seed, mesh=mesh)
        self.tensorized_fkine = self.robot.fkine
        if hasattr(self.robot, 'unique_position_link_names'):
            self.unique_position_link_names = \
                self.robot.unique_position_link_names
        self.kernel_func = kernel.RQKernel(
            perceptron_kwargs.pop('gamma', 10))
        self.kernel_transform = self.tensorized_fkine
        self.perceptron = perceptron_class(
            kernel_func=self.kernel_func, transform=self.kernel_transform,
            mesh=mesh, **perceptron_kwargs)
        self.q_verify = None
        self.labels_verify = None
        self.safety_bias = 0.0
        self.perceptron_trained = False
        self._score_fn = None
        self._mesh_sweep_fn = None

    def _uniform_sample_on_transformed_manifold(self, transform,
                                                num_samples):
        """Configurations uniform w.r.t. the FK-manifold measure
        (ref collision_checkers.py:396-452)."""
        from .sampler import uniform_sample_on_transformed_manifold
        return uniform_sample_on_transformed_manifold(
            self.robot, transform, num_samples, self._next_key())

    def collision_score(self, q=None, bias=None, q_link_pos=None):
        """Score from configurations or directly from link positions
        (ref :475-495). The configuration path delegates to the base
        class so a checker built with ``mesh=`` keeps its dp-sharded
        sweep — this override only adds the link-position entry point."""
        if q is not None:
            return super().collision_score(q, bias=bias)
        bias = self.safety_bias if bias is None else bias
        if q_link_pos is not None:
            p = jnp.asarray(q_link_pos)
            raw = self.perceptron.poly_score(
                transformed_point=p.reshape((-1,) + p.shape[-2:]))
            raw = raw.reshape(p.shape[:-2] + raw.shape[1:])
        else:
            raise ValueError('q or q_link_pos required')
        return raw + bias


class HybridForwardKinematicsDiffCo(ForwardKinematicsDiffCo):
    """Proxy labels re-checked with ground truth in the uncertain band
    (ref collision_checkers.py:511-548). The reference recomputes only
    uncertain rows on the host; a batched where-select keeps everything
    on device."""

    def __init__(self, *args, lazy_line_check=False, **kwargs):
        super().__init__(*args, **kwargs)
        self.lazy_line_check = lazy_line_check

    def collision(self, q):
        q = jnp.atleast_2d(jnp.asarray(q))
        unbias = self.collision_score(q, bias=0).reshape(-1)
        labels = unbias + self.safety_bias > 0
        if self.lazy_line_check:
            # check only the most suspicious configuration exactly
            max_i = jnp.argmax(unbias)
            gt = jnp.asarray(self.gt_check_func(q[max_i][None])).reshape(())
            labels = labels.at[max_i].set(gt)
        else:
            uncertain = jnp.logical_and(unbias + self.safety_bias > 0,
                                        unbias - self.safety_bias < 0)
            # _gt_labels keeps the exact-geometry recheck dp-sharded when
            # a mesh is set (it is the expensive part this class amortizes)
            gt = jnp.asarray(self._gt_labels(q)).reshape(-1)
            labels = jnp.where(uncertain, gt, labels)
        return labels


class OptimisticChecker(HybridForwardKinematicsDiffCo):
    """Ref OptimisticBaxterChecker (collision_checkers.py:550-561):
    optimistic mode treats only scores above the safety bias as
    collisions."""

    def in_collision(self, states, optimistic=False):
        states = jnp.atleast_2d(jnp.asarray(states))
        if optimistic:
            scores = self.collision_score(states, bias=0).reshape(-1)
            return bool(scores.max() - self.safety_bias > 0)
        return bool(jnp.any(self.collision(states)))
