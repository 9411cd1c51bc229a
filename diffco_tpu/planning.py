"""Sampling-based motion planners with batched proxy/exact checking.

Functional parity targets (reference: /root/reference/scripts/
motion_planner.py MotionPlanner :65-108 — an OMPL RRTConnect wrapper with a
custom validity function and densified output — and misc/rrt_star.py
RRT_STAR :23 with score-weighted edge costs).

OMPL is a host C++ library; instead of binding it, the planners here are
small host-side tree loops whose *collision checking is batched on
device*: every extension step validates whole candidate motions
(densified segments) in one call, which is where all the time goes in the
reference. They serve the same role (initial feasible paths for trajectory
optimization).
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


class MotionPlanner:
    """RRT-Connect over the configuration space (ref motion_planner.py).

    args:
      robot: provides joint limits (and ``wrap`` if angular).
      collision_fn: q [B, dof] -> bool [B] (True = in collision). Use the
        proxy checker for speed or the geometric ground truth for
        exactness.
    """

    def __init__(self, robot, collision_fn: Callable, step_size: float = 0.3,
                 check_resolution: int = 8, seed: int = 0):
        self.robot = robot
        self.collision_fn = collision_fn
        self.step_size = step_size
        self.check_resolution = check_resolution
        self.rng = np.random.RandomState(seed)
        self.limits = np.asarray(robot.limits)
        self.cnt_check = 0

    # -- helpers ------------------------------------------------------------

    def _motion_valid(self, a: np.ndarray, b: np.ndarray) -> bool:
        ts = np.linspace(0.0, 1.0, self.check_resolution)[:, None]
        pts = a[None] + ts * (b - a)[None]
        self.cnt_check += len(pts)
        hits = np.asarray(self.collision_fn(jnp.asarray(pts, jnp.float32)))
        return not bool(hits.any())

    def _sample(self) -> np.ndarray:
        u = self.rng.rand(self.limits.shape[0])
        return self.limits[:, 0] + u * (self.limits[:, 1] - self.limits[:, 0])

    @staticmethod
    def _nearest(nodes: np.ndarray, q: np.ndarray) -> int:
        return int(np.argmin(((nodes - q) ** 2).sum(1)))

    def _steer(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        d = np.linalg.norm(b - a)
        if d <= self.step_size:
            return b
        return a + (b - a) * self.step_size / d

    def _motions_valid_batch(self, starts: np.ndarray,
                             ends: np.ndarray) -> np.ndarray:
        """Validate K motions in ONE device call — the TPU-native batching
        the reference's per-edge OMPL/FCL checks cannot do."""
        ts = np.linspace(0.0, 1.0, self.check_resolution)
        pts = starts[:, None, :] + ts[None, :, None] * (
            ends - starts)[:, None, :]
        flat = pts.reshape(-1, starts.shape[1])
        self.cnt_check += len(flat)
        hits = np.asarray(self.collision_fn(
            jnp.asarray(flat, jnp.float32))).reshape(len(starts), -1)
        return ~hits.any(axis=1)

    # -- batched RRT-Connect ---------------------------------------------

    def plan(self, start, goal, max_iters: int = 2000,
             dense_output: bool = True, batch: int = 32
             ) -> Optional[np.ndarray]:
        """Returns a path [N, dof] or None.

        Grows both trees ``batch`` samples at a time: per round, K random
        targets are steered from their nearest nodes and ALL K candidate
        motions (plus K cross-tree connection attempts) are validated in
        two device calls. Output is densified like the reference's
        interpolated OMPL path (motion_planner.py:95-104).
        """
        start = np.asarray(start, np.float64)
        goal = np.asarray(goal, np.float64)
        self.cnt_check = 0
        trees = [{'nodes': [start], 'parent': [-1]},
                 {'nodes': [goal], 'parent': [-1]}]

        a, b = 0, 1
        rounds = max(1, max_iters // batch)
        for _ in range(rounds):
            # --- batched extension of tree a --------------------------------
            targets = np.stack([self._sample() for _ in range(batch)])
            nodes_a = np.asarray(trees[a]['nodes'])
            d2 = ((nodes_a[None, :, :] - targets[:, None, :]) ** 2).sum(-1)
            ni = d2.argmin(axis=1)                      # [K]
            anchors = nodes_a[ni]
            delta = targets - anchors
            dist = np.linalg.norm(delta, axis=1, keepdims=True)
            scale = np.minimum(1.0, self.step_size / np.maximum(dist, 1e-12))
            q_new = anchors + delta * scale
            valid = self._motions_valid_batch(anchors, q_new)
            added_idx = []
            for k in np.where(valid)[0]:
                trees[a]['nodes'].append(q_new[k])
                trees[a]['parent'].append(int(ni[k]))
                added_idx.append(len(trees[a]['nodes']) - 1)
            if not added_idx:
                a, b = b, a
                continue

            # --- batched cross-tree connection attempts ---------------------
            new_nodes = np.asarray([trees[a]['nodes'][i]
                                    for i in added_idx])
            nodes_b = np.asarray(trees[b]['nodes'])
            d2b = ((nodes_b[None, :, :]
                    - new_nodes[:, None, :]) ** 2).sum(-1)
            bi = d2b.argmin(axis=1)
            # densify the full connection segment proportionally to length
            seg_len = np.sqrt(d2b[np.arange(len(bi)), bi])
            max_len = float(seg_len.max())
            n_check = max(self.check_resolution,
                          int(np.ceil(max_len / self.step_size))
                          * self.check_resolution)
            ts = np.linspace(0.0, 1.0, n_check)
            pts = new_nodes[:, None, :] + ts[None, :, None] * (
                nodes_b[bi] - new_nodes)[:, None, :]
            flat = pts.reshape(-1, new_nodes.shape[1])
            self.cnt_check += len(flat)
            hits = np.asarray(self.collision_fn(
                jnp.asarray(flat, jnp.float32))).reshape(len(new_nodes), -1)
            connected = ~hits.any(axis=1)
            if connected.any():
                k = int(np.where(connected)[0][0])
                path_a = self._trace(trees[a], added_idx[k])
                path_b = self._trace(trees[b], int(bi[k]))
                if a == 0:
                    path = path_a[::-1] + path_b
                else:
                    path = path_b[::-1] + path_a
                path = np.asarray(path)
                if dense_output:
                    path = self._densify(path)
                return path
            a, b = b, a
        return None

    @staticmethod
    def _trace(tree, idx) -> List[np.ndarray]:
        out = []
        while idx >= 0:
            out.append(tree['nodes'][idx])
            idx = tree['parent'][idx]
        return out

    def _densify(self, path: np.ndarray) -> np.ndarray:
        out = [path[0]]
        for i in range(len(path) - 1):
            seg = np.linalg.norm(path[i + 1] - path[i])
            n = max(1, int(math.ceil(seg / (self.step_size / 2))))
            for k in range(1, n + 1):
                out.append(path[i] + (path[i + 1] - path[i]) * k / n)
        return np.asarray(out)


class RRTStar:
    """RRT* with optional proxy-score-weighted edge costs
    (ref misc/rrt_star.py:23-244: edge cost = length * (1 + w * max(0,
    score)))."""

    def __init__(self, robot, collision_fn: Callable,
                 score_fn: Optional[Callable] = None,
                 step_size: float = 0.3, radius: float = 0.6,
                 score_weight: float = 1.0, check_resolution: int = 8,
                 seed: int = 0):
        self.robot = robot
        self.collision_fn = collision_fn
        self.score_fn = score_fn
        self.step_size = step_size
        self.radius = radius
        self.score_weight = score_weight
        self.check_resolution = check_resolution
        self.rng = np.random.RandomState(seed)
        self.limits = np.asarray(robot.limits)
        self.cnt_check = 0

    def _edge_costs(self, anchors: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Edge costs from each anchor to b, scores batched in one call."""
        lengths = np.linalg.norm(anchors - b[None], axis=1)
        if self.score_fn is None:
            return lengths
        mids = jnp.asarray((anchors + b[None]) / 2, jnp.float32)
        sc = np.asarray(self.score_fn(mids)).reshape(-1)
        return lengths * (1.0 + self.score_weight * np.maximum(0.0, sc))

    def _motions_valid(self, anchors: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Validity of segments anchor_i -> b, all checked in ONE device
        call (the batching the reference's per-edge FCL loop cannot do)."""
        ts = np.linspace(0.0, 1.0, self.check_resolution)
        pts = anchors[:, None, :] + ts[None, :, None] * (
            b[None, None, :] - anchors[:, None, :])
        flat = pts.reshape(-1, anchors.shape[1])
        self.cnt_check += len(flat)
        hits = np.asarray(self.collision_fn(
            jnp.asarray(flat, jnp.float32))).reshape(len(anchors), -1)
        return ~hits.any(axis=1)

    def _motion_valid(self, a, b) -> bool:
        return bool(self._motions_valid(a[None], np.asarray(b))[0])

    def plan(self, start, goal, max_iters: int = 1000,
             goal_tol: float = 0.3):
        start = np.asarray(start, np.float64)
        goal = np.asarray(goal, np.float64)
        nodes = [start]
        parent = [-1]
        cost = [0.0]
        best_goal_node, best_goal_cost = -1, np.inf

        for it in range(max_iters):
            q_rand = goal if self.rng.rand() < 0.1 else (
                self.limits[:, 0] + self.rng.rand(len(self.limits))
                * (self.limits[:, 1] - self.limits[:, 0]))
            arr = np.asarray(nodes)
            ni = int(np.argmin(((arr - q_rand) ** 2).sum(1)))
            d = np.linalg.norm(q_rand - arr[ni])
            q_new = q_rand if d <= self.step_size else (
                arr[ni] + (q_rand - arr[ni]) * self.step_size / d)
            if not self._motion_valid(arr[ni], q_new):
                continue
            # choose best parent within radius — batched costs + validity
            dists = np.linalg.norm(arr - q_new, axis=1)
            near = np.where(dists < self.radius)[0]
            if len(near) == 0:
                near = np.asarray([ni])
            edge_c = self._edge_costs(arr[near], q_new)
            valid = self._motions_valid(arr[near], q_new)
            cand_c = np.asarray([cost[j] for j in near]) + edge_c
            cand_c = np.where(valid, cand_c, np.inf)
            if not np.isfinite(cand_c).any():
                continue
            k = int(np.argmin(cand_c))
            best_p, best_c = int(near[k]), float(cand_c[k])
            nodes.append(q_new)
            parent.append(best_p)
            cost.append(best_c)
            idx_new = len(nodes) - 1
            # rewire (reuse the batched validity/costs: symmetric segments)
            for kk, j in enumerate(near):
                c_through = best_c + edge_c[kk]
                if valid[kk] and c_through < cost[j]:
                    parent[j] = idx_new
                    cost[j] = c_through
            if (np.linalg.norm(q_new - goal) < goal_tol
                    and best_c < best_goal_cost
                    and self._motion_valid(q_new, goal)):
                best_goal_node, best_goal_cost = idx_new, best_c

        if best_goal_node < 0:
            return None
        path = [goal]
        idx = best_goal_node
        while idx >= 0:
            path.append(nodes[idx])
            idx = parent[idx]
        return np.asarray(path[::-1])
