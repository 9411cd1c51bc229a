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


def _bucket_rows(n: int, floor: int = 64) -> int:
    """Next power-of-two row count >= n. Device calls from the planners
    pad their batches to these buckets: tree sizes change every round, and
    an un-bucketed call hands the jitted collision/score function a fresh
    shape per round — on TPU that is a recompile (~1 min) per shape, which
    would dwarf the batching win (CLAUDE.md fixed-shape invariant)."""
    b = floor
    while b < n:
        b *= 2
    return b


def _pad_rows(flat: np.ndarray, m: int) -> np.ndarray:
    if m <= len(flat):
        return flat
    # repeat a REAL row: padded rows must be in-domain for the checker
    return np.concatenate(
        [flat, np.repeat(flat[-1:], m - len(flat), axis=0)], axis=0)


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

    def _sample(self) -> np.ndarray:
        u = self.rng.rand(self.limits.shape[0])
        return self.limits[:, 0] + u * (self.limits[:, 1] - self.limits[:, 0])

    def _collision_batch(self, flat: np.ndarray) -> np.ndarray:
        """collision_fn on [N, dof] rows, padded to a power-of-two bucket
        so the jitted checker sees a bounded set of shapes across rounds
        (cnt_check counts only the real rows)."""
        n = len(flat)
        self.cnt_check += n
        padded = _pad_rows(flat, _bucket_rows(n))
        hits = np.asarray(self.collision_fn(
            jnp.asarray(padded, jnp.float32)))
        return hits.reshape(-1)[:n]

    def _motions_valid_batch(self, starts: np.ndarray, ends: np.ndarray,
                             n_check: Optional[int] = None) -> np.ndarray:
        """Validate K motions in ONE device call — the TPU-native batching
        the reference's per-edge OMPL/FCL checks cannot do. ``n_check``
        overrides the per-motion densification count (the cross-tree
        connection segments are longer than one step)."""
        n_check = self.check_resolution if n_check is None else n_check
        ts = np.linspace(0.0, 1.0, n_check)
        pts = starts[:, None, :] + ts[None, :, None] * (
            ends - starts)[:, None, :]
        flat = pts.reshape(-1, starts.shape[1])
        hits = self._collision_batch(flat).reshape(len(starts), -1)
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
            connected = self._motions_valid_batch(new_nodes, nodes_b[bi],
                                                  n_check=n_check)
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
        """Edge costs from each anchor to b, scores batched in one call
        (rows padded to power-of-two buckets — see _bucket_rows)."""
        lengths = np.linalg.norm(anchors - b[None], axis=1)
        if self.score_fn is None:
            return lengths
        mids = (anchors + b[None]) / 2
        padded = _pad_rows(mids, _bucket_rows(len(mids)))
        sc = np.asarray(self.score_fn(
            jnp.asarray(padded, jnp.float32))).reshape(-1)[:len(mids)]
        return lengths * (1.0 + self.score_weight * np.maximum(0.0, sc))

    def _motions_valid(self, anchors: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Validity of segments anchor_i -> b, all checked in ONE device
        call (the batching the reference's per-edge FCL loop cannot do)."""
        ts = np.linspace(0.0, 1.0, self.check_resolution)
        pts = anchors[:, None, :] + ts[None, :, None] * (
            b[None, None, :] - anchors[:, None, :])
        flat = pts.reshape(-1, anchors.shape[1])
        n = len(flat)
        self.cnt_check += n
        padded = _pad_rows(flat, _bucket_rows(n))
        hits = np.asarray(self.collision_fn(
            jnp.asarray(padded, jnp.float32)))
        hits = hits.reshape(-1)[:n].reshape(len(anchors), -1)
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
        # node index -> cost of its (validated) final edge to the goal;
        # the best goal node is chosen at the END so later rewires that
        # cheapen an early candidate's subtree still count
        goal_edges = {}

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
            # rewire (reuse the batched validity/costs: symmetric segments).
            # No cycle risk: edge costs are >= 0 so cost is non-decreasing
            # along any root path — an ancestor of idx_new can never satisfy
            # c_through < cost[j].
            for kk, j in enumerate(near):
                c_through = best_c + edge_c[kk]
                if valid[kk] and c_through < cost[j]:
                    parent[j] = idx_new
                    delta = cost[j] - c_through
                    cost[j] = c_through
                    # propagate the improvement to j's whole subtree —
                    # stale descendant costs would corrupt later parent
                    # selection and the final goal-candidate comparison
                    stack = [int(j)]
                    while stack:
                        p = stack.pop()
                        for ch in range(len(parent)):
                            if parent[ch] == p and ch != p:
                                cost[ch] -= delta
                                stack.append(ch)
            if np.linalg.norm(q_new - goal) < goal_tol:
                # record the FULL final-edge cost (ref rrt_star.py keeps
                # the distance to goal in the comparison — dropping it let
                # a node barely inside goal_tol beat a nearer, cheaper one)
                if self._motion_valid(q_new, goal):
                    goal_edges[idx_new] = float(
                        self._edge_costs(q_new[None], goal)[0])

        if not goal_edges:
            return None
        best_goal_node = min(goal_edges,
                             key=lambda j: cost[j] + goal_edges[j])
        path = [goal]
        idx = best_goal_node
        while idx >= 0:
            path.append(nodes[idx])
            idx = parent[idx]
        return np.asarray(path[::-1])
