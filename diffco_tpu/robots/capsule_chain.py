"""Capsule-chain collision model for analytic (DH) robots.

The reference's analytic robots have no self-contained 3D collision
geometry (their FCL polygons exist only for the 2D models,
model.py:50-73); for Baxter/Panda experiments it defers to MoveIt or
URDF meshes. Here any robot whose ``fkine`` returns a chain of control
points gets a differentiable collision model for free: each consecutive
control-point segment is covered by interpolated spheres (a capsule
approximation), queried against SceneArrays SDFs — batched on device.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.geometry3d import (spheres_vs_scene_signed_dist,
                                   SceneArrays)


def chain_sphere_centers(control_points: jnp.ndarray, per_seg: int,
                         include_base: bool = True,
                         base_origin=None) -> jnp.ndarray:
    """Interpolate sphere centers along consecutive control points.

    control_points: [B, M, 3] -> centers [B, (M'-1) * per_seg + 1, 3]
    where M' = M + 1 when include_base prepends the robot's base origin
    (``base_origin`` [3], default the world origin — pass the robot's
    base translation for robots with a base transform, else the first
    capsule sweeps a phantom link from (0,0,0) to the shoulder).
    """
    cp = control_points
    if include_base:
        if base_origin is None:
            base = jnp.zeros_like(cp[:, :1])
        else:
            base = jnp.broadcast_to(
                jnp.asarray(base_origin, cp.dtype).reshape(1, 1, 3),
                cp[:, :1].shape)
        cp = jnp.concatenate([base, cp], axis=1)
    fr = jnp.arange(per_seg, dtype=cp.dtype) / per_seg      # [per_seg]
    seg = cp[:, 1:] - cp[:, :-1]                             # [B, M-1, 3]
    pts = cp[:, :-1, None, :] + fr[None, None, :, None] * seg[:, :, None, :]
    pts = pts.reshape(cp.shape[0], -1, 3)
    return jnp.concatenate([pts, cp[:, -1:]], axis=1)


class CapsuleChainCollision:
    """Ground-truth collision checker for a control-point-chain robot vs a
    SceneArrays / ShapeEnv scene."""

    def __init__(self, robot, link_radius: float = 0.06, per_seg: int = 4,
                 include_base: bool = True, scene=None):
        self.robot = robot
        self.link_radius = float(link_radius)
        self.per_seg = int(per_seg)
        self.include_base = include_base
        # the base capsule anchors at the robot's base ORIGIN, not the
        # world origin — a based robot would otherwise sweep a phantom
        # link from (0,0,0) to its shoulder
        base = getattr(robot, 'base', None)
        self.base_origin = (None if base is None
                            else np.asarray(base)[:3, 3])
        # optional default scene for collision(q) with other=None
        self._scene = scene.scene if hasattr(scene, 'scene') else scene
        self._jit_cache = {}

    def sphere_centers(self, q) -> jnp.ndarray:
        cp = self.robot.fkine(q)
        return chain_sphere_centers(cp, self.per_seg, self.include_base,
                                    base_origin=self.base_origin)

    def signed_dist(self, q, scene: SceneArrays) -> jnp.ndarray:
        """Max signed distance over objects per config: [B] (>0 inside)."""
        scene = scene.scene if hasattr(scene, 'scene') else scene
        fn = self._jit_cache.get('sd')
        if fn is None:
            def _sd(qq, sc):
                centers = self.sphere_centers(qq)
                radii = jnp.full(centers.shape[1], self.link_radius,
                                 centers.dtype)
                return jax.vmap(lambda c: jnp.max(
                    spheres_vs_scene_signed_dist(c, radii, sc)))(centers)
            fn = jax.jit(_sd)
            self._jit_cache['sd'] = fn
        return fn(jnp.atleast_2d(jnp.asarray(q)), scene)

    def collision(self, q, other=None) -> jnp.ndarray:
        scene = other if other is not None else self._scene
        if scene is None:
            raise ValueError(
                'no scene: pass other= or construct with scene=')
        return self.signed_dist(q, scene) > 0

    def checker_fn(self, scene):
        """Bind a scene: returns gt(q) -> bool [B] for CollisionChecker."""
        scene = scene.scene if hasattr(scene, 'scene') else scene

        def gt(q):
            return self.signed_dist(q, scene) > 0
        return gt
