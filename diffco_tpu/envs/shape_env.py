"""Environment (obstacle world) representations.

API parity with the reference's ShapeEnv
(/root/reference/diffco/collision_interfaces/env_interface.py:35-123):
a dict of named shapes with transforms, supporting add/remove/move. The
trimesh-scene + FCL manager backend is replaced by ``SceneArrays`` —
fixed-shape padded arrays of primitive parameters whose signed distances
evaluate batched on device.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..geometry.geometry3d import SceneArrays, scene_from_dict


class ShapeEnv:
    """Dict-of-shapes world.

    shape_dict format (matches env_interface.py:40-47)::

        {
          'box1': {'type': 'Box', 'params': {'extents': [1, 1, 1]},
                   'transform': np.eye(4)},
          'sphere1': {'type': 'Sphere', 'params': {'radius': 1}, ...},
          'cylinder1': {'type': 'Cylinder',
                        'params': {'radius': 1, 'height': 1}, ...},
          'capsule1': {'type': 'Capsule',
                       'params': {'radius': 1, 'height': 1}, ...},
          'mesh1': {'type': 'Mesh',
                    'params': {'file_obj': 'x.stl', 'scale': 1.0}, ...},
        }
    """

    def __init__(self, shapes: Dict[str, dict], mesh_spheres: int = 16):
        self.name = 'ShapeEnv'
        self.mesh_spheres = mesh_spheres
        self.shapes = {k: dict(v) for k, v in shapes.items()}
        self._rebuild()

    def _rebuild(self):
        self.scene, self.object_names = scene_from_dict(
            self.shapes, mesh_spheres=self.mesh_spheres)

    def add_object(self, name, shape_type, shape_params,
                   transform=None):
        self.shapes[name] = {
            'type': shape_type, 'params': dict(shape_params),
            'transform': np.eye(4) if transform is None else
            np.asarray(transform)}
        self._rebuild()

    def remove_object(self, name):
        del self.shapes[name]
        self._rebuild()

    def update_transform(self, name, transform):
        """Move an obstacle (ref env_interface.py:105-109). Rebuilds the
        scene arrays; shapes keep their padded layout so downstream jitted
        functions do not recompile."""
        self.shapes[name]['transform'] = np.asarray(transform)
        self._rebuild()

    @property
    def n_objects(self):
        return self.scene.n_objects


class PCDEnv:
    """Point-cloud environment. The reference's version is an unimplemented
    stub (env_interface.py:6-31); here a point cloud is usable directly as
    a sphere set with a fixed point radius."""

    def __init__(self, point_cloud, point_radius: float = 0.01,
                 max_points: int = 4096):
        import jax.numpy as jnp
        self.point_radius = float(point_radius)
        self.max_points = int(max_points)
        pc = np.asarray(point_cloud, np.float32).reshape(-1, 3)
        if len(pc) > max_points:
            idx = np.random.RandomState(0).choice(len(pc), max_points,
                                                  replace=False)
            pc = pc[idx]
        self.point_cloud = pc
        self.scene = SceneArrays(
            sph_c=jnp.asarray(pc), sph_r=jnp.full(len(pc), point_radius),
            box_t=jnp.zeros((0, 3)), box_R=jnp.zeros((0, 3, 3)),
            box_h=jnp.zeros((0, 3)),
            cyl_t=jnp.zeros((0, 3)), cyl_R=jnp.zeros((0, 3, 3)),
            cyl_r=jnp.zeros(0), cyl_h=jnp.zeros(0),
            cap_t=jnp.zeros((0, 3)), cap_R=jnp.zeros((0, 3, 3)),
            cap_r=jnp.zeros(0), cap_h=jnp.zeros(0),
            msh_c=jnp.zeros((0, 3)), msh_r=jnp.zeros(0),
            msh_obj=jnp.zeros(0, jnp.int32), n_mesh_objects=0)
        self.object_names = [f'point_{i}' for i in range(len(pc))]

    def update_point_cloud(self, point_cloud):
        # keep the configured radius/cap — re-initializing with defaults
        # silently shrank every point's collision radius to 0.01
        self.__init__(point_cloud, point_radius=self.point_radius,
                      max_points=self.max_points)
