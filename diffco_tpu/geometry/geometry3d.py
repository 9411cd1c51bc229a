"""Batched 3D collision geometry: sphere-decomposed robot vs analytic SDFs.

TPU-native replacement for the reference's FCL collision managers
(/root/reference/diffco/collision_interfaces/urdf_interface.py:100-344 and
env_interface.py:35-123). The reference loops every configuration through
libfcl on the host (urdf_interface.py:450-513); here the robot's collision
geometry is a set of spheres attached to links (cuRobo-style,
curobo_interface.py:85-129) and the environment is a set of primitives
with closed-form signed-distance functions — so a batch of thousands of
configurations is labeled with a handful of fused device ops.

Sign conventions: ``*_sdf`` functions are classic SDFs (negative inside);
``signed_dist`` outputs follow FCLChecker (deprecated/FCLChecker.py:65-91):
positive = penetration depth, negative = separation.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# point SDFs (local frame; negative inside)


def sphere_sdf(p, radius):
    return jnp.sqrt(jnp.sum(p ** 2, -1) + 1e-12) - radius


def box_sdf(p, half):
    q = jnp.abs(p) - half
    outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, -1) + 1e-12)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def cylinder_sdf(p, radius, half_h):
    dxy = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2 + 1e-12) - radius
    dz = jnp.abs(p[..., 2]) - half_h
    outside = jnp.sqrt(jnp.maximum(dxy, 0.0) ** 2
                       + jnp.maximum(dz, 0.0) ** 2 + 1e-12)
    inside = jnp.minimum(jnp.maximum(dxy, dz), 0.0)
    return outside + inside


def capsule_sdf(p, radius, half_h):
    z = jnp.clip(p[..., 2], -half_h, half_h)
    d = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2
                 + (p[..., 2] - z) ** 2 + 1e-12)
    return d - radius


def _to_local(p, rot, trans):
    """World point(s) -> object local frame. rot [3,3], trans [3]."""
    return jnp.einsum('ji,...j->...i', rot, p - trans)


# ---------------------------------------------------------------------------
# scene container


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=['sph_c', 'sph_r', 'box_t', 'box_R', 'box_h', 'cyl_t',
                 'cyl_R', 'cyl_r', 'cyl_h', 'cap_t', 'cap_R', 'cap_r',
                 'cap_h', 'msh_c', 'msh_r', 'msh_obj'],
    meta_fields=['n_mesh_objects'])
@dataclasses.dataclass
class SceneArrays:
    """Padded per-type obstacle arrays (fixed shapes; jit-stable).

    Registered as a JAX pytree (n_mesh_objects static) so jitted collision
    functions take the scene as an argument: moving obstacles re-executes
    without recompiling.

    Mesh obstacles are represented by their sphere decompositions with an
    object-id map so per-object distances reduce correctly.
    """
    # spheres: center [Ns,3], radius [Ns]
    sph_c: jnp.ndarray
    sph_r: jnp.ndarray
    # boxes: trans [Nb,3], rot [Nb,3,3], half extents [Nb,3]
    box_t: jnp.ndarray
    box_R: jnp.ndarray
    box_h: jnp.ndarray
    # cylinders: trans, rot, radius, half height
    cyl_t: jnp.ndarray
    cyl_R: jnp.ndarray
    cyl_r: jnp.ndarray
    cyl_h: jnp.ndarray
    # capsules
    cap_t: jnp.ndarray
    cap_R: jnp.ndarray
    cap_r: jnp.ndarray
    cap_h: jnp.ndarray
    # mesh spheres: center [Nm,3], radius [Nm], object id [Nm]
    msh_c: jnp.ndarray
    msh_r: jnp.ndarray
    msh_obj: jnp.ndarray
    n_mesh_objects: int

    @property
    def n_objects(self) -> int:
        return (self.sph_c.shape[0] + self.box_t.shape[0]
                + self.cyl_t.shape[0] + self.cap_t.shape[0]
                + self.n_mesh_objects)

    def point_sdf_per_object(self, p):
        """SDF of world point(s) p [..., 3] to every object:
        returns [..., n_objects] (negative inside), object order:
        spheres, boxes, cylinders, capsules, meshes."""
        outs = []
        if self.sph_c.shape[0]:
            outs.append(jax.vmap(
                lambda c, r: sphere_sdf(p - c, r), out_axes=-1)(
                    self.sph_c, self.sph_r))
        if self.box_t.shape[0]:
            outs.append(jax.vmap(
                lambda t, R, h: box_sdf(_to_local(p, R, t), h),
                out_axes=-1)(self.box_t, self.box_R, self.box_h))
        if self.cyl_t.shape[0]:
            outs.append(jax.vmap(
                lambda t, R, r, h: cylinder_sdf(_to_local(p, R, t), r, h),
                out_axes=-1)(self.cyl_t, self.cyl_R, self.cyl_r, self.cyl_h))
        if self.cap_t.shape[0]:
            outs.append(jax.vmap(
                lambda t, R, r, h: capsule_sdf(_to_local(p, R, t), r, h),
                out_axes=-1)(self.cap_t, self.cap_R, self.cap_r, self.cap_h))
        if self.msh_c.shape[0]:
            per_sphere = jax.vmap(
                lambda c, r: sphere_sdf(p - c, r), out_axes=-1)(
                    self.msh_c, self.msh_r)  # [..., Nm]
            # reduce min over spheres of each mesh object
            one_hot = (self.msh_obj[:, None]
                       == jnp.arange(self.n_mesh_objects)[None, :])
            big = jnp.asarray(1e9, per_sphere.dtype)
            masked = jnp.where(one_hot[None], per_sphere[..., :, None], big)
            outs.append(jnp.min(masked.reshape(
                per_sphere.shape[:-1] + (self.msh_c.shape[0],
                                         self.n_mesh_objects)), axis=-2))
        if not outs:
            return jnp.zeros(p.shape[:-1] + (0,), p.dtype)
        return jnp.concatenate(outs, axis=-1)


# local-frame (centers, radii) per (mesh path, scale, n_spheres) — see
# the Mesh branch of scene_from_dict
_mesh_sphere_cache = {}


def scene_from_dict(shapes: Dict[str, dict], mesh_spheres: int = 16,
                    dtype=jnp.float32) -> Tuple[SceneArrays, List[str]]:
    """Build SceneArrays from a ShapeEnv-style dict (env_interface.py:35-48
    documents the format). Returns (scene, object_names in object order)."""
    from .mesh import load_mesh, spheres_from_mesh
    sph, box, cyl, cap, msh = [], [], [], [], []
    sph_n, box_n, cyl_n, cap_n, msh_n = [], [], [], [], []
    for name, spec in shapes.items():
        T = np.asarray(spec.get('transform', np.eye(4)), np.float32)
        R, t = T[:3, :3], T[:3, 3]
        kind = spec['type']
        params = spec['params']
        if kind == 'Sphere':
            sph.append((t, float(params['radius'])))
            sph_n.append(name)
        elif kind == 'Box':
            box.append((t, R, np.asarray(params['extents'], np.float32) / 2))
            box_n.append(name)
        elif kind == 'Cylinder':
            cyl.append((t, R, float(params['radius']),
                        float(params['height']) / 2))
            cyl_n.append(name)
        elif kind == 'Capsule':
            cap.append((t, R, float(params['radius']),
                        float(params['height']) / 2))
            cap_n.append(name)
        elif kind == 'Mesh':
            scale = float(params.get('scale', 1.0))
            # cache the LOCAL-frame decomposition per (source, scale, n):
            # ShapeEnv rebuilds the scene on every update_transform, and
            # re-reading + re-clustering each mesh per obstacle move would
            # dominate the advertised no-recompile fast path
            if 'vertices' in params:
                # inline geometry (e.g. MoveIt .scene meshes carry their
                # vertex/triangle lists in the file, no asset on disk)
                verts0 = np.asarray(params['vertices'], np.float32)
                faces0 = np.asarray(params['faces'], np.int32)
                ck = ('inline', verts0.tobytes(), faces0.tobytes(),
                      scale, mesh_spheres)
            else:
                path = params.get('file_obj') or params.get('file_stl') \
                    or params.get('path')
                ck = (path, scale, mesh_spheres)
            hit = _mesh_sphere_cache.get(ck)
            if hit is None:
                if 'vertices' in params:
                    verts, faces = verts0, faces0
                else:
                    verts, faces = load_mesh(path)
                verts = verts * scale
                hit = spheres_from_mesh(verts, faces,
                                        n_spheres=mesh_spheres)
                _mesh_sphere_cache[ck] = hit
            centers, radii = hit
            centers = centers @ R.T + t
            msh.append((centers, radii))
            msh_n.append(name)
        else:
            raise ValueError(f'unknown shape type {kind}')

    def arr(x, shape):
        return jnp.asarray(np.asarray(x, np.float32).reshape(shape),
                           dtype=dtype)

    msh_c = (np.concatenate([m[0] for m in msh]) if msh
             else np.zeros((0, 3), np.float32))
    msh_r = (np.concatenate([m[1] for m in msh]) if msh
             else np.zeros(0, np.float32))
    msh_obj = (np.concatenate([np.full(len(m[0]), i, np.int32)
                               for i, m in enumerate(msh)]) if msh
               else np.zeros(0, np.int32))
    scene = SceneArrays(
        sph_c=arr([s[0] for s in sph], (-1, 3)),
        sph_r=arr([s[1] for s in sph], (-1,)),
        box_t=arr([b[0] for b in box], (-1, 3)),
        box_R=arr([b[1] for b in box], (-1, 3, 3)),
        box_h=arr([b[2] for b in box], (-1, 3)),
        cyl_t=arr([c[0] for c in cyl], (-1, 3)),
        cyl_R=arr([c[1] for c in cyl], (-1, 3, 3)),
        cyl_r=arr([c[2] for c in cyl], (-1,)),
        cyl_h=arr([c[3] for c in cyl], (-1,)),
        cap_t=arr([c[0] for c in cap], (-1, 3)),
        cap_R=arr([c[1] for c in cap], (-1, 3, 3)),
        cap_r=arr([c[2] for c in cap], (-1,)),
        cap_h=arr([c[3] for c in cap], (-1,)),
        msh_c=jnp.asarray(msh_c, dtype), msh_r=jnp.asarray(msh_r, dtype),
        msh_obj=jnp.asarray(msh_obj), n_mesh_objects=len(msh),
    )
    names = sph_n + box_n + cyl_n + cap_n + msh_n
    return scene, names


# ---------------------------------------------------------------------------
# robot-sphere queries


def spheres_vs_scene_signed_dist(centers, radii, scene: SceneArrays):
    """Per-object signed distance of a robot sphere set.

    centers [P, 3], radii [P] -> [n_objects]; >0 = penetration
    (max over robot spheres of radius - sdf)."""
    sdf = scene.point_sdf_per_object(centers)       # [P, n_objects]
    signed = radii[:, None] - sdf
    return jnp.max(signed, axis=0)


def sphere_set_self_distance(centers, radii, pair_i, pair_j):
    """Signed distance for selected sphere pairs (self-collision):
    [n_pairs]; >0 = overlap. pair_i/j index the sphere arrays."""
    ci, cj = centers[pair_i], centers[pair_j]
    rr = radii[pair_i] + radii[pair_j]
    d = jnp.sqrt(jnp.sum((ci - cj) ** 2, -1) + 1e-12)
    return rr - d
