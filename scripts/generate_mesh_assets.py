#!/usr/bin/env python
"""Procedurally generate non-trivial closed meshes for the SE3 mesh-body
pipeline (mount-free stand-ins for the reference's mesh assets,
/root/reference/assets/object_meshes/: the SE3 experiments load a mesh,
sphere-decompose it, and fly it through a scene —
se3_data_generation.py:70-172, manual_trajopt_se3.py:585-700).

Writes binary STLs under robot_data/generated/:
  torus.stl    — genus-1, non-convex (the interesting case for
                 sphere-decomposition: a convex hull would be wrong)
  lbracket.stl — an L-shaped union of two boxes (sharp concave edge)

Pure numpy; no trimesh dependency (not in the image).
"""
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def write_stl_binary(path, vertices, faces):
    """vertices [V, 3] float, faces [F, 3] int -> binary STL."""
    tris = np.asarray(vertices, np.float32)[np.asarray(faces, np.int64)]
    a = tris[:, 1] - tris[:, 0]
    b = tris[:, 2] - tris[:, 0]
    n = np.cross(a, b)
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    with open(path, 'wb') as f:
        f.write(b'\0' * 80)
        f.write(struct.pack('<I', len(tris)))
        for i in range(len(tris)):
            f.write(struct.pack('<12fH', *n[i], *tris[i, 0], *tris[i, 1],
                                *tris[i, 2], 0))


def torus_mesh(R=0.45, r=0.15, nu=48, nv=24):
    """Closed torus: [V, 3], [F, 3] with outward-oriented triangles."""
    u = np.arange(nu) * (2 * np.pi / nu)
    v = np.arange(nv) * (2 * np.pi / nv)
    uu, vv = np.meshgrid(u, v, indexing='ij')
    x = (R + r * np.cos(vv)) * np.cos(uu)
    y = (R + r * np.cos(vv)) * np.sin(uu)
    z = r * np.sin(vv)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3)

    def vid(i, j):
        return (i % nu) * nv + (j % nv)

    faces = []
    for i in range(nu):
        for j in range(nv):
            a, b_, c, d = (vid(i, j), vid(i + 1, j),
                           vid(i + 1, j + 1), vid(i, j + 1))
            faces.append((a, b_, c))
            faces.append((a, c, d))
    return verts.astype(np.float32), np.asarray(faces, np.int64)


def lbracket_mesh(leg=0.7, thick=0.25):
    """Two axis-aligned boxes sharing a corner: concave L-shape."""
    def box(lo, hi):
        lo, hi = np.asarray(lo, np.float32), np.asarray(hi, np.float32)
        corners = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                            [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                            [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                            [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]],
                           np.float32)
        quads = [(0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4),
                 (2, 3, 7, 6), (1, 2, 6, 5), (3, 0, 4, 7)]
        faces = []
        for q in quads:
            faces.append((q[0], q[1], q[2]))
            faces.append((q[0], q[2], q[3]))
        return corners, np.asarray(faces, np.int64)

    v1, f1 = box([0, 0, 0], [leg, thick, thick])
    v2, f2 = box([0, 0, 0], [thick, leg, thick])
    verts = np.concatenate([v1, v2], axis=0)
    faces = np.concatenate([f1, f2 + len(v1)], axis=0)
    verts = verts - verts.mean(0)
    return verts, faces


def main():
    out_dir = os.path.join(os.path.dirname(__file__), '..',
                           'robot_data', 'generated')
    os.makedirs(out_dir, exist_ok=True)
    for name, (v, f) in [('torus', torus_mesh()),
                         ('lbracket', lbracket_mesh())]:
        path = os.path.join(out_dir, f'{name}.stl')
        write_stl_binary(path, v, f)
        print(f'{path}: {len(v)} verts, {len(f)} tris')


if __name__ == '__main__':
    main()
