"""ctypes bindings for the native exactgeom backend.

Builds libexactgeom.so on first use (g++, cached next to the source) and
exposes batched exact collision queries that mirror
diffco_tpu.geometry.geometry3d semantics. This is the framework's
native-runtime piece filling libfcl's role in the reference (host-side
exact checking for dataset generation and trajectory validation, off the
TPU path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess


import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'exactgeom.cpp')
_SO = os.path.join(_DIR, 'libexactgeom.so')

_lib = None


def _build() -> str:
    cmd = ['g++', '-O3', '-fopenmp', '-shared', '-fPIC', _SRC, '-o', _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise RuntimeError(f'exactgeom build failed: {e}') from e
    return _SO


def available() -> bool:
    # OSError covers ctypes.CDLL failures on a stale/foreign binary
    # (missing libgomp, glibc mismatch after a clone where .so and .cpp
    # share a checkout mtime) — available() must stay a bool probe
    try:
        load()
        return True
    except (RuntimeError, OSError):
        return False


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        # stale committed binary from another machine: rebuild once
        _build()
        lib = ctypes.CDLL(_SO)
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i32 = ctypes.POINTER(ctypes.c_int32)
    lib.batch_spheres_vs_scene.argtypes = [
        c_d, c_d, ctypes.c_int64, ctypes.c_int64,
        c_d, ctypes.c_int, c_d, ctypes.c_int, c_d, ctypes.c_int,
        c_d, ctypes.c_int, c_d, ctypes.c_int, c_d]
    lib.batch_self_collision.argtypes = [
        c_d, c_d, ctypes.c_int64, ctypes.c_int64, c_i32, ctypes.c_int64,
        c_d]
    lib.batch_point_sdf.argtypes = [
        c_d, ctypes.c_int64, c_d, ctypes.c_int, c_d, ctypes.c_int,
        c_d, ctypes.c_int, c_d, ctypes.c_int, c_d]
    lib.exactgeom_version.restype = ctypes.c_int
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeScene:
    """Packed scene arrays for the native backend, built from a
    diffco_tpu SceneArrays (or ShapeEnv.scene)."""

    def __init__(self, scene):
        import numpy as np

        def a(x):
            return np.ascontiguousarray(np.asarray(x, np.float64))

        self.sph = a(np.concatenate(
            [np.asarray(scene.sph_c, np.float64).reshape(-1, 3),
             np.asarray(scene.sph_r, np.float64).reshape(-1, 1)], axis=1)
            if scene.sph_c.shape[0] else np.zeros((0, 4)))
        self.box = a(np.concatenate(
            [np.asarray(scene.box_t, np.float64).reshape(-1, 3),
             np.asarray(scene.box_R, np.float64).reshape(-1, 9),
             np.asarray(scene.box_h, np.float64).reshape(-1, 3)], axis=1)
            if scene.box_t.shape[0] else np.zeros((0, 15)))
        self.cyl = a(np.concatenate(
            [np.asarray(scene.cyl_t, np.float64).reshape(-1, 3),
             np.asarray(scene.cyl_R, np.float64).reshape(-1, 9),
             np.asarray(scene.cyl_r, np.float64).reshape(-1, 1),
             np.asarray(scene.cyl_h, np.float64).reshape(-1, 1)], axis=1)
            if scene.cyl_t.shape[0] else np.zeros((0, 14)))
        self.cap = a(np.concatenate(
            [np.asarray(scene.cap_t, np.float64).reshape(-1, 3),
             np.asarray(scene.cap_R, np.float64).reshape(-1, 9),
             np.asarray(scene.cap_r, np.float64).reshape(-1, 1),
             np.asarray(scene.cap_h, np.float64).reshape(-1, 1)], axis=1)
            if scene.cap_t.shape[0] else np.zeros((0, 14)))
        if scene.msh_c.shape[0]:
            self.msh = a(np.concatenate(
                [np.asarray(scene.msh_c, np.float64).reshape(-1, 3),
                 np.asarray(scene.msh_r, np.float64).reshape(-1, 1),
                 np.asarray(scene.msh_obj, np.float64).reshape(-1, 1)],
                axis=1))
        else:
            self.msh = a(np.zeros((0, 5)))


def spheres_vs_scene(centers: np.ndarray, radii: np.ndarray,
                     scene: 'NativeScene') -> np.ndarray:
    """centers [B, P, 3], radii [P] -> max signed dist [B]
    (>0 = collision)."""
    lib = load()
    centers = np.ascontiguousarray(centers, np.float64)
    radii = np.ascontiguousarray(radii, np.float64)
    B, P, _ = centers.shape
    out = np.empty(B, np.float64)
    lib.batch_spheres_vs_scene(
        _ptr(centers), _ptr(radii), B, P,
        _ptr(scene.sph), len(scene.sph), _ptr(scene.box), len(scene.box),
        _ptr(scene.cyl), len(scene.cyl), _ptr(scene.cap), len(scene.cap),
        _ptr(scene.msh), len(scene.msh), _ptr(out))
    return out


def self_collision(centers: np.ndarray, radii: np.ndarray,
                   pair_i: np.ndarray, pair_j: np.ndarray) -> np.ndarray:
    """Max pairwise overlap [B] for the given sphere index pairs."""
    lib = load()
    centers = np.ascontiguousarray(centers, np.float64)
    radii = np.ascontiguousarray(radii, np.float64)
    pairs = np.ascontiguousarray(
        np.stack([pair_i, pair_j], axis=1), np.int32)
    B, P, _ = centers.shape
    out = np.empty(B, np.float64)
    lib.batch_self_collision(
        _ptr(centers), _ptr(radii), B, P,
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(pairs), _ptr(out))
    return out


def point_sdf(points: np.ndarray, scene: 'NativeScene') -> np.ndarray:
    """points [N, 3] -> per-object SDFs [N, n_objects] (no mesh objects)."""
    lib = load()
    points = np.ascontiguousarray(points, np.float64)
    n_obj = (len(scene.sph) + len(scene.box) + len(scene.cyl)
             + len(scene.cap))
    out = np.empty((len(points), n_obj), np.float64)
    lib.batch_point_sdf(
        _ptr(points), len(points),
        _ptr(scene.sph), len(scene.sph), _ptr(scene.box), len(scene.box),
        _ptr(scene.cyl), len(scene.cyl), _ptr(scene.cap), len(scene.cap),
        _ptr(out))
    return out
