"""ctypes bindings to the native (C++/OpenMP) runtime components.

Loads ``native/libgridgen.so`` (built by ``make -C native``; auto-built on
first use when a compiler is available) and exposes:

  * :func:`build_tet_grid_native` — drop-in accelerated twin of
    ``geometry.tet_grid.build_tet_grid`` (identical outputs, ~10-30× faster
    at res ≥ 128).
  * :func:`write_obj_native` — fast OBJ writer for multi-million-face
    extracted meshes.

All entry points degrade gracefully: callers use the numpy/python paths when
the library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_native_dir(), "libgridgen.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _native_dir()],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.tet_grid_n_edges.restype = ctypes.c_int64
    lib.tet_grid_n_edges.argtypes = [ctypes.c_int]
    lib.build_tet_grid.restype = None
    lib.build_tet_grid.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.write_obj.restype = ctypes.c_int64
    lib.write_obj.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def build_tet_grid_native(res: int):
    """Returns (verts, tets, tet_edges, edges) numpy arrays, or None if the
    native library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    n = res + 1
    n_verts = n**3
    n_tets = 6 * res**3
    n_edges = lib.tet_grid_n_edges(res)
    verts = np.empty((n_verts, 3), np.float32)
    tets = np.empty((n_tets, 4), np.int32)
    tet_edges = np.empty((n_tets, 6), np.int32)
    edges = np.empty((n_edges, 2), np.int32)
    lib.build_tet_grid(
        res,
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tet_edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return verts, tets, tet_edges, edges


def write_obj_native(path: str, verts: np.ndarray, faces: np.ndarray, face_valid=None) -> int:
    lib = load_native()
    if lib is None:
        return -1
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    fv = (
        np.ascontiguousarray(face_valid, np.uint8)
        if face_valid is not None
        else None
    )
    return lib.write_obj(
        path.encode(),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        verts.shape[0],
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if fv is not None else None,
        faces.shape[0],
    )
