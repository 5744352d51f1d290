"""Mesh container + OBJ IO (twin of ``render/mesh.py`` / ``render/obj.py``).

``Mesh`` is a pytree (NamedTuple of arrays) so meshes pass through jit/vmap;
``face_valid`` supports the framework-wide padded-static-shape convention.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mesh_ops import auto_normals, compute_tangents


class Mesh(NamedTuple):
    v_pos: jax.Array  # (V, 3)
    t_pos_idx: jax.Array  # (F, 3) int32
    v_nrm: Optional[jax.Array] = None
    v_tex: Optional[jax.Array] = None
    v_tng: Optional[jax.Array] = None
    face_valid: Optional[jax.Array] = None  # (F,) bool; None = all valid

    def with_normals(self) -> "Mesh":
        return self._replace(
            v_nrm=auto_normals(self.v_pos, self.t_pos_idx, self.face_valid)
        )

    def aabb(self):
        return self.v_pos.min(axis=0), self.v_pos.max(axis=0)


def unit_size(mesh: Mesh) -> Mesh:
    """Center and scale to fit in [-0.5, 0.5]³ (ref ``mesh.py`` unit_size)."""
    vmin, vmax = mesh.aabb()
    center = (vmin + vmax) / 2
    scale = 1.0 / jnp.max(vmax - vmin)
    return mesh._replace(v_pos=(mesh.v_pos - center) * scale)


def load_obj(path: str, scale: float = 1.0, with_attrs: bool = False):
    """OBJ loader: positions + faces (triangulates fans); with
    ``with_attrs``, also texcoords/normals and their face indices.
    Twin of ``render/obj.py:31-141`` (material binding via
    ``render.material.load_mtl`` is up to the caller)."""
    verts, texs, nrms, faces, tfaces, nfaces = [], [], [], [], [], []
    mfaces, mat_names, mtllib = [], [], None
    cur_mat = -1
    with open(path, "r") as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v":
                verts.append([float(x) for x in tok[1:4]])
            elif tok[0] == "vt":
                texs.append([float(tok[1]), float(tok[2])])
            elif tok[0] == "vn":
                nrms.append([float(x) for x in tok[1:4]])
            elif tok[0] == "mtllib":
                mtllib = tok[1]
            elif tok[0] == "usemtl":
                name = tok[1]
                if name not in mat_names:
                    mat_names.append(name)
                cur_mat = mat_names.index(name)
            elif tok[0] == "f":
                parts = [t.split("/") for t in tok[1:]]
                vi = [int(p[0]) - 1 for p in parts]
                ti = [int(p[1]) - 1 if len(p) > 1 and p[1] else -1 for p in parts]
                ni = [int(p[2]) - 1 if len(p) > 2 and p[2] else -1 for p in parts]
                for k in range(1, len(vi) - 1):
                    faces.append([vi[0], vi[k], vi[k + 1]])
                    tfaces.append([ti[0], ti[k], ti[k + 1]])
                    nfaces.append([ni[0], ni[k], ni[k + 1]])
                    mfaces.append(max(cur_mat, 0))
    v = jnp.asarray(np.asarray(verts, np.float32) * scale)
    f = jnp.asarray(np.asarray(faces, np.int32))
    mesh = Mesh(v_pos=v, t_pos_idx=f).with_normals()
    if texs:
        mesh = mesh._replace(v_tex=jnp.asarray(np.asarray(texs, np.float32)))
    if not with_attrs:
        return mesh
    return mesh, {
        "t_tex_idx": np.asarray(tfaces, np.int32),
        "t_nrm_idx": np.asarray(nfaces, np.int32),
        "v_nrm_file": np.asarray(nrms, np.float32) if nrms else None,
        # per-face material indices + names, for material.merge_materials
        "m_face_idx": np.asarray(mfaces, np.int32),
        "mat_names": mat_names,
        "mtllib": mtllib,
    }


def save_obj(
    path: str,
    v_pos: np.ndarray,
    faces: np.ndarray,
    face_valid=None,
    uvs: np.ndarray | None = None,
    uv_idx: np.ndarray | None = None,
    mtl_name: str | None = None,
):
    """OBJ writer (twin of ``render/obj.py:143-192``), dropping padded faces
    and unreferenced vertices.  ``uvs``/``uv_idx`` (parallel to ``faces``)
    emit ``vt`` rows and ``f v/vt`` faces; ``mtl_name`` adds mtllib/usemtl."""
    v = np.asarray(v_pos)
    f = np.asarray(faces)
    fuv = None if uv_idx is None else np.asarray(uv_idx)
    if face_valid is not None:
        sel = np.asarray(face_valid)
        f = f[sel]
        fuv = None if fuv is None else fuv[sel]
    # Drop degenerate faces (padding routed to sentinel vertex)
    keep = ~((f[:, 0] == f[:, 1]) | (f[:, 1] == f[:, 2]) | (f[:, 0] == f[:, 2]))
    f = f[keep]
    fuv = None if fuv is None else fuv[keep]
    used = np.unique(f.reshape(-1))
    remap = np.full(v.shape[0], -1, np.int64)
    remap[used] = np.arange(used.shape[0])
    v = v[used]
    f = remap[f]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as out:
        if mtl_name is not None:
            out.write(f"mtllib {mtl_name}.mtl\nusemtl {mtl_name}\n")
        for p in v:
            out.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        if fuv is not None:
            for t in np.asarray(uvs):
                out.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
            for tri, tuv in zip(f, fuv):
                out.write(
                    f"f {tri[0]+1}/{tuv[0]+1} {tri[1]+1}/{tuv[1]+1} "
                    f"{tri[2]+1}/{tuv[2]+1}\n"
                )
        else:
            for tri in f:
                out.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
