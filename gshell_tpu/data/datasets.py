"""Posed-image datasets for inverse rendering.

TPU-native twins of the reference ``dataset/`` package:
  * :class:`DatasetDeepFashion`  — IDR-style ``cameras_sphere.npz``
    (``dataset/dataset_deepfashion.py:59-138``)
  * :class:`DatasetNeRF`         — NeRF-synthetic ``transforms_*.json``
    (``dataset/dataset_nerf.py:36-94``)
  * :class:`DatasetMesh`         — on-the-fly synthetic supervision from a
    reference OBJ (``dataset/dataset_mesh.py:24-124``)

Design: datasets pre-load to host numpy and yield already-batched pytrees of
jnp arrays ({'mvp', 'campos', 'img', 'background', ...}) — TPU training wants
whole batches shipped once per step, not a torch DataLoader worker pool.
The projection-matrix decomposition replaces cv2.decomposeProjectionMatrix
with a numpy RQ decomposition.
"""
from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import math as gmath


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3×4 projection into intrinsics + camera-to-world pose.
    Twin of the IDR helper (``dataset_deepfashion.py:24-46``), using RQ
    decomposition instead of OpenCV."""
    M = P[:3, :3]
    # RQ decomposition via flipped QR
    rev = np.flipud(np.eye(3))
    q, r = np.linalg.qr((rev @ M).T)
    K = rev @ r.T @ rev
    R = rev @ q.T
    # enforce positive diagonal of K
    sign = np.diag(np.sign(np.diag(K)))
    K = K @ sign
    R = sign @ R
    t = np.linalg.lstsq(-M, P[:3, 3], rcond=None)[0]  # camera center

    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = t
    return intrinsics, pose


def _srgb_to_rgb_np(f):
    return np.where(f <= 0.04045, f / 12.92, ((np.clip(f, 0.04045, None) + 0.055) / 1.055) ** 2.4)


def _load_img(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    img = imageio.imread(path)
    if img.dtype != np.float32:
        img = img.astype(np.float32) / 255.0
        img[..., 0:3] = _srgb_to_rgb_np(img[..., 0:3])
    if img.shape[-1] == 3:
        img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
    return img


def _resize_np(img: np.ndarray, res) -> np.ndarray:
    if img.shape[:2] == tuple(res):
        return img
    return np.asarray(
        jax.image.resize(jnp.asarray(img), (res[0], res[1], img.shape[-1]), "linear")
    )


class PosedImageDataset:
    """Base: holds (mvp, campos, img) per view; iterates random batches."""

    def __init__(self):
        self.mvp: np.ndarray = None  # (N, 4, 4)
        self.campos: np.ndarray = None  # (N, 3)
        self.imgs: np.ndarray = None  # (N, H, W, 4) premultiplied alpha
        self.resolution = None
        # optional depth / second-layer supervision (ref dataset_mesh.py:110-124)
        self.invdepths: np.ndarray | None = None  # (N, H, W, 1)
        self.imgs_second: np.ndarray | None = None  # (N, H, W, 4)
        self.invdepths_second: np.ndarray | None = None  # (N, H, W, 1)

    def __len__(self):
        return self.mvp.shape[0]

    def batch(self, idx: np.ndarray, background: str = "random", rng: np.random.Generator | None = None) -> dict:
        """Assemble a training batch (ref ``prepare_batch``,
        train_gshelltet_deepfashion.py:70-94): mixes the chosen background
        into the premultiplied-alpha reference image."""
        rng = rng or np.random.default_rng()
        img = self.imgs[idx].copy()
        h, w = img.shape[1:3]
        if background == "random":
            bg = rng.random((len(idx), h, w, 3), dtype=np.float32)
        elif background == "white":
            bg = np.ones((len(idx), h, w, 3), dtype=np.float32)
        else:
            bg = np.zeros((len(idx), h, w, 3), dtype=np.float32)
        img[..., 0:3] = img[..., 0:3] + bg * (1.0 - img[..., 3:])
        out = {
            "mvp": jnp.asarray(self.mvp[idx]),
            "campos": jnp.asarray(self.campos[idx]),
            "img": jnp.asarray(img),
            "background": jnp.asarray(bg),
        }
        # optional supervision channels (reference passes img_second/invdepth
        # through prepare_batch untouched, train_gshelltet_synthetic.py:70-93)
        if self.invdepths is not None:
            out["invdepth"] = jnp.asarray(self.invdepths[idx])
        if self.imgs_second is not None:
            out["img_second"] = jnp.asarray(self.imgs_second[idx])
        if self.invdepths_second is not None:
            out["invdepth_second"] = jnp.asarray(self.invdepths_second[idx])
        return out

    def iterate(self, batch_size: int, steps: int, background="random", seed=0) -> Iterator[dict]:
        rng = np.random.default_rng(seed)
        n = len(self)
        for _ in range(steps):
            idx = rng.integers(0, n, size=batch_size)
            yield self.batch(idx, background, rng)


class DatasetDeepFashion(PosedImageDataset):
    """ref ``dataset/dataset_deepfashion.py:59-138`` (72 views hardcoded,
    fovy 60°, premultiplied alpha, y/z flip of the IDR pose)."""

    def __init__(self, base_dir: str, train_res=(512, 512), cam_near_far=(0.1, 1000.0), n_images: int = 72):
        super().__init__()
        cams = np.load(os.path.join(base_dir, "cameras_sphere.npz"))
        proj = np.asarray(
            gmath.perspective(np.deg2rad(60.0), train_res[1] / train_res[0], *cam_near_far)
        )
        flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)

        mvps, camposs, imgs = [], [], []
        for i in range(n_images):
            world_mat = cams[f"world_mat_{i}"].astype(np.float32)
            scale_mat = cams[f"scale_mat_{i}"].astype(np.float32)
            P = (world_mat @ scale_mat)[:3, :4]
            _, pose = load_K_Rt_from_P(P)
            mv = flip @ np.linalg.inv(pose)
            campos = np.linalg.inv(mv)[:3, 3]
            mvps.append(proj @ mv)
            camposs.append(campos)
            img = _load_img(os.path.join(base_dir, f"{i:03d}.png"))
            img = _resize_np(img, train_res)
            img[..., 0:3] *= img[..., 3:]  # premultiply
            img[..., 3] = np.sign(img[..., 3])
            imgs.append(img)
        self.mvp = np.stack(mvps)
        self.campos = np.stack(camposs)
        self.imgs = np.stack(imgs)
        self.resolution = train_res


class DatasetNeRF(PosedImageDataset):
    """NeRF-synthetic (``transforms_train.json``) — ref ``dataset/dataset_nerf.py``."""

    def __init__(self, cfg_path: str, train_res=(512, 512), cam_near_far=(0.1, 1000.0), examples: Optional[int] = None):
        super().__init__()
        base_dir = os.path.dirname(cfg_path)
        cfg = json.load(open(cfg_path))
        fovx = cfg["camera_angle_x"]
        frames = cfg["frames"][:examples] if examples else cfg["frames"]
        rx = np.asarray(gmath.rotate_x(-np.pi / 2))  # ref :67 convention

        mvps, camposs, imgs = [], [], []
        for frame in frames:
            img_path = os.path.join(base_dir, frame["file_path"] + ".png")
            img = _resize_np(_load_img(img_path), train_res)
            img[..., 0:3] *= img[..., 3:]
            img[..., 3] = np.sign(img[..., 3])
            imgs.append(img)

            # fov_x → fov_y for the target aspect
            aspect = train_res[1] / train_res[0]
            fovy = 2.0 * np.arctan(np.tan(fovx / 2.0) / aspect)
            proj = np.asarray(gmath.perspective(fovy, aspect, *cam_near_far))
            xform = np.asarray(frame["transform_matrix"], np.float32)
            mv = np.linalg.inv(rx @ xform)
            campos = np.linalg.inv(mv)[:3, 3]
            mvps.append(proj @ mv)
            camposs.append(campos)
        self.mvp = np.stack(mvps)
        self.campos = np.stack(camposs)
        self.imgs = np.stack(imgs)
        self.resolution = train_res


class DatasetDeepFashionTestset(DatasetDeepFashion):
    """DeepFashion test split with a separate mask directory
    (ref ``dataset/dataset_deepfashion_testset.py:67-137``)."""

    def __init__(self, base_dir: str, mask_dir: str, train_res=(512, 512), **kw):
        super().__init__(base_dir, train_res=train_res, **kw)
        import imageio.v2 as imageio

        for i in range(self.imgs.shape[0]):
            m = imageio.imread(os.path.join(mask_dir, f"{i:03d}.png"))
            m = (np.asarray(m, np.float32) / 255.0)[..., :1]
            m = _resize_np(m, train_res)
            self.imgs[i, ..., 3:] = np.sign(m)
            self.imgs[i, ..., 0:3] *= np.sign(m)


class DatasetNeRFColmap(PosedImageDataset):
    """Colmap-style NeRF captures (polycam/hat) with explicit mask images
    (ref ``dataset/dataset_nerf_colmap.py:34-94``): per-frame camera_angle_x,
    mask in a sibling ``mask/`` dir, mv = inv(xform) @ rotate_x(-π/2)."""

    def __init__(self, cfg_path: str, train_res=(512, 512), cam_near_far=(0.1, 1000.0), examples: Optional[int] = None):
        super().__init__()
        base_dir = os.path.dirname(cfg_path)
        cfg = json.load(open(cfg_path))
        frames = cfg["frames"][:examples] if examples else cfg["frames"]
        aspect = train_res[1] / train_res[0]
        rx = np.asarray(gmath.rotate_x(-np.pi / 2))

        mvps, camposs, imgs = [], [], []
        for frame in frames:
            fovx = frame["camera_angle_x"]
            fovy = 2.0 * np.arctan(np.tan(fovx / 2.0) / aspect)
            proj = np.asarray(gmath.perspective(fovy, aspect, *cam_near_far))
            img_path = os.path.join(base_dir, frame["file_path"])
            img = _load_img(img_path)
            mask_path = img_path.replace("/image/", "/mask/").replace(".jpg", ".png")
            if os.path.exists(mask_path):
                m = _load_img(mask_path)[..., :1]
                img = np.concatenate([img[..., :3], m], -1)
            img = _resize_np(img, train_res)
            img[..., 0:3] *= img[..., 3:]
            img[..., 3] = np.sign(img[..., 3])
            imgs.append(img)
            mv = np.linalg.inv(np.asarray(frame["transform_matrix"], np.float32)) @ rx
            campos = np.linalg.inv(mv)[:3, 3]
            mvps.append(proj @ mv)
            camposs.append(campos)
        self.mvp = np.stack(mvps)
        self.campos = np.stack(camposs)
        self.imgs = np.stack(imgs)
        self.resolution = train_res


class DatasetLLFF(PosedImageDataset):
    """LLFF light-field captures (``poses_bounds.npy`` + images/ + masks/) —
    ref ``dataset/dataset_llff.py:39-109``, including the LLFF→NeRF axis
    swizzle and auto-centering at the focal point of the camera rays."""

    def __init__(self, base_dir: str, train_res=(512, 512), cam_near_far=(0.1, 1000.0)):
        super().__init__()
        import glob as globmod

        img_files = sorted(
            f
            for f in globmod.glob(os.path.join(base_dir, "images", "*"))
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        mask_files = sorted(
            f
            for f in globmod.glob(os.path.join(base_dir, "masks", "*"))
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        pb = np.load(os.path.join(base_dir, "poses_bounds.npy"))
        poses = pb[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
        poses = np.concatenate([poses[:, 1:2], -poses[:, 0:1], poses[:, 2:]], 1)
        poses = np.moveaxis(poses, -1, 0).astype(np.float32)  # (N, 3, 5)
        lrow = np.tile(np.asarray([0, 0, 0, 1], np.float32), (poses.shape[0], 1, 1))
        imvs = np.concatenate([poses[:, :, 0:4], lrow], axis=1)  # cam-to-world

        # focal length (pixels) → fovy
        focal = poses[:, 2, 4]
        h_px = poses[:, 0, 4]
        fovy = 2.0 * np.arctan(0.5 * h_px / focal)

        # recenter: approximate focal point of viewing rays (ref lines_focal)
        origins = imvs[:, :3, 3]
        dirs = -imvs[:, :3, 2]
        center = _lines_focal(origins, dirs)
        imvs[:, :3, 3] -= center[None]

        aspect = train_res[1] / train_res[0]
        mvps, camposs, imgs = [], [], []
        for i, f in enumerate(img_files):
            proj = np.asarray(gmath.perspective(float(fovy[i]), aspect, *cam_near_far))
            mv = np.linalg.inv(imvs[i])
            campos = np.linalg.inv(mv)[:3, 3]
            img = _load_img(f)
            if i < len(mask_files):
                m = _load_img(mask_files[i])[..., :1]
                img = np.concatenate([img[..., :3], m], -1)
            img = _resize_np(img, train_res)
            img[..., 0:3] *= img[..., 3:]
            img[..., 3] = np.sign(img[..., 3])
            imgs.append(img)
            mvps.append(proj @ mv)
            camposs.append(campos)
        self.mvp = np.stack(mvps)
        self.campos = np.stack(camposs)
        self.imgs = np.stack(imgs)
        self.resolution = train_res


def _lines_focal(o: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Least-squares closest point to a set of lines (ref util.lines_focal)."""
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    eye = np.eye(3)[None]
    m = eye - d[:, :, None] * d[:, None, :]
    a = m.sum(0)
    b = (m @ o[:, :, None]).sum(0)[:, 0]
    return np.linalg.solve(a, b)


class GShellGridDataset:
    """Baked diffusion grids from a file list (ref
    ``GMeshDiffusion/lib/dataset/gshell_dataset.py`` /
    ``gshell_dataset_aug.py``).  Yields channels-last numpy batches."""

    def __init__(self, file_list: list, use_occ: bool = True):
        self.files = list(file_list)
        self.use_occ = use_occ

    def __len__(self):
        return len(self.files)

    def sample_batch(self, rng: np.random.Generator, batch: int) -> dict:
        idx = rng.integers(0, len(self.files), size=batch)
        grids, occs = [], []
        for i in idx:
            z = np.load(self.files[i])
            grids.append(np.asarray(z["grid"], np.float32))
            if self.use_occ:
                occs.append(np.asarray(z["occgrid"], np.float32)[..., None])
        out = {"grid": np.stack(grids)}
        if self.use_occ:
            out["occgrid"] = np.stack(occs)
        return out


def make_splits(paths: list, train_frac: float = 0.9, seed: int = 0):
    """90/10 shuffled split lists (ref ``GMeshDiffusion/metadata/
    get_splits_lower.py:1-33``)."""
    rng = np.random.default_rng(seed)
    paths = list(paths)
    rng.shuffle(paths)
    k = int(len(paths) * train_frac)
    return paths[:k], paths[k:]


class DatasetMesh(PosedImageDataset):
    """Synthetic ground-truth supervision: renders a reference mesh with a
    random camera + environment light per batch (ref ``dataset/dataset_mesh.py``).
    Used for the synthetic-reconstruction config and for tests."""

    def __init__(self, mesh, light, mat_params, mat_cfg, flags, n_views: int = 64,
                 cam_radius: float = 3.0, fovy_deg: float = 45.0, seed: int = 0,
                 layers: int = 1, shadows: bool = False,
                 shadow_grid_res: int = 65, render_seed: int = 0):
        """``layers`` mirrors reference FLAGS.layers: with layers > 1 the
        dataset also emits 'img_second'/'invdepth_second' supervision
        (ref dataset_mesh.py:110-124 returns shaded_second/invdepth buffers).

        ``shadows``: render the GT through the same swept-shadow-field path
        training uses (reference parity — dataset_mesh.py GT goes through the
        full OptiX pipeline including shadow rays).  The occluder volume is a
        surface-splat occupancy grid of the GT mesh over its padded bounds;
        a SHADOW-FREE GT paired with shadowed training makes the optimizer
        over-brighten materials to offset its own shadowing (measured: the
        512² skirt run plateaus at img_loss ≈ 0.6 with saturated albedo)."""
        super().__init__()
        from ..render.render import render_mesh, render_second_layer

        # GROUND TRUTH must be exact: the training-time budget knobs
        # (foreground compaction, subsampled jitter tap) would silently
        # corrupt the target (overflow pixels render black) — force the
        # exact full-image path for GT generation.
        flags = flags._replace(shade_budget=None, jitter_tap_frac=1.0)

        rng = np.random.default_rng(seed)
        h, w = flags.resolution
        mvps, camposs, imgs = [], [], []
        invdepths, imgs2, invdepths2 = [], [], []

        # The mesh/material/light ride as jit ARGUMENTS, not closures: a
        # closed-over numpy mesh becomes an HLO constant and XLA constant-
        # folds whole raster pipelines over it at compile time (measured:
        # 7–16 s PER folded sort/reduce during GT pre-render startup).
        @jax.jit
        def render_view(key, mvp, campos, v_pos, t_idx, v_nrm, mp, lt, vc):
            # the 13 MB shadow field rides as an argument too (closure
            # arrays bake into HLO constants — see note above)
            vfn = None if vis_cfg is None else (vis_cfg, vc)
            buf = render_mesh(
                key, v_pos, t_idx, v_nrm, None,
                mp, mat_cfg, mvp, campos, lt, flags,
                shadow_scale=shadow_scale, visibility_fn=vfn,
            )
            if layers > 1:
                buf.update(render_second_layer(
                    key, v_pos, t_idx,
                    v_nrm, mp, mat_cfg, mvp, campos, lt,
                    flags, shadow_scale=shadow_scale,
                    visibility_fn=vfn,
                ))
            return buf

        v_pos_d = jnp.asarray(mesh.v_pos)
        t_idx_d = jnp.asarray(mesh.t_pos_idx)
        v_nrm_d = jnp.asarray(mesh.v_nrm) if mesh.v_nrm is not None else None

        shadow_scale = 0.0
        if shadows:
            from ..ops.mesh_ops import sample_surface
            from ..ops.shade import make_shadow_field_parts

            # occupancy: splat area-weighted surface samples into a lattice
            # over the mesh's padded bounds (threshold 0 ⇒ occupied > 0)
            # fixed splat seed: the GT shadow field must be identical
            # between the training dataset and the held-out eval dataset
            # (whose view seeds differ)
            n_splat = 1 << 17
            pts = sample_surface(
                jax.random.PRNGKey(191), v_pos_d, t_idx_d, n_splat
            )
            lo = jnp.min(v_pos_d, axis=0)
            hi = jnp.max(v_pos_d, axis=0)
            pad = 0.05 * jnp.max(hi - lo)
            aabb_min = lo - pad
            aabb_size = (hi - lo) + 2 * pad
            res = shadow_grid_res
            ijk = jnp.clip(
                ((pts - aabb_min) / aabb_size * (res - 1)).astype(jnp.int32),
                0, res - 1,
            )
            occ = (
                jnp.zeros((res, res, res), jnp.float32)
                .at[ijk[:, 0], ijk[:, 1], ijk[:, 2]]
                .set(1.0)
            )
            vis_cfg, vis_consts = make_shadow_field_parts(
                occ, aabb_min, aabb_size
            )
            shadow_scale = 1.0
        else:
            vis_cfg, vis_consts = None, {}

        proj = gmath.perspective(np.deg2rad(fovy_deg), w / h, 0.1, 1000.0)
        for i in range(n_views):
            # random camera on a sphere
            v = rng.normal(size=3)
            v = v / np.linalg.norm(v)
            eye = jnp.asarray(v * cam_radius, jnp.float32)
            view = gmath.lookat(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
            mvp = proj @ view
            # render_seed: decorrelate the per-view MC noise between two
            # datasets with identical views (used by the PSNR-noise-floor
            # diagnostic); 0 reproduces the historical PRNGKey(i) exactly
            buf = render_view(
                jax.random.PRNGKey(i + 7919 * render_seed), mvp, eye,
                v_pos_d, t_idx_d, v_nrm_d, mat_params, light, vis_consts,
            )
            img = np.array(buf["shaded"])  # writable copy (np.asarray of a
            img[..., 0:3] *= img[..., 3:]  # jax array is read-only)
            mvps.append(np.asarray(mvp))
            camposs.append(np.asarray(eye))
            imgs.append(img)
            invdepths.append(np.asarray(buf["invdepth"][..., 0:1]))
            if layers > 1:
                img2 = np.array(buf["shaded_second"])
                img2[..., 0:3] *= img2[..., 3:]
                imgs2.append(img2)
                invdepths2.append(np.asarray(buf["invdepth_second"][..., 0:1]))
        self.mvp = np.stack(mvps)
        self.campos = np.stack(camposs)
        self.imgs = np.stack(imgs)
        self.invdepths = np.stack(invdepths)
        if layers > 1:
            self.imgs_second = np.stack(imgs2)
            self.invdepths_second = np.stack(invdepths2)
        self.resolution = flags.resolution
