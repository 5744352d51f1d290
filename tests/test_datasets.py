"""Dataset loaders on synthetic fixtures (no real data needed)."""
import json
import os

import numpy as np
import pytest

from gshell_tpu.data.datasets import (
    DatasetDeepFashion,
    DatasetNeRF,
    GShellGridDataset,
    load_K_Rt_from_P,
    make_splits,
)


def test_load_K_Rt_roundtrip():
    # build P = K [R | t] and recover
    K = np.array([[500.0, 0, 256], [0, 500, 256], [0, 0, 1]])
    th = 0.3
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    C = np.array([0.5, -0.2, 3.0])  # camera center
    t = -R @ C
    P = K @ np.concatenate([R, t[:, None]], axis=1)
    intr, pose = load_K_Rt_from_P(P)
    np.testing.assert_allclose(intr[:3, :3] / intr[2, 2], K / K[2, 2], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pose[:3, :3], R.T, atol=1e-5)
    np.testing.assert_allclose(pose[:3, 3], C, atol=1e-4)


@pytest.fixture
def fake_deepfashion(tmp_path):
    import imageio.v2 as imageio

    n = 3
    cams = {}
    K = np.array([[400.0, 0, 32], [0, 400, 32], [0, 0, 1]])
    for i in range(n):
        th = i * 0.5
        R = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
        C = -R.T @ np.array([0, 0, 3.0])
        t = -R @ C
        P = K @ np.concatenate([R, t[:, None]], 1)
        world = np.eye(4, dtype=np.float32)
        world[:3, :4] = P
        cams[f"world_mat_{i}"] = world
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
        img = (np.random.rand(64, 64, 4) * 255).astype(np.uint8)
        imageio.imwrite(str(tmp_path / f"{i:03d}.png"), img)
    np.savez(str(tmp_path / "cameras_sphere.npz"), **cams)
    return str(tmp_path), n


def test_deepfashion_loader(fake_deepfashion):
    path, n = fake_deepfashion
    ds = DatasetDeepFashion(path, train_res=(64, 64), n_images=n)
    assert len(ds) == n
    batch = ds.batch(np.asarray([0, 1]))
    assert batch["mvp"].shape == (2, 4, 4)
    assert batch["img"].shape == (2, 64, 64, 4)
    assert np.isfinite(np.asarray(batch["campos"])).all()
    # camera distance ≈ 3
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(batch["campos"]), axis=-1), 3.0, rtol=0.05
    )


def test_nerf_loader(tmp_path):
    import imageio.v2 as imageio

    frames = []
    for i in range(2):
        name = f"r_{i}"
        imageio.imwrite(
            str(tmp_path / f"{name}.png"),
            (np.random.rand(32, 32, 4) * 255).astype(np.uint8),
        )
        xf = np.eye(4)
        xf[2, 3] = 4.0
        frames.append({"file_path": name, "transform_matrix": xf.tolist()})
    cfg = {"camera_angle_x": 0.7, "frames": frames}
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(cfg, f)
    ds = DatasetNeRF(str(tmp_path / "transforms_train.json"), train_res=(32, 32))
    assert len(ds) == 2
    b = ds.batch(np.asarray([1]), background="white")
    assert b["img"].shape == (1, 32, 32, 4)


def test_grid_dataset_and_splits(tmp_path):
    files = []
    for i in range(5):
        p = str(tmp_path / f"g{i}.npz")
        np.savez(p, grid=np.zeros((4, 4, 4, 2), np.float32), occgrid=np.zeros((8, 8, 8), np.float32))
        files.append(p)
    tr, te = make_splits(files, 0.8)
    assert len(tr) == 4 and len(te) == 1
    ds = GShellGridDataset(tr)
    batch = ds.sample_batch(np.random.default_rng(0), 2)
    assert batch["grid"].shape == (2, 4, 4, 4, 2)
    assert batch["occgrid"].shape == (2, 8, 8, 8, 1)


def test_dataset_mesh_shadowed_gt_darker():
    """GT-parity shadows (Flags.gt_shadows): a DatasetMesh built with
    shadows=True renders the GT through the same swept-shadow-field path
    training uses, so shadowed foreground pixels must be strictly darker on
    average than the shadow-free GT of the identical scene.  (Shadow-free GT
    paired with shadowed training makes the optimizer over-brighten
    materials — the round-4 root cause of the 512² quality plateau.)"""
    import jax
    import jax.numpy as jnp

    from gshell_tpu.data.datasets import DatasetMesh
    from gshell_tpu.render.light import create_trainable_env_rnd
    from gshell_tpu.render.material import (
        MLPTexture3DConfig,
        default_kd_ks_min_max,
        init_mlp_texture,
    )
    from gshell_tpu.render.mesh import load_obj, unit_size
    from gshell_tpu.render.render import RenderFlags
    from gshell_tpu.ops.hashgrid import HashGridConfig

    # deep open bowl: strong self-shadowing (a convex sphere has almost none)
    import tempfile

    nu, nv = 24, 10
    lines = []
    for i in range(nv + 1):
        th = 0.5 * np.pi * (0.35 + 0.65 * i / nv)  # lower cap only: open bowl
        for j in range(nu):
            ph = 2 * np.pi * j / nu
            lines.append(
                "v %f %f %f"
                % (np.sin(th) * np.cos(ph), -np.cos(th), np.sin(th) * np.sin(ph))
            )
    for i in range(nv):
        for j in range(nu):
            a = i * nu + j + 1
            b = i * nu + (j + 1) % nu + 1
            c = (i + 1) * nu + (j + 1) % nu + 1
            d = (i + 1) * nu + j + 1
            lines.append(f"f {a} {b} {c}")
            lines.append(f"f {a} {c} {d}")
    with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
        f.write("\n".join(lines))
        path = f.name

    try:
        mesh = unit_size(load_obj(path))
    finally:
        os.unlink(path)
    mat_cfg = MLPTexture3DConfig(
        channels=6, hash=HashGridConfig(n_levels=4, log2_table_size=10),
        min_max=default_kd_ks_min_max(),
    )
    mat = init_mlp_texture(jax.random.PRNGKey(43), mat_cfg)
    light = create_trainable_env_rnd(jax.random.PRNGKey(42), 32)
    flags = RenderFlags(resolution=(48, 48), n_samples=2, bsdf="pbr",
                        use_denoiser=False)

    kw = dict(n_views=2, seed=5, cam_radius=2.5)
    ds_free = DatasetMesh(mesh, light, mat, mat_cfg, flags, **kw)
    ds_shad = DatasetMesh(mesh, light, mat, mat_cfg, flags, shadows=True,
                          shadow_grid_res=33, **kw)

    fg = ds_free.imgs[..., 3:] > 0.5
    mean_free = float((ds_free.imgs[..., :3] * fg).sum() / fg.sum())
    mean_shad = float((ds_shad.imgs[..., :3] * fg).sum() / fg.sum())
    assert np.isfinite(mean_free) and np.isfinite(mean_shad)
    # same scene, same views, same RNG — only the shadow field differs
    assert mean_shad < mean_free * 0.98, (mean_shad, mean_free)
