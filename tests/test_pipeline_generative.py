"""Full generative pipeline smoke: fit-states → bake → train → sample →
decode to an OBJ mesh, via the actual CLIs (tiny sizes).

This is the integration path of SURVEY §3.3-3.4: tet_to_cubic_grid baking,
DDPM training with masks, DDIM sampling, and marching_from_auggrid decode.
"""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, **kw):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    r = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200, **kw
    )
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r


@pytest.mark.slow
def test_generative_pipeline(tmp_path):
    import jax
    import jax.numpy as jnp

    from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry

    res = 16
    # 1. synthesize a fitted state (sphere SDF + open-cut msdf)
    gcfg = GeometryConfig(grid_res=res, use_sdf_mlp=False, use_eikonal=False)
    geo = GShellGeometry(gcfg)
    params = geo.init_params(jax.random.PRNGKey(0))
    pos = jnp.asarray(geo.grid.verts)
    params["sdf"] = 0.3 - jnp.linalg.norm(pos, axis=-1)
    params["msdf"] = jnp.asarray(pos[:, 1] + 0.25)  # cut the bottom open
    state_dir = tmp_path / "states"
    state_dir.mkdir()
    with open(state_dir / "shape0.pkl", "wb") as f:
        pickle.dump({"params_geo": {k: np.asarray(v) for k, v in params.items()},
                     "grid_res": res}, f)

    # 2. bake to cubic grids
    baked = tmp_path / "baked"
    run(["bake_grids.py", "--states", str(state_dir / "*.pkl"),
         "--grid-res", str(res), "--out-dir", str(baked)])
    files = sorted(baked.glob("*.npz"))
    assert files, "bake produced no grids"
    z = np.load(files[0])
    # reference-shaped grids: feature side 2R, occ side 4R (128^3/256^3 at R=64)
    assert z["grid"].shape[0] == 2 * res and z["occgrid"].shape[0] == 4 * res
    dsz = 2 * res

    # 3. one training iteration + meta checkpoint
    work = tmp_path / "diff"
    run(["main_diffusion.py", "--mode", "train",
         "--data-glob", str(baked / "*.npz"), "--workdir", str(work),
         "--grid-size", str(dsz), "--batch", "1", "--grad-acc", "1",
         "--n-iters", "2", "--snapshot-freq", "1", "--log-freq", "1",
         "--base-channels", "8", "--ch-mult", "1,2"])
    assert (work / "checkpoints-meta").exists()

    # 4. sample (2 DDIM steps to keep it cheap)
    run(["main_diffusion.py", "--mode", "uncond_gen", "--workdir", str(work),
         "--grid-size", str(dsz), "--n-samples", "1",
         "--n-sampling-steps", "2", "--base-channels", "8", "--ch-mult", "1,2"])
    samples = sorted(work.glob("sample_*.npz"))
    assert samples

    # 5. decode samples to meshes
    out = tmp_path / "meshes"
    run(["eval_gmeshdiffusion.py", "--samples", str(work / "sample_*.npz"),
         "--grid-res", str(res), "--out-dir", str(out)])
    objs = sorted(out.glob("*.obj"))
    assert objs, "decode produced no meshes"
    # (an untrained model's sample may decode to an empty surface; the
    # contract here is that the pipeline runs end-to-end and writes OBJs)
