"""Two-process jax.distributed simulation of the multi-host diffusion path.

Launches two REAL processes on localhost (gRPC coordinator), each owning 4
virtual CPU devices of one 8-device global mesh — the CPU stand-in for a
2-host TPU pod. Each process loads only its own batch rows via
DistributedGridSampler and runs one jitted diffusion train step; the psum'd
loss must be finite and bitwise-identical across processes (the NCCL-DDP
parity check, ref trainer_ddp.py:22-187).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

coord, pid = sys.argv[1], int(sys.argv[2])
data_dir = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid,
    local_device_ids=list(range(4)),
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import glob
import jax.numpy as jnp
from gshell_tpu.data.multihost import DistributedGridSampler
from gshell_tpu.parallel.sharding import make_mesh
from gshell_tpu.models.unet3d import UNet3DConfig
from gshell_tpu.train.diffusion import DiffusionTrainConfig, DiffusionTrainer

d = 4
files = sorted(glob.glob(data_dir + "/*.npz"))
mesh = make_mesh(8)
unet_cfg = UNet3DConfig(
    data_ch=2, base_channels=8, ch_mult=(1, 2),
    down_block_types=("ResBlock", "AttnResBlock"),
    up_block_types=("AttnResBlock", "ResBlock"),
    num_res_blocks=1, num_res_blocks_1st_layer=1, dropout=0.0,
)
cfg = DiffusionTrainConfig(
    grid_size=d, data_ch=2, use_occ=True, num_grad_acc_steps=2, warmup=10
)
trainer = DiffusionTrainer(cfg, unet_cfg=unet_cfg, mesh=mesh)
state = trainer.init_state(jax.random.PRNGKey(0))
sampler = DistributedGridSampler(files, mesh, d, grad_acc=2, batch=8, seed=3)
batch = sampler()
# this process materialized only its own rows
local_rows = sum(
    np.prod(s.data.shape[:2]) for s in batch["grid"].addressable_shards
)
assert local_rows == 2 * 4, local_rows
state, m = trainer.train_step(state, jax.random.PRNGKey(1), batch)
loss = float(m["loss"])
assert np.isfinite(loss)
print(f"RESULT {pid} {loss:.9f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_diffusion(tmp_path):
    rng = np.random.default_rng(0)
    d = 4
    for i in range(4):
        np.savez(
            tmp_path / f"g{i}.npz",
            grid=rng.normal(size=(d, d, d, 2)).astype(np.float32),
            occgrid=rng.normal(size=(2 * d, 2 * d, 2 * d)).astype(np.float32),
        )
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se[-3000:]}"
    losses = {}
    for so, _ in outs:
        for line in so.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}
    assert losses[0] == losses[1], losses
