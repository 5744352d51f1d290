"""Multi-host input pipeline — per-process shard loading.

TPU-native analogue of the reference's ``DistributedSampler`` + per-rank
DataLoader (``GMeshDiffusion/lib/diffusion/trainer_ddp.py:79-83``): under
``jax.distributed`` every process loads ONLY the rows of the global batch
that land on its addressable devices, and the global ``jax.Array`` is
assembled from the per-device shards without any cross-host transfer of
input data (XLA never gathers the batch to one host).

Works unchanged in single-process mode (every device is addressable, so the
one process loads everything) — ``main_diffusion.py`` uses this loader for
both cases.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def make_global_batch(
    sharding: NamedSharding, global_shape: tuple, fill_fn: Callable
) -> jax.Array:
    """Assemble a globally-sharded array from process-local loads.

    ``fill_fn(index: tuple[slice, ...]) -> np.ndarray`` materializes the
    requested sub-block of the global array.  It is called once per
    addressable device, with exactly that device's shard index — on a
    multi-host mesh each process therefore touches only its own rows (the
    ``DistributedSampler`` contract, ref trainer_ddp.py:79-83).
    """
    idx_map = sharding.addressable_devices_indices_map(global_shape)
    arrays = [jax.device_put(fill_fn(idx), dev) for dev, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(global_shape, sharding, arrays)


class DistributedGridSampler:
    """Seed-synchronized random sampler over baked grid ``.npz`` files.

    Every process draws the SAME file indices per step (identical seeded
    RNG — the stateless twin of DistributedSampler's epoch-seeded shuffle),
    then loads only the files backing its addressable batch rows.  Yields
    the ``{'grid', 'occgrid'}`` global batch dict consumed by
    ``DiffusionTrainer.train_step``.
    """

    def __init__(
        self,
        files: Sequence[str],
        mesh,
        grid_size: int,
        grad_acc: int,
        batch: int,
        seed: int = 0,
        axis: str = "data",
        start_step: int = 0,
    ):
        assert files, "no grid files"
        self.files = list(files)
        self.grad_acc, self.batch = grad_acc, batch
        d = grid_size
        self.shapes = {
            "grid": (grad_acc, batch, d, d, d, -1),
            "occgrid": (grad_acc, batch, 2 * d, 2 * d, 2 * d, 1),
        }
        self.sharding = NamedSharding(mesh, P(None, axis))
        self.seed = seed
        self.step = start_step
        self._cache_shape = None

    def _resolve_channels(self):
        # peek one file to fix the feature channel count (global shapes must
        # be concrete for the shard index map)
        z = np.load(self.files[0])
        g = z["grid"]
        self.shapes["grid"] = self.shapes["grid"][:-1] + (g.shape[-1],)

    def __call__(self) -> dict:
        if self.shapes["grid"][-1] == -1:
            self._resolve_channels()
        # same draws on every process: seed ⊕ step
        rng = np.random.default_rng((self.seed, self.step))
        idx = rng.integers(len(self.files), size=self.grad_acc * self.batch)
        self.step += 1
        loaded: dict[int, dict] = {}

        def row(fi: int, name: str) -> np.ndarray:
            if fi not in loaded:
                loaded[fi] = dict(np.load(self.files[fi]))
            v = loaded[fi][name if name == "grid" else "occgrid"]
            return v[..., None] if name == "occgrid" and v.ndim == 3 else v

        out = {}
        for name, shape in self.shapes.items():
            def fill(block, name=name, shape=shape):
                acc_sl, b_sl = block[0], block[1]
                rows = []
                for a in range(*acc_sl.indices(shape[0])):
                    for b in range(*b_sl.indices(shape[1])):
                        rows.append(row(int(idx[a * self.batch + b]), name))
                a0, a1, _ = acc_sl.indices(shape[0])
                b0, b1, _ = b_sl.indices(shape[1])
                return (
                    np.stack(rows)
                    .reshape((a1 - a0, b1 - b0) + shape[2:])
                    .astype(np.float32)
                )

            out[name] = make_global_batch(self.sharding, shape, fill)
        return out
