"""Device-mesh sharding — the TPU-native distributed backend.

Replaces the reference's NCCL DistributedDataParallel stack
(``GMeshDiffusion/lib/diffusion/trainer_ddp.py:22-187``,
``models/utils.py:93-101``; SURVEY.md §2.6): instead of 8 processes with
explicit all-reduce, ONE jitted program over a ``jax.sharding.Mesh`` with a
``data`` axis — XLA inserts the gradient ``psum`` over ICI automatically.
Optional FSDP-style parameter sharding over the same axis is a free
capability gain beyond the reference's pure DP.

Multi-host: the same program runs under ``jax.distributed.initialize`` with
the mesh spanning all processes (DCN between slices).  Grad accumulation is a
``lax.scan`` over microbatches (replaces ``no_sync()``; reduction happens
once per jitted step — SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def init_multihost(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Multi-host initialization (DCN between slices) — the counterpart of
    ``dist.init_process_group('nccl')`` + torchrun env plumbing
    (``trainer_ddp.py:30-37``).  With TPU pod metadata available this is a
    bare ``jax.distributed.initialize()``; arguments are for manual setups."""
    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding for input batches."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_sharding(mesh: Mesh, params, axis_name: str = "data", min_size: int = 2**16):
    """Shard each large parameter's biggest divisible axis over the mesh —
    simple FSDP-style layout (capability beyond the reference's DP)."""
    n = mesh.shape[axis_name]

    def spec_for(p):
        if p.ndim == 0 or p.size < min_size:
            return NamedSharding(mesh, P())
        # choose the largest axis divisible by n
        order = sorted(range(p.ndim), key=lambda i: -p.shape[i])
        for ax in order:
            if p.shape[ax] % n == 0:
                spec = [None] * p.ndim
                spec[ax] = axis_name
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    sh = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


# ---------------------------------------------------------------------------
# Multi-slice (DCN) layout
# ---------------------------------------------------------------------------


def make_mesh_multislice(
    n_slices: int,
    devices_per_slice: Optional[int] = None,
    axis_names: tuple = ("dcn", "data"),
) -> Mesh:
    """2-axis mesh for multi-slice training: leading ``dcn`` axis across
    slices (data-center network), trailing ``data`` axis within a slice
    (ICI).  The mesh-major ordering matters: ``jax.devices()`` enumerates
    devices slice-contiguously under ``jax.distributed.initialize``, so rows
    of the device array align with physical slices and XLA's hierarchical
    collectives reduce over ICI first, DCN once per slice.

    Pure-DP batches shard over BOTH axes (:func:`multislice_data_sharding`);
    FSDP parameter sharding stays within the ``data`` (ICI) axis —
    cross-slice parameter gathers over DCN would dominate step time."""
    devs = jax.devices()
    per = devices_per_slice or len(devs) // n_slices
    arr = np.asarray(devs[: n_slices * per]).reshape(n_slices, per)
    return Mesh(arr, axis_names)


def multislice_data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch sharding over the combined (dcn × data) device grid."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))
