"""gshell_tpu — a TPU-native (JAX/XLA/Pallas) framework for G-Shell.

G-Shell ("Ghost on the Shell", ICLR 2024) is a differentiable representation of
general — watertight AND non-watertight — 3D shapes.  This package rebuilds the
full capability surface of the reference implementation (lzzcd001/GShell) as an
idiomatic TPU framework:

  * ``gshell_tpu.geometry`` — G-Shell marching tetrahedra and FlexiCubes
    iso-surface extraction with mSDF open-surface cutting, as statically-shaped
    jittable programs (reference: ``geometry/gshell_tets.py``,
    ``geometry/gshell_flexicubes.py``).
  * ``gshell_tpu.ops`` — the compute kernels that the reference implements in
    CUDA (nvdiffrast rasterization, renderutils BSDFs, OptiX Monte-Carlo
    environment shading, tiny-cuda-nn hash grids, SVGF denoiser), rebuilt as
    jnp/Pallas ops with custom VJPs where needed.
  * ``gshell_tpu.render`` — differentiable render orchestration: mesh → image
    buffers (reference: ``render/render.py``).
  * ``gshell_tpu.models`` — the G-MeshDiffusion generative subsystem: 3D U-Net
    score model, VPSDE, PC/DDIM samplers, EMA (reference: ``GMeshDiffusion/``).
  * ``gshell_tpu.parallel`` — device-mesh sharding (data/fsdp/spatial) over
    ICI/DCN via ``jax.sharding`` — the TPU-native replacement for the
    reference's NCCL DDP.
  * ``gshell_tpu.train`` — reconstruction and diffusion training loops.
"""

__version__ = "0.1.0"
