"""3D U-Net score network with dual (feature-grid, occ-grid) heads.

TPU-native twin of the reference G-MeshDiffusion score model
``GMeshDiffusion/lib/diffusion/models/unet3d_occgrid.py:37-203`` +
``models/layers.py`` (ResBlock, AttnBlock, Up/Downsample, GroupNormFloat32):

  * dual input: C-channel D³ feature grid + 1-channel (2D)³ occ grid folded
    in through a stride-2 conv (ref :92, :168), with learned mask embeddings
    (mask_layer / occ_mask_conv);
  * 6 levels, ch_mult (1,2,2,4,4,4), ResBlock / AttnResBlock per the config
    block-type lists, DDPM-style timestep embedding;
  * dual output heads: 5×5 conv (zero-init) for the grid + ×2
    ConvTranspose for the occ grid (ref :137-140, :196-201);
  * outputs masked by feature/occ masks.

TPU-first: channels-last (NDHWC) conv layout, bf16-friendly (GroupNorm kept
f32 as in the reference's GroupNormFloat32), attention via a single einsum
softmax over the ≤16³ bottleneck tokens.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_timestep_embedding(timesteps: jax.Array, embedding_dim: int, max_positions: int = 10000):
    """DDPM sinusoidal embedding (ref layers.py:142-157)."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def ddpm_init(scale: float = 1.0):
    """DDPM default_init: variance_scaling(scale, fan_avg, uniform)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


class GroupNormF32(nn.Module):
    """GroupNorm with f32 statistics (ref GroupNormFloat32, layers.py:28).

    Hand-rolled rather than ``x.astype(f32) -> nn.GroupNorm``: on a bf16
    activation the astype would make XLA materialize a full f32 copy of x as
    the reduce input (3 GB at 128³×384 — the top allocation in the 128³ OOM
    dump).  Here the two reductions accumulate in f32 directly from bf16 and
    the normalize+affine chain is elementwise, so the only materialized
    output is bf16."""

    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = math.gcd(self.num_groups, c)
        xr = x.reshape(x.shape[:-1] + (g, c // g))
        red = tuple(range(1, xr.ndim - 2)) + (xr.ndim - 1,)
        mean = jnp.mean(xr, axis=red, keepdims=True, dtype=jnp.float32)
        mean2 = jnp.mean(
            jnp.square(xr.astype(jnp.float32)), axis=red, keepdims=True
        )
        inv = jax.lax.rsqrt(jnp.maximum(mean2 - jnp.square(mean), 0.0) + self.eps)
        y = (xr.astype(jnp.float32) - mean) * inv
        y = y.reshape(x.shape)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (y * scale + bias).astype(x.dtype)


class ResBlock(nn.Module):
    """DDPM ResNet block (ref layers.py:230-...).

    ``skip`` (the U-Net lateral connection) is concatenated INSIDE the block
    rather than at the call site: under nn.remat the block's *arguments* are
    the saved residuals, and the skip tensor is already alive as a down-path
    value — passing it separately lets XLA alias it instead of storing a
    second copy inside a materialized concat (0.5 GB/block at 128³)."""

    out_ch: Optional[int] = None
    dropout: float = 0.1
    use_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False, skip=None):
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = nn.silu(GroupNormF32()(x))
        h = nn.Conv(out_ch, (3, 3, 3), kernel_init=ddpm_init(), dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=ddpm_init(), dtype=self.dtype)(
                nn.silu(temb)
            )[:, None, None, None, :]
        h = nn.silu(GroupNormF32()(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(out_ch, (3, 3, 3), kernel_init=ddpm_init(0.0), dtype=self.dtype)(h)
        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1, 1), kernel_init=ddpm_init(), dtype=self.dtype)(x)
        h = x + h
        if self.use_attn:
            h = AttnBlock(dtype=self.dtype)(h)
        return h


class AttnBlock(nn.Module):
    """Global 3D self-attention over voxels (ref layers.py:158-191).
    The reference materializes the (DHW)² softmax einsum; here it is a single
    fused dot-product attention over flattened tokens — XLA maps it onto the
    MXU (SURVEY.md §5.7)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        y = GroupNormF32()(x)
        q = nn.Conv(c, (1, 1, 1), kernel_init=ddpm_init(), dtype=self.dtype)(y).reshape(b, -1, c)
        k = nn.Conv(c, (1, 1, 1), kernel_init=ddpm_init(), dtype=self.dtype)(y).reshape(b, -1, c)
        v = nn.Conv(c, (1, 1, 1), kernel_init=ddpm_init(), dtype=self.dtype)(y).reshape(b, -1, c)
        attn = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
        attn = jax.nn.softmax(attn * (c ** -0.5), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v.astype(jnp.float32)).astype(x.dtype)
        out = out.reshape(b, d, h, w, c)
        out = nn.Conv(c, (1, 1, 1), kernel_init=ddpm_init(0.0), dtype=self.dtype)(out)
        return x + out


class Downsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if self.with_conv:
            # DDPM 'SAME' emulation: pad (0,1) on each spatial dim (ref layers.py:212-218)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(c, (3, 3, 3), strides=2, padding="VALID",
                           kernel_init=ddpm_init(), dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))


class Upsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        x = jax.image.resize(x, (b, d * 2, h * 2, w * 2, c), "nearest")
        if self.with_conv:
            x = nn.Conv(c, (3, 3, 3), kernel_init=ddpm_init(), dtype=self.dtype)(x)
        return x


def up_param_names(cfg: "UNet3DConfig", up_split: int,
                   up_split_blocks: int = 0) -> set:
    """Top-level param-tree keys owned by the ``segment='up'`` half at a
    given ``up_split`` — mirrors the module's construction-counter logic.
    Used by the segmented trainer to differentiate w.r.t. ONLY the up
    subtree (the full-tree gradient is ~1.6 GB of mostly zeros at the
    reference UNet; the subtree at split 5 is ~30 MB)."""
    n_levels = len(cfg.down_block_types)
    prefix = "CheckpointResBlock" if cfg.remat else "ResBlock"

    def up_nrb(i):
        return (
            cfg.num_res_blocks_1st_layer
            if i == n_levels - 1
            else cfg.num_res_blocks
        )

    n_down = cfg.num_res_blocks_1st_layer + (n_levels - 1) * cfg.num_res_blocks
    start = (n_down + 2 + sum(up_nrb(i) + 1 for i in range(up_split))
             + up_split_blocks)
    total = n_down + 2 + sum(up_nrb(i) + 1 for i in range(n_levels))
    names = {f"{prefix}_{k}" for k in range(start, total)}
    names |= {f"Upsample_{i}" for i in range(up_split, n_levels - 1)}
    names |= {"GroupNormF32_0", "Conv_4"}
    if cfg.use_occ:
        names.add("ConvTranspose_0")
    return names


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    data_ch: int = 4
    base_channels: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 4)
    down_block_types: Sequence[str] = (
        "ResBlock", "ResBlock", "ResBlock", "AttnResBlock", "ResBlock", "ResBlock"
    )
    up_block_types: Sequence[str] = (
        "ResBlock", "ResBlock", "AttnResBlock", "ResBlock", "ResBlock", "ResBlock"
    )
    num_res_blocks: int = 2
    num_res_blocks_1st_layer: int = 2
    dropout: float = 0.1
    resamp_with_conv: bool = True
    use_occ: bool = True
    # TPU memory policy: rematerialize ResBlocks in the backward and compute
    # in bf16 (GroupNorm stays f32 — ref GroupNormFloat32); params stay f32.
    remat: bool = False
    compute_dtype: str = "float32"


class UNet3D(nn.Module):
    """Returns (grid_score, occ_score) — ref unet3d_occgrid.py:145-203.

    ``segment``: 'all' (default) runs the whole network.  'down' runs the
    stem + down path + middle — plus the first ``up_split`` up LEVELS (the
    low-resolution half; moving them into the first segment balances the
    two programs' compile load) — and returns ``(h, hs, temb)`` with the
    not-yet-consumed skips; 'up' takes those as ``h_in``/``hs_in``/
    ``temb_in`` and runs up levels ``up_split:`` + the heads.
    Every submodule carries an EXPLICIT name equal to its historical
    auto-assigned name, so the parameter tree is byte-identical across
    segments and with pre-refactor checkpoints.  Motivation: the axon
    remote-compile helper crashes on the monolithic 128³ fwd+bwd program
    (HTTP 500 regardless of remat/occ-head; 96³ compiles) — the segmented
    trainer (train/diffusion.py) compiles down/up backward as two
    half-sized programs."""

    cfg: UNet3DConfig

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],  # (B, D, D, D, C) feature grid, NDHWC
        occ: Optional[jax.Array],  # (B, 2D, 2D, 2D, 1) occ grid
        timesteps: Optional[jax.Array],  # (B,) int/float labels
        feature_mask: Optional[jax.Array] = None,  # (1, D, D, D, C)
        pixcat_mask: Optional[jax.Array] = None,  # (1, D, D, D, 1)
        occ_mask: Optional[jax.Array] = None,  # (1, 2D, 2D, 2D, 1)
        train: bool = False,
        segment: str = "all",
        h_in: Optional[jax.Array] = None,
        hs_in: Optional[tuple] = None,
        temb_in: Optional[jax.Array] = None,
        up_split: int = 0,
        up_split_blocks: int = 0,
    ):
        cfg = self.cfg
        nf = cfg.base_channels
        cdt = jnp.dtype(cfg.compute_dtype)
        assert segment in ("all", "down", "up"), segment
        if cfg.remat:
            Res = nn.remat(ResBlock, static_argnums=(3,))
            res_prefix = "CheckpointResBlock"
        else:
            Res = ResBlock
            res_prefix = "ResBlock"
        n_levels = len(cfg.down_block_types)
        # deterministic construction counter so 'up' blocks keep their
        # historical names without constructing the 'down' blocks
        n_down_blocks = cfg.num_res_blocks_1st_layer + (
            n_levels - 1
        ) * cfg.num_res_blocks

        def up_nrb(i_level):
            return (
                cfg.num_res_blocks_1st_layer
                if i_level == n_levels - 1
                else cfg.num_res_blocks
            )

        assert 0 <= up_split < n_levels, up_split
        assert 0 <= up_split_blocks <= up_nrb(up_split), up_split_blocks
        n_pre_up = sum(up_nrb(i) + 1 for i in range(up_split)) + up_split_blocks
        res_k = (
            0
            if segment in ("all", "down")
            else n_down_blocks + 2 + n_pre_up
        )

        if segment in ("all", "down"):
            x = x.astype(cdt)
            if occ is not None:
                occ = occ.astype(cdt)
            if feature_mask is None:
                feature_mask = jnp.ones(
                    (1,) + x.shape[1:4] + (x.shape[-1],), x.dtype
                )
            if pixcat_mask is None:
                pixcat_mask = jnp.ones((1,) + x.shape[1:4] + (1,), x.dtype)

            x = x * feature_mask
            temb = get_timestep_embedding(timesteps, nf)
            temb = nn.Dense(
                nf * 4, kernel_init=ddpm_init(), dtype=cdt, name="Dense_0"
            )(temb)
            temb = nn.Dense(
                nf * 4, kernel_init=ddpm_init(), dtype=cdt, name="Dense_1"
            )(nn.silu(temb))

            h = nn.Conv(
                nf, (5, 5, 5), kernel_init=ddpm_init(), dtype=cdt, name="Conv_0"
            )(x)
            h = h + nn.Conv(
                nf, (5, 5, 5), kernel_init=ddpm_init(), dtype=cdt, name="Conv_1"
            )(jnp.broadcast_to(pixcat_mask, (x.shape[0],) + pixcat_mask.shape[1:]))
            if cfg.use_occ and occ is not None:
                if occ_mask is None:
                    occ_mask = jnp.ones((1,) + occ.shape[1:4] + (1,), occ.dtype)
                occ = occ * occ_mask
                h = h + nn.Conv(
                    nf, (3, 3, 3), strides=2, kernel_init=ddpm_init(),
                    dtype=cdt, name="Conv_2",
                )(occ)
                h = h + nn.Conv(
                    nf, (3, 3, 3), strides=2, kernel_init=ddpm_init(),
                    dtype=cdt, name="Conv_3",
                )(jnp.broadcast_to(occ_mask, (x.shape[0],) + occ_mask.shape[1:]))

            # Downsampling
            hs = [h]
            for i_level, btype in enumerate(cfg.down_block_types):
                nrb = (
                    cfg.num_res_blocks_1st_layer
                    if i_level == 0
                    else cfg.num_res_blocks
                )
                for _ in range(nrb):
                    h = Res(
                        out_ch=nf * cfg.ch_mult[i_level],
                        dropout=cfg.dropout,
                        use_attn=(btype == "AttnResBlock"),
                        dtype=cdt,
                        name=f"{res_prefix}_{res_k}",
                    )(hs[-1], temb, train)
                    res_k += 1
                    hs.append(h)
                if i_level != n_levels - 1:
                    hs.append(
                        Downsample(
                            cfg.resamp_with_conv, dtype=cdt,
                            name=f"Downsample_{i_level}",
                        )(hs[-1])
                    )

            # Middle
            h = hs[-1]
            h = Res(
                dropout=cfg.dropout, use_attn=True, dtype=cdt,
                name=f"{res_prefix}_{res_k}",
            )(h, temb, train)
            res_k += 1
            h = Res(
                dropout=cfg.dropout, dtype=cdt, name=f"{res_prefix}_{res_k}"
            )(h, temb, train)
            res_k += 1

            if segment == "down":
                # run the first up_split (low-res) up levels here too —
                # balances the two segment programs' compile load — plus
                # up_split_blocks LEADING blocks of level up_split (block-
                # granular boundary: the last level's three 128³ blocks are
                # where the residency peaks)
                for i_level in range(up_split):
                    btype = cfg.up_block_types[i_level]
                    for _ in range(up_nrb(i_level) + 1):
                        h = Res(
                            out_ch=nf * cfg.ch_mult[n_levels - i_level - 1],
                            dropout=cfg.dropout,
                            use_attn=(btype == "AttnResBlock"),
                            dtype=cdt,
                            name=f"{res_prefix}_{res_k}",
                        )(h, temb, train, hs.pop())
                        res_k += 1
                    if i_level != n_levels - 1:
                        h = Upsample(
                            cfg.resamp_with_conv, dtype=cdt,
                            name=f"Upsample_{i_level}",
                        )(h)
                btype = cfg.up_block_types[up_split]
                for _ in range(up_split_blocks):
                    h = Res(
                        out_ch=nf * cfg.ch_mult[n_levels - up_split - 1],
                        dropout=cfg.dropout,
                        use_attn=(btype == "AttnResBlock"),
                        dtype=cdt,
                        name=f"{res_prefix}_{res_k}",
                    )(h, temb, train, hs.pop())
                    res_k += 1
                return h, tuple(hs), temb
        else:
            h = h_in.astype(cdt)
            hs = [hi.astype(cdt) for hi in hs_in]
            temb = temb_in.astype(cdt)
            if feature_mask is None or occ_mask is None:
                raise ValueError(
                    "segment='up' needs explicit feature_mask/occ_mask (the "
                    "defaults are derived from x/occ, absent here)"
                )

        # Upsampling
        up_start = up_split if segment == "up" else 0
        for i_level in range(up_start, n_levels):
            btype = cfg.up_block_types[i_level]
            skip_lead = (
                up_split_blocks
                if (segment == "up" and i_level == up_split)
                else 0
            )
            for _ in range(up_nrb(i_level) + 1 - skip_lead):
                # skip passed separately; concat happens inside the (rematted)
                # block so the saved residual aliases the live down-path value
                h = Res(
                    out_ch=nf * cfg.ch_mult[n_levels - i_level - 1],
                    dropout=cfg.dropout,
                    use_attn=(btype == "AttnResBlock"),
                    dtype=cdt,
                    name=f"{res_prefix}_{res_k}",
                )(h, temb, train, hs.pop())
                res_k += 1
            if i_level != n_levels - 1:
                h = Upsample(
                    cfg.resamp_with_conv, dtype=cdt, name=f"Upsample_{i_level}"
                )(h)

        assert not hs
        h = nn.silu(GroupNormF32(name="GroupNormF32_0")(h))
        grid = nn.Conv(
            cfg.data_ch, (5, 5, 5), kernel_init=ddpm_init(0.0), dtype=cdt,
            name="Conv_4",
        )(h)
        grid = grid.astype(jnp.float32) * feature_mask

        grid_occ = None
        if cfg.use_occ and (occ is not None or segment == "up"):
            # torch ConvTranspose3d(k=4, s=2, p=1) ≡ exact ×2 upsample; flax
            # 'SAME' padding gives the same in·stride output extent.
            grid_occ = nn.ConvTranspose(
                1, (4, 4, 4), strides=(2, 2, 2), padding="SAME",
                kernel_init=ddpm_init(), dtype=cdt, name="ConvTranspose_0",
            )(h)
            grid_occ = grid_occ.astype(jnp.float32) * occ_mask
        return grid, grid_occ
