"""Trainable G-Shell geometry: parameters, mesh extraction, and the training
loss ("tick").

TPU-native twin of ``geometry/gshell_tets_geometry.py`` (GShellTetsGeometry):
owns the trainable fields (per-vertex SDF or an SDF MLP, mSDF, deformation),
extracts the open-surface mesh through :class:`GShellTets`, renders it, and
assembles the full reference loss:

  image MSE+mask loss + mSDF image hinges (ref :280-285),
  Eikonal on sampled surface points (ref :302-324),
  mSDF open/close huber regularizers with visibility masking (ref :326-358),
  annealed SDF sign-consistency BCE (ref :360-362),
  monochrome-shading / material-smoothness / chroma regularizers (ref :364-376).

Everything returned by :func:`tick` is a scalar inside one jittable graph —
the whole reference training step (extract → rasterize → shade → losses)
compiles to a single XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mesh_ops import sample_surface
from ..render import regularizer as reg
from ..render.render import RenderFlags, render_mesh
from .gshell_tets import GShellMesh, GShellTets
from .mlp import MLPConfig, apply_mlp, init_mlp
from .tet_grid import TetGrid, build_tet_grid, default_capacities


@dataclasses.dataclass(frozen=True)
class GeometryConfig:
    grid_res: int = 64
    scale: float = 1.4  # FLAGS.mesh_scale
    boxscale: tuple = (1.0, 1.0, 1.0)
    use_sdf_mlp: bool = True
    use_msdf_mlp: bool = False
    mlp: MLPConfig = MLPConfig(n_freq=6, d_hidden=256, n_hidden=6, skip_in=(3,))
    sphere_init_norm: float = 0.5
    watertight: bool = False  # True → NeRF-synthetic style closed shapes
    # loss weights (reference defaults, train_gshelltet_deepfashion.py:532-580)
    msdf_reg_open_scale: float = 1e-6
    msdf_reg_close_scale: float = 3e-6
    sdf_regularizer: float = 0.2
    eikonal_scale: Optional[float] = None
    lambda_kd: float = 0.1
    lambda_ks: float = 0.05
    lambda_nrm: float = 0.025
    lambda_chroma: float = 0.0
    lambda_diffuse: float = 0.15
    lambda_specular: float = 0.0025
    use_eikonal: bool = True
    n_eikonal_samples: int = 50000
    # depth / second-layer supervision (ref FLAGS use_depth /
    # use_img_2nd_layer / use_depth_2nd_layer, defaults False,
    # train_gshelltet_deepfashion.py:577-579; losses at
    # gshell_tets_geometry.py:287-299)
    use_depth: bool = False
    use_img_2nd_layer: bool = False
    use_depth_2nd_layer: bool = False
    total_iters: int = 5000
    # How a multi-view batch renders inside tick:
    #   'map_remat' — sequential lax.map, per-view rematerialization
    #                 (lowest memory; backward re-renders each view)
    #   'map'       — sequential lax.map, residuals kept (faster, more HBM)
    #   'vmap'      — vmap over views (XLA batches the whole pipeline)
    view_batch_mode: str = "map_remat"
    # Lazy-gradient field evaluation (MLP fields only): evaluate the dense
    # lattice field once WITHOUT gradient (occupancy/signs/shadows carry
    # none — `sdf > 0` is a step function) and re-evaluate the MLP only at
    # the ~2·V crossing-edge endpoints for the gradient-carrying values.
    # At res 256 this cuts the differentiated field eval from 17M lattice
    # rows to ~1.6M; the sign-consistency BCE moves to the equivalent
    # crossing-edge-slot form (regularizer.sdf_reg_loss_edges).
    lazy_field_grad: bool = True
    # Extraction slot-budget multiplier (default_capacities safety): the
    # per-slot extraction tail scales linearly with MT/V.  1.0 carries
    # ≈2.5-3× headroom over measured iso-surface usage; 0.5 still covers
    # the stress cases and halves the tail.  CAUTION: with lazy_field_grad,
    # the crossing-edge slot budget (max_verts) also bounds the edge set of
    # sdf_reg_loss_edges — on overflow that LOSS silently drops edges the
    # dense lattice BCE would cover, degrading training, not just
    # extraction.  The tick surfaces `tet_slot_overflow`/`edge_slot_overflow`
    # aux flags as hard monitors; keep them at 0.
    capacity_safety: float = 1.0
    # Shard the extractor's per-slot stages over the spatial mesh (GSPMD
    # constraints; see GShellTets.__call__ shard_mesh). Only active when a
    # spatial mesh is passed to tick; measured no compile-time penalty on
    # the 8-device CPU mesh and bitwise-equal losses.
    shard_extraction: bool = True
    # extraction capacities (None → default O(res²) budget)
    max_tets: Optional[int] = None
    max_verts: Optional[int] = None


class GShellGeometry:
    """Static state (grid, extractor, config) + functional param API."""

    def __init__(self, cfg: GeometryConfig, grid: TetGrid | None = None):
        self.cfg = cfg
        if grid is None:
            # Topology tables only serve the generative bake/decode tooling
            # (res ≤ 128 grids); the extractor indexes the lattice
            # analytically and the SDF regularizer runs on volume slices —
            # above 128 the tables alone would cost ~4 GB.
            grid = build_tet_grid(cfg.grid_res, build_topology=cfg.grid_res <= 128)
        # lattice_verts() regenerates positions analytically from
        # cfg.grid_res with the standard linspace layout — a custom grid
        # must match it, or the MLP fields would be evaluated at positions
        # inconsistent with the extractor's lattice indexing.
        assert grid.res == cfg.grid_res, (
            f"custom TetGrid res {grid.res} != cfg.grid_res {cfg.grid_res}; "
            "custom grids must use the standard linspace lattice layout"
        )
        self.grid = grid
        mt, mv = cfg.max_tets, cfg.max_verts
        if (mt is None or mv is None) and cfg.capacity_safety != 1.0:
            d_t, d_v = default_capacities(
                grid.res, grid.n_tets, grid.n_edges, safety=cfg.capacity_safety
            )
            mt, mv = mt or d_t, mv or d_v
        self.extractor = GShellTets(self.grid, mt, mv)
        boxscale = np.asarray(cfg.boxscale, np.float32)
        base = self.grid.verts - self.grid.verts.mean(axis=0)
        self.verts = jnp.asarray(base * cfg.scale * boxscale)
        self.boxscale = jnp.asarray(boxscale)
        # ref gshell_tets_geometry.py:155
        self.max_displacement = 1.0 / cfg.grid_res * cfg.scale / 2.1

    # ---------------- parameters ----------------
    def init_params(self, key: jax.Array) -> dict:
        n = self.grid.n_verts
        k1, k2, k3 = jax.random.split(key, 3)
        params: dict[str, Any] = {
            "deform": jnp.zeros((n, 3)),
        }
        if self.cfg.use_sdf_mlp:
            params["sdf_net"] = init_mlp(k1, self.cfg.mlp)
        else:
            scaled = self.verts / self.boxscale
            params["sdf"] = jnp.linalg.norm(scaled, axis=-1) - 0.5
        if self.cfg.use_msdf_mlp:
            params["msdf_net"] = init_mlp(k2, self.cfg.mlp)
        else:
            params["msdf"] = jnp.clip(
                jax.random.uniform(k3, (n,)) - 0.01, -1.0, 1.0
            )
        return params

    def pretrain_sdf(
        self, params: dict, steps: int = 1000, lr: float = 1e-3, seed: int = 7
    ) -> dict:
        """Sphere-init the SDF MLP (ref gshell_tets_geometry.py:98-105).
        ``seed`` controls the pretrain minibatch sampling stream."""
        if not self.cfg.use_sdf_mlp:
            return params
        import optax

        cfg = self.cfg
        opt = optax.adam(lr)
        # Minibatched on random points in the lattice box: the sphere target
        # is analytic, so fitting needs no lattice verts at all — and a
        # full-lattice step at res 256 is 17M×d_hidden activations (17 GB).
        n_pts = min(self.grid.n_verts, 1 << 18)
        scale_vec = self.cfg.scale * self.boxscale

        @jax.jit
        def step(p, s, k):
            base = jax.random.uniform(k, (n_pts, 3), jnp.float32, -0.5, 0.5)
            verts = base * scale_vec
            scaled = verts / self.boxscale
            target = (
                jnp.linalg.norm(scaled, axis=-1, keepdims=True)
                - cfg.sphere_init_norm
            )

            def loss_fn(p):
                out = apply_mlp(p, verts, cfg.mlp)
                return jnp.mean((out - target) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(p)
            upd, s = opt.update(g, s)
            return optax.apply_updates(p, upd), s, loss

        net = params["sdf_net"]
        state = opt.init(net)
        key = jax.random.PRNGKey(seed)
        for _ in range(steps):
            key, k = jax.random.split(key)
            net, state, loss = step(net, state, k)
        return {**params, "sdf_net": net}

    # ---------------- field evaluation ----------------
    # Dense-lattice MLP evals above this row count run as a lax.map over
    # row chunks: one (rows, d_hidden) activation at res 256 is 17M×256×4
    # = 17 GB — far beyond HBM — while chunked eval is O(chunk·d_hidden).
    _FIELD_CHUNK = 1 << 19

    def _apply_field_chunked(self, net, pts: jax.Array) -> jax.Array:
        chunk = self._FIELD_CHUNK
        n = pts.shape[0]
        if n <= chunk:
            return apply_mlp(net, pts, self.cfg.mlp)[:, 0]
        pad = (-n) % chunk
        p = jnp.pad(pts, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        out = jax.lax.map(lambda c: apply_mlp(net, c, self.cfg.mlp)[:, 0], p)
        return out.reshape(-1)[:n]

    def lattice_verts(self) -> jax.Array:
        """In-graph twin of ``self.verts``: the scaled lattice positions
        generated from ``linspace``/``meshgrid`` INSIDE the traced program.
        Jitted code must use this instead of closing over ``self.verts`` —
        a closed-over concrete array is baked into the HLO as a literal,
        which is (res+1)³×3 f32 ≈ 200 MB at res 256 (the axon
        remote-compile endpoint rejects such programs outright)."""
        n = self.cfg.grid_res + 1
        axis = jnp.linspace(-0.5, 0.5, n, dtype=jnp.float32)
        axis = axis - jnp.mean(axis)  # == (verts - verts.mean(0)) per axis
        gx, gy, gz = jnp.meshgrid(axis, axis, axis, indexing="ij")
        base = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        return base * (self.cfg.scale * self.boxscale)

    def fields(self, params: dict):
        """(v_deformed, sdf, msdf) — ref getMesh (:191-204)."""
        v_def = self.lattice_verts() + self.max_displacement * params["deform"]
        if self.cfg.use_sdf_mlp:
            sdf = self._apply_field_chunked(params["sdf_net"], v_def)
        else:
            sdf = params["sdf"]
        if self.cfg.use_msdf_mlp:
            msdf = self._apply_field_chunked(params["msdf_net"], v_def)
        else:
            msdf = params["msdf"]
        return v_def, sdf, msdf

    def fields_lazy(self, params: dict):
        """Lazy-gradient variant of :meth:`fields` for the training tick:
        MLP fields are evaluated densely WITHOUT gradient (the extractor
        reads only signs from the dense arrays) plus per-point evaluator
        closures the extractor calls at the crossing-edge endpoints for the
        gradient-carrying values.  Returns
        ``(v_def, sdf, msdf, sdf_fn, msdf_fn)`` where the fns are None for
        direct (non-MLP) fields."""
        cfg = self.cfg
        v_def = self.lattice_verts() + self.max_displacement * params["deform"]
        v_sg = jax.lax.stop_gradient(v_def)
        sdf_fn = msdf_fn = None
        # At large grids the crossing-endpoint eval is itself ~10⁶ rows:
        # remat it so the backward re-computes the MLP instead of keeping
        # (rows, d_hidden) residuals per layer (~5 GB at res 256).
        big = self.grid.n_verts > self._FIELD_CHUNK

        def _maybe_remat(f):
            return jax.checkpoint(f) if big else f

        if cfg.use_sdf_mlp:
            net = params["sdf_net"]
            sdf = jax.lax.stop_gradient(self._apply_field_chunked(net, v_sg))
            sdf_fn = _maybe_remat(lambda pts: apply_mlp(net, pts, cfg.mlp)[:, 0])
        else:
            sdf = params["sdf"]
        if cfg.use_msdf_mlp:
            mnet = params["msdf_net"]
            msdf = jax.lax.stop_gradient(self._apply_field_chunked(mnet, v_sg))
            msdf_fn = _maybe_remat(lambda pts: apply_mlp(mnet, pts, cfg.mlp)[:, 0])
        else:
            msdf = params["msdf"]
        return v_def, sdf, msdf, sdf_fn, msdf_fn

    def get_mesh(self, params: dict) -> GShellMesh:
        v_def, sdf, msdf = self.fields(params)
        return self.extractor(
            v_def, sdf, msdf, watertight_template=True
        )

    def sdf_lattice(self, params: dict) -> jax.Array:
        """SDF on the (res+1)³ lattice.  SIGN: the sphere pretrain fits
        ``‖x‖ − r`` (``pretrain_sdf``), so the trained field is
        inside-NEGATIVE (standard distance) — measured on the skirt_q4
        state: min −0.17 inside, max 0.77 at the box corners.  An earlier
        docstring here claimed inside-positive (misreading ref occ_n), and
        the shadow builders trusted it — the occluder grid marked the
        EXTERIOR as solid and every shaded pixel went black once the shadow
        ramp hit 1.0 (the 16 dB ceiling of the q3/q4 quality runs).  Shadow
        callers must pass occupancy = (this < 0); the default training
        shadow source is now the cut-mesh surface splat (tick
        ``visibility_fn='mesh_splat'``), which has no sign ambiguity and —
        unlike any template-SDF proxy — matches the reference's occluder
        (OptiX BVH over the CUT mesh: mSDF-discarded faces and ghost
        template regions do not occlude there either)."""
        _, sdf, _ = self.fields(params)
        r = self.cfg.grid_res + 1
        return sdf.reshape(r, r, r)

    def splat_occupancy(
        self, key, verts, faces, face_valid, res: int = 65,
        n_samples: int = 1 << 17,
    ):
        """0/1 occupancy lattice of the CUT surface (valid faces only) over
        the geometry box — the training-side twin of DatasetMesh's GT
        splat (datasets.py gt_shadows).  stop-gradient: visibility carries
        no gradients in the reference either (kernel.cu:97-99)."""
        import numpy as np

        from ..ops.mesh_ops import sample_surface

        half = 0.5 * self.cfg.scale * np.asarray(self.boxscale, np.float32)
        amin = jnp.asarray(-half)
        asz = jnp.asarray(2 * half)
        pts = sample_surface(
            key, jax.lax.stop_gradient(verts), faces, n_samples,
            face_mask=face_valid,
        )
        ijk = jnp.clip(
            ((pts - amin) / asz * (res - 1)).astype(jnp.int32), 0, res - 1
        )
        occ = (
            jnp.zeros((res, res, res), jnp.float32)
            .at[ijk[:, 0], ijk[:, 1], ijk[:, 2]]
            .set(1.0)
        )
        return occ, tuple((-half).tolist()), tuple((2 * half).tolist())

    def clamp_params(self, params: dict) -> dict:
        """Post-step clamps (ref clamp_deform :161-165)."""
        out = dict(params)
        out["deform"] = jnp.clip(params["deform"], -1.0, 1.0)
        if "msdf" in params:
            out["msdf"] = jnp.clip(params["msdf"], -2.0, 2.0)
        return out

    # ---------------- losses ----------------
    def tick(
        self,
        key: jax.Array,
        params: dict,
        mat_params,
        mat_cfg,
        light,
        target: dict,
        iteration: jax.Array,
        flags: RenderFlags,
        image_loss_fn: Callable,
        visibility_fn=None,
        shadow_scale=1.0,
        denoiser_sigma=2.0,
        spatial_mesh=None,
        shadow_ko: int = 16,
    ):
        """One training evaluation → (img_loss, depth_loss, reg_loss, aux).

        ``target``: dict with 'mvp' (B,4,4), 'campos' (B,3), 'img' (B,H,W,4)
        premultiplied-alpha reference, 'background' (B,H,W,3); optionally
        'img_second'/'invdepth'/'invdepth_second' (B,H,W,·) when the
        corresponding cfg.use_* supervision flags are on.
        """
        cfg = self.cfg
        if cfg.lazy_field_grad and (cfg.use_sdf_mlp or cfg.use_msdf_mlp):
            v_def, sdf, msdf, sdf_fn, msdf_fn = self.fields_lazy(params)
        else:
            v_def, sdf, msdf = self.fields(params)
            sdf_fn = msdf_fn = None
        mesh = self.extractor(
            v_def, sdf, msdf, watertight_template=True,
            compute_aug_normals=False, compute_tangents=False,
            shard_mesh=spatial_mesh if cfg.shard_extraction else None,
            sdf_fn=sdf_fn, msdf_fn=msdf_fn,
        )
        # Compact the slot-addressed face buffer (4 slots/tet, ~2.2 real)
        # before rasterization — the coverage scan costs per SLOT — and
        # compute smooth normals over the compacted faces.
        from ..ops.mesh_ops import auto_normals as _auto_normals
        from ..ops.mesh_ops import compact_faces

        faces_c, fvalid_c, n_faces = compact_faces(
            mesh.faces, mesh.face_valid, cap=self.extractor.max_tets
        )
        mesh = mesh._replace(v_nrm=_auto_normals(mesh.verts, faces_c, fvalid_c))

        keys = jax.random.split(key, target["mvp"].shape[0] + 3)
        k_render, k_eik, k_splat = keys[:-3], keys[-3], keys[-2]

        if visibility_fn == "mesh_splat":
            # Shadow the scene with the CUT mesh itself (reference parity:
            # the OptiX BVH is built over the extracted cut mesh,
            # gshell_tets_geometry.py:206-211) — a per-step surface-splat
            # occupancy + swept directional field.  Any template-SDF proxy
            # occludes with mSDF-discarded faces and ghost sdf<0 regions
            # the reference's shadows never see.
            from ..ops.shade import make_shadow_field_parts

            occ, amin, asz = self.splat_occupancy(
                k_splat, mesh.verts, faces_c, fvalid_c
            )
            visibility_fn = make_shadow_field_parts(
                occ, amin, asz, ko=shadow_ko
            )

        second = cfg.use_img_2nd_layer or cfg.use_depth_2nd_layer

        def render_one_impl(
            k, mvp, campos, bg, flags_, verts, faces, v_nrm, msdf_v,
            mat_p, light_, vis_fn, sh_scale, dn_sigma,
        ):
            buffers = render_mesh(
                k, verts, faces, v_nrm, msdf_v, mat_p, mat_cfg,
                mvp, campos, light_, flags_,
                background=bg,
                visibility_fn=vis_fn,
                shadow_scale=sh_scale,
                denoiser_sigma=dn_sigma,
            )
            if second:
                # 2nd depth layer (ref num_layers=2 peel; losses
                # gshell_tets_geometry.py:287-297)
                from ..render.render import render_second_layer

                buffers.update(
                    render_second_layer(
                        k, verts, faces, v_nrm, mat_p, mat_cfg,
                        mvp, campos, light_, flags_,
                        background=bg, shadow_scale=sh_scale,
                        visibility_fn=vis_fn,
                    )
                )
            return buffers

        def render_one(k, mvp, campos, bg):
            return render_one_impl(
                k, mvp, campos, bg, flags, mesh.verts, faces_c, mesh.v_nrm,
                mesh.msdf, mat_params, light, visibility_fn,
                shadow_scale, denoiser_sigma,
            )

        if spatial_mesh is not None:
            # (view × band) device-mesh sharding: every device renders one
            # view's row band (SURVEY.md §5.7; VERDICT r1 #3).  All traced
            # scene state travels through the consts pytree — shard_map
            # in_specs P() marks it replicated and its transpose psums the
            # gradients (the NCCL-all-reduce analogue).
            from ..parallel.spatial import render_batch_banded

            if visibility_fn is not None and not isinstance(visibility_fn, tuple):
                raise TypeError(
                    "the banded path needs visibility_fn as a (cfg, consts) "
                    "tuple (the traced consts travel through shard_map); a "
                    "bare callable cannot cross the shard boundary"
                )
            vis_cfg = visibility_fn[0] if isinstance(visibility_fn, tuple) else None
            consts = {
                "verts": mesh.verts,
                "v_nrm": mesh.v_nrm,
                "msdf": mesh.msdf,
                "faces": faces_c,
                "mat": mat_params,
                "light": light,
                "vis": visibility_fn[1] if vis_cfg is not None else {},
                "shadow_scale": jnp.asarray(shadow_scale, jnp.float32),
                "denoiser_sigma": jnp.asarray(denoiser_sigma, jnp.float32),
            }

            def render_band(c, k, mvp_b, campos_b, bg_b, band_res):
                vfn = (vis_cfg, c["vis"]) if vis_cfg is not None else None
                return render_one_impl(
                    k, mvp_b, campos_b, bg_b,
                    flags._replace(resolution=band_res),
                    c["verts"], c["faces"], c["v_nrm"], c["msdf"],
                    c["mat"], c["light"], vfn,
                    c["shadow_scale"], c["denoiser_sigma"],
                )

            nb = spatial_mesh.shape["band"]
            keys_vb = jax.vmap(lambda kk: jax.random.split(kk, nb))(k_render)
            if jnp.issubdtype(keys_vb.dtype, jax.dtypes.prng_key):
                keys_vb = jax.random.key_data(keys_vb)
            buffers = render_batch_banded(
                spatial_mesh,
                render_band,
                consts,
                keys_vb,
                target["mvp"],
                target["campos"],
                target["background"],
                flags.resolution,
            )
        else:
            mode = cfg.view_batch_mode
            if mode == "vmap":
                buffers = jax.vmap(render_one)(
                    k_render, target["mvp"], target["campos"], target["background"]
                )
            else:
                render_fn = lambda args: render_one(*args)
                if mode == "map_remat" and target["mvp"].shape[0] > 1:
                    render_fn = jax.checkpoint(render_fn)
                buffers = jax.lax.map(
                    render_fn,
                    (k_render, target["mvp"], target["campos"], target["background"]),
                )

        color_ref = target["img"]
        gt_mask = color_ref[..., 3:]

        # image + mask loss (ref :280-281)
        img_loss = jnp.mean((buffers["shaded"][..., 3:] - gt_mask) ** 2)
        img_loss += image_loss_fn(
            buffers["shaded"][..., 0:3] * gt_mask, color_ref[..., 0:3] * gt_mask
        )

        # mSDF image hinges (ref :284-285)
        msdf_img = buffers["msdf_image"]
        img_loss += 5e-1 * jnp.mean(
            jnp.abs(jnp.clip(msdf_img, min=0.0) * (gt_mask == 0))
        )
        img_loss += 5e-1 * jnp.mean(
            jnp.abs(jnp.clip(msdf_img, max=0.0) * (gt_mask == 1) - 1.0)
        )

        # Second-layer image + depth losses (ref :287-299; shared helper)
        img_extra, depth_loss = reg.second_layer_and_depth_losses(
            cfg, buffers, target, image_loss_fn
        )
        img_loss += img_extra

        # Eikonal (ref :302-324)
        if cfg.use_sdf_mlp and cfg.use_eikonal:
            pts = sample_surface(
                k_eik,
                jax.lax.stop_gradient(mesh.verts),
                faces_c,
                cfg.n_eikonal_samples,
                face_mask=fvalid_c,
            )
            if cfg.eikonal_scale is None:
                eik_coeff = jnp.where(
                    iteration < 500, 3e-1, jnp.where(iteration < 2000, 1e-1, 1e-2)
                )
            else:
                eik_coeff = cfg.eikonal_scale

            def sdf_at(p):
                return apply_mlp(params["sdf_net"], p[None], cfg.mlp)[0, 0]

            grads = jax.vmap(jax.grad(sdf_at))(pts)
            eik_loss = eik_coeff * jnp.mean(
                (jnp.sqrt(jnp.clip(jnp.sum(grads**2, -1), min=1e-12)) - 1.0) ** 2
            )
        else:
            eik_loss = 0.0

        # mSDF open/close regularizers (ref :326-358)
        mesh_msdf_regscale = (64.0 / cfg.grid_res) ** 3
        eps = 1e-3

        def huber_sum(x, tgt, delta=1.0):
            d = jnp.abs(x - tgt)
            return jnp.sum(jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta)))

        msdf_reg = 0.0
        if cfg.msdf_reg_open_scale > 0:
            msdf_reg += (
                cfg.msdf_reg_open_scale
                * mesh_msdf_regscale
                * huber_sum(jnp.clip(mesh.msdf, min=-eps), -eps)
            )
        if cfg.msdf_reg_close_scale != 0:
            vis_any = jnp.any(buffers["visible_vert_mask"], axis=0)
            nwt = mesh.n_verts_watertight
            vis_boundary = jax.lax.stop_gradient(vis_any[nwt:])
            bm = mesh.msdf_boundary
            d = jnp.abs(jnp.clip(bm, max=eps) - eps)
            h = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
            msdf_reg += (
                cfg.msdf_reg_close_scale
                * mesh_msdf_regscale
                * jnp.sum(h * vis_boundary)
            )

        # SDF sign-consistency BCE, annealed (ref :360-362)
        t_iter = iteration / cfg.total_iters
        sdf_weight = cfg.sdf_regularizer - (cfg.sdf_regularizer - 0.01) * jnp.minimum(
            1.0, 4.0 * t_iter
        )
        r1 = cfg.grid_res + 1
        if sdf_fn is not None:
            # lazy-grad path: the dense lattice SDF is stop-gradiented, so
            # the BCE must read the gradient-carrying crossing-edge values
            # (same edge set, same mean — see sdf_reg_loss_edges).
            sdf_reg = reg.sdf_reg_loss_edges(mesh.edge_sdf) * sdf_weight
        else:
            sdf_reg = reg.sdf_reg_loss_lattice(sdf.reshape(r1, r1, r1)) * sdf_weight

        # Shading regularizers (ref :364-376)
        shading_reg = 0.0
        if "diffuse_light" in buffers:
            shading_reg += reg.shading_loss(
                buffers["diffuse_light"],
                buffers["specular_light"],
                color_ref,
                cfg.lambda_diffuse,
                cfg.lambda_specular,
            )
        shading_reg += reg.material_smoothness_grad(
            buffers["kd_grad"],
            buffers["ks_grad"],
            buffers["normal_grad"],
            lambda_kd=cfg.lambda_kd,
            lambda_ks=cfg.lambda_ks,
            lambda_nrm=cfg.lambda_nrm,
        )
        shading_reg += reg.chroma_loss(buffers["kd"], color_ref, cfg.lambda_chroma)

        reg_loss = sdf_reg + eik_loss + msdf_reg + shading_reg
        aux = {
            "n_valid_tets": mesh.n_valid_tets,
            "n_faces": n_faces,
            "n_crossing_edges": mesh.n_crossing_edges,
            "raster_dropped": jnp.sum(buffers["n_raster_dropped"]),
            # Hard slot-budget monitors (capacity_safety < 1 shrinks these
            # budgets; on edge-slot overflow the lazy-grad path's
            # sdf_reg_loss_edges silently drops edges the dense lattice BCE
            # would cover — watch these when lowering capacity_safety).
            "tet_slot_overflow": (
                mesh.n_valid_tets >= self.extractor.max_tets
            ).astype(jnp.int32),
            "edge_slot_overflow": (
                mesh.n_crossing_edges >= self.extractor.max_verts
            ).astype(jnp.int32),
            "px_dropped": jnp.sum(buffers.get("n_px_dropped", jnp.zeros((), jnp.int32)))
            + jnp.sum(buffers.get("n_px_dropped_second", jnp.zeros((), jnp.int32))),
            "sdf_reg": sdf_reg,
            "eik_loss": eik_loss,
            "msdf_reg": msdf_reg,
            "shading_reg": shading_reg,
        }
        # reference tick returns (img_loss, depth_loss, reg_loss)
        # (gshell_tets_geometry.py:384)
        return img_loss, depth_loss, reg_loss, aux
