"""Trainable FlexiCubes geometry wrapper.

Twin of ``geometry/gshell_flexicubes_geometry.py:45-364``
(GShellFlexiCubesGeometry): same interface as :class:`GShellGeometry` but
over a voxel grid with per-cube FlexiCubes weights (N_cubes, 21) =
β(12) ++ α(8) ++ γ(1) (ref :96-97), ``max_displacement`` = mean edge length/4
(ref :117), and the L_dev regularizer weighted ×0.25 in the loss (ref :358).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..render import regularizer as reg
from ..render.render import RenderFlags, render_mesh
from .cube_grid import CubeGrid, build_cube_grid
from .geometry import GeometryConfig
from .gshell_flexicubes import FlexiMesh, GShellFlexiCubes
from .mlp import apply_mlp, init_mlp


@dataclasses.dataclass(frozen=True)
class FlexiGeometryConfig(GeometryConfig):
    grid_res: int = 80  # voxel-80 config (configs/deepfashion_mc_80.json)
    l_dev_weight: float = 0.25


class GShellFlexiGeometry:
    def __init__(self, cfg: FlexiGeometryConfig, grid: CubeGrid | None = None):
        self.cfg = cfg
        self.grid = grid if grid is not None else build_cube_grid(cfg.grid_res)
        self.extractor = GShellFlexiCubes(self.grid, cfg.max_tets, cfg.max_verts)
        boxscale = np.asarray(cfg.boxscale, np.float32)
        base = self.grid.verts - self.grid.verts.mean(axis=0)
        self.verts = jnp.asarray(base * cfg.scale * boxscale)
        self.boxscale = jnp.asarray(boxscale)
        # ref :117 — quarter of the mean grid edge length
        self.max_displacement = (cfg.scale / cfg.grid_res) / 4.0
        self.grid_edges = jnp.asarray(self.grid.edges.astype(np.int32))

    def init_params(self, key: jax.Array) -> dict:
        n = self.grid.n_verts
        c = self.grid.n_cubes
        k1, k2 = jax.random.split(key)
        params = {
            "deform": jnp.zeros((n, 3)),
            "cube_weights": jnp.zeros((c, 21)),  # ref :96-97 zero-init
        }
        if self.cfg.use_sdf_mlp:
            params["sdf_net"] = init_mlp(k1, self.cfg.mlp)
        else:
            scaled = self.verts / self.boxscale
            # FlexiCubes sign convention: inside < 0
            params["sdf"] = 0.5 - jnp.linalg.norm(scaled, axis=-1)
            params["sdf"] = -params["sdf"]
        params["msdf"] = jnp.clip(jax.random.uniform(k2, (n,)) - 0.01, -1.0, 1.0)
        return params

    def pretrain_sdf(self, params: dict, steps: int = 1000, lr: float = 1e-3) -> dict:
        """Sphere-init the SDF MLP.  FlexiCubes convention: inside < 0, so the
        target is +(|x| − r) directly (cf. GShellGeometry.pretrain_sdf)."""
        if not self.cfg.use_sdf_mlp:
            return params
        import optax

        cfg = self.cfg
        verts = self.verts
        scaled = verts / self.boxscale
        target = (
            jnp.linalg.norm(scaled, axis=-1, keepdims=True) - cfg.sphere_init_norm
        )
        opt = optax.adam(lr)

        @jax.jit
        def step(p, s):
            def loss_fn(p):
                out = apply_mlp(p, verts, cfg.mlp)
                return jnp.mean((out - target) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(p)
            upd, s = opt.update(g, s)
            return optax.apply_updates(p, upd), s, loss

        net = params["sdf_net"]
        state = opt.init(net)
        for _ in range(steps):
            net, state, _ = step(net, state)
        return {**params, "sdf_net": net}

    def fields(self, params: dict):
        v_def = self.verts + self.max_displacement * params["deform"]
        if self.cfg.use_sdf_mlp:
            sdf = apply_mlp(params["sdf_net"], v_def, self.cfg.mlp)[:, 0]
        else:
            sdf = params["sdf"]
        msdf = params["msdf"]
        return v_def, sdf, msdf

    def get_mesh(self, params: dict, training: bool = True) -> FlexiMesh:
        v_def, sdf, msdf = self.fields(params)
        w = params["cube_weights"]
        return self.extractor(
            v_def, sdf, msdf, beta=w[:, :12], alpha=w[:, 12:20], gamma=w[:, 20],
            training=training,
        )

    def clamp_params(self, params: dict) -> dict:
        out = dict(params)
        out["deform"] = jnp.clip(params["deform"], -1.0, 1.0)
        if "msdf" in params:
            out["msdf"] = jnp.clip(params["msdf"], -2.0, 2.0)
        return out

    def sdf_lattice(self, params: dict) -> jax.Array:
        """Framework shadow convention is inside > 0 — negate FlexiCubes'
        inside<0 field."""
        _, sdf, _ = self.fields(params)
        r = self.cfg.grid_res + 1
        return (-sdf).reshape(r, r, r)

    def tick(self, key, params, mat_params, mat_cfg, light, target, iteration,
             flags: RenderFlags, image_loss_fn, visibility_fn=None,
             shadow_scale=1.0, denoiser_sigma=2.0, spatial_mesh=None):
        """Same loss structure as GShellGeometry.tick + L_dev×0.25 (ref :358).

        ``spatial_mesh``: (view × band) device-mesh sharding of the RENDER,
        same structure as the tets path (geometry.py tick); FlexiCubes
        extraction itself stays replicated (the r2 banded formula: render/N +
        replicated extraction)."""
        cfg = self.cfg
        mesh = self.get_mesh(params, training=True)
        v_def, sdf, msdf = self.fields(params)
        from ..ops.mesh_ops import compact_faces

        faces_c, fvalid_c, n_faces = compact_faces(
            mesh.faces, mesh.face_valid, cap=4 * self.extractor.max_edges
        )

        keys = jax.random.split(key, target["mvp"].shape[0] + 1)
        k_render, k_eik = keys[:-1], keys[-1]
        second = cfg.use_img_2nd_layer or cfg.use_depth_2nd_layer

        def render_one_impl(
            k, mvp, campos, bg, flags_, verts, faces, v_nrm, msdf_v,
            mat_p, light_, vis_fn, sh_scale, dn_sigma,
        ):
            buffers = render_mesh(
                k, verts, faces, v_nrm, msdf_v,
                mat_p, mat_cfg, mvp, campos, light_, flags_,
                background=bg, visibility_fn=vis_fn,
                shadow_scale=sh_scale, denoiser_sigma=dn_sigma,
            )
            if second:
                from ..render.render import render_second_layer

                buffers.update(
                    render_second_layer(
                        k, verts, faces, v_nrm,
                        mat_p, mat_cfg, mvp, campos, light_, flags_,
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
            # (view × band) sharding — identical machinery to the tets tick
            # (geometry.py): scene state rides the consts pytree; shard_map's
            # transpose psums the gradients.
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
            render_fn = lambda args: render_one(*args)
            if target["mvp"].shape[0] > 1:
                render_fn = jax.checkpoint(render_fn)
            buffers = jax.lax.map(
                render_fn,
                (k_render, target["mvp"], target["campos"], target["background"]),
            )

        color_ref = target["img"]
        gt_mask = color_ref[..., 3:]
        img_loss = jnp.mean((buffers["shaded"][..., 3:] - gt_mask) ** 2)
        img_loss += image_loss_fn(
            buffers["shaded"][..., 0:3] * gt_mask, color_ref[..., 0:3] * gt_mask
        )
        msdf_img = buffers["msdf_image"]
        img_loss += 5e-1 * jnp.mean(jnp.abs(jnp.clip(msdf_img, min=0.0) * (gt_mask == 0)))
        img_loss += 5e-1 * jnp.mean(
            jnp.abs(jnp.clip(msdf_img, max=0.0) * (gt_mask == 1) - 1.0)
        )

        # Second-layer image + depth losses (ref :266-279; shared helper)
        img_extra, depth_loss = reg.second_layer_and_depth_losses(
            cfg, buffers, target, image_loss_fn
        )
        img_loss += img_extra

        # Eikonal on surface samples (ref gshell_flexicubes_geometry.py:284-300)
        if cfg.use_sdf_mlp and cfg.use_eikonal:
            from ..ops.mesh_ops import sample_surface
            from .mlp import apply_mlp as _apply_mlp

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
                return _apply_mlp(params["sdf_net"], p[None], cfg.mlp)[0, 0]

            grads = jax.vmap(jax.grad(sdf_at))(pts)
            eik_loss = eik_coeff * jnp.mean(
                (jnp.sqrt(jnp.clip(jnp.sum(grads**2, -1), min=1e-12)) - 1.0) ** 2
            )
        else:
            eik_loss = 0.0

        # mSDF open/close regularizers (shared with tets path)
        mesh_msdf_regscale = (64.0 / cfg.grid_res) ** 3
        eps = 1e-3

        def huber_sum(x, tgt):
            d = jnp.abs(x - tgt)
            return jnp.sum(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))

        msdf_reg = 0.0
        if cfg.msdf_reg_open_scale > 0:
            msdf_reg += cfg.msdf_reg_open_scale * mesh_msdf_regscale * huber_sum(
                jnp.clip(mesh.msdf, min=-eps), -eps
            )
        if cfg.msdf_reg_close_scale != 0:
            vis_any = jnp.any(buffers["visible_vert_mask"], axis=0)
            nwt = mesh.n_verts_watertight
            vis_boundary = jax.lax.stop_gradient(vis_any[nwt:])
            d = jnp.abs(jnp.clip(mesh.msdf_boundary, max=eps) - eps)
            h = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
            msdf_reg += cfg.msdf_reg_close_scale * mesh_msdf_regscale * jnp.sum(
                h * vis_boundary
            )

        t_iter = iteration / cfg.total_iters
        sdf_weight = cfg.sdf_regularizer - (cfg.sdf_regularizer - 0.01) * jnp.minimum(
            1.0, 4.0 * t_iter
        )
        sdf_reg = reg.sdf_reg_loss(sdf, self.grid_edges) * sdf_weight

        shading_reg = 0.0
        if "diffuse_light" in buffers:
            shading_reg += reg.shading_loss(
                buffers["diffuse_light"], buffers["specular_light"], color_ref,
                cfg.lambda_diffuse, cfg.lambda_specular,
            )
        shading_reg += reg.material_smoothness_grad(
            buffers["kd_grad"], buffers["ks_grad"], buffers["normal_grad"],
            lambda_kd=cfg.lambda_kd, lambda_ks=cfg.lambda_ks, lambda_nrm=cfg.lambda_nrm,
        )
        shading_reg += reg.chroma_loss(buffers["kd"], color_ref, cfg.lambda_chroma)

        l_dev_loss = cfg.l_dev_weight * mesh.l_dev
        reg_loss = sdf_reg + eik_loss + msdf_reg + shading_reg + l_dev_loss
        aux = {
            "n_surf_cubes": mesh.n_surf_cubes,
            "n_faces": n_faces,
            "raster_dropped": jnp.sum(buffers["n_raster_dropped"]),
            "px_dropped": jnp.sum(buffers.get("n_px_dropped", jnp.zeros((), jnp.int32)))
            + jnp.sum(buffers.get("n_px_dropped_second", jnp.zeros((), jnp.int32))),
            "l_dev": mesh.l_dev,
            "sdf_reg": sdf_reg,
            "eik_loss": eik_loss,
            "msdf_reg": msdf_reg,
            "shading_reg": shading_reg,
        }
        return img_loss, depth_loss, reg_loss, aux
