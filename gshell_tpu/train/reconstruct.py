"""Inverse-rendering (multiview reconstruction) trainer.

TPU-native twin of ``train_gshelltet_deepfashion.py:278-500`` (optimize_mesh):
the whole step — mesh extraction, rasterization, MC shading, losses, three
Adam groups with exponential LR falloff, the reference's gradient tweaks
(light ×64, hash-grid ÷8; ref :432-437), and post-step clamps — is ONE jitted
function.  The reference's per-iteration Python/CUDA ping-pong disappears;
XLA fuses extraction + render + backward into a single TPU program.

Optimizer groups (ref :300-343):
  geometry  — Adam; deform @ lr_pos, msdf @ lr_pos (×1e-2 if msdf MLP),
              sdf_net @ lr_pos·1e-2
  material  — Adam @ lr_mat   (hash tables get grad ÷ 8)
  light     — Adam @ lr_lgt   (grads × 64), clamped ≥ 1e-4 after each step
  LR schedule: 10^(−0.0002·iter)  (ref lr_schedule :305-308)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..geometry.geometry import GeometryConfig, GShellGeometry
from ..ops.image_loss import create_loss
from ..ops.shade import make_sdf_visibility_parts, make_shadow_field_parts
from ..render.light import update_pdf
from ..render.material import MLPTexture3DConfig, MLPTexture3DParams
from ..render.render import RenderFlags


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr_pos: float = 0.03
    lr_mat: float = 0.005
    lr_lgt: Optional[float] = None  # default lr_mat·6 — wait: ref lr·6 of base
    loss: str = "logl1"
    iters: int = 5000
    batch: int = 2
    shadow_ramp_iters: int = 1000  # ref tick :264
    use_shadows: bool = True
    shadow_grid_res: int = 64
    # 'field': swept directional shadow field (1 gather/query; TPU-fast);
    # 'march': per-ray occupancy marching (n_steps gathers/query)
    shadow_method: str = "field"
    shadow_ko: int = 16  # octahedral bins per side for 'field'
    # Occluder volume: 'mesh_splat' (default) = surface-splat occupancy of
    # the extracted CUT mesh, rebuilt every step inside tick — the
    # reference's occluder is the OptiX BVH over the SAME cut mesh.  'sdf'
    # = legacy template-SDF proxy; it occludes with mSDF-discarded and
    # ghost template regions, and (the round-5 root cause) the trained SDF
    # is inside-NEGATIVE, so it must be negated before the occupancy test.
    shadow_source: str = "mesh_splat"


def _lr_schedule(base: float):
    return lambda count: base * 10.0 ** (-count * 0.0002)


class TrainState(NamedTuple):
    params_geo: dict
    params_mat: MLPTexture3DParams
    light_base: jax.Array
    opt_geo: optax.OptState
    opt_mat: optax.OptState
    opt_lgt: optax.OptState
    step: jax.Array


class Reconstructor:
    def __init__(
        self,
        geometry: GShellGeometry,
        mat_cfg: MLPTexture3DConfig,
        flags: RenderFlags,
        tcfg: TrainConfig = TrainConfig(),
        mesh=None,
    ):
        """``mesh``: optional 2-axis ``jax.sharding.Mesh`` ("view", "band").
        When given, every device renders one view's horizontal row band
        (halo-padded; see ``parallel/spatial.render_batch_banded``) — the
        multi-chip path that delivers the v5e-8 targets.  Requires
        ``tcfg.batch == mesh.shape['view']`` and the image height divisible
        by ``mesh.shape['band']``."""
        self.geo = geometry
        self.mat_cfg = mat_cfg
        self.flags = flags
        self.tcfg = tcfg
        self.mesh = mesh
        if mesh is not None:
            assert tuple(mesh.axis_names) == ("view", "band"), mesh.axis_names
            assert tcfg.batch == mesh.shape["view"], (tcfg.batch, dict(mesh.shape))
            assert flags.resolution[0] % mesh.shape["band"] == 0
        self.image_loss_fn = create_loss(tcfg.loss)

        lr_lgt = tcfg.lr_lgt if tcfg.lr_lgt is not None else tcfg.lr_pos * 6.0

        # geometry: per-group lrs via masked chains (ref :327-337)
        def group(lr, predicate):
            return optax.masked(optax.adam(_lr_schedule(lr), eps=1e-8), predicate)

        g = geometry.cfg
        lr_msdf = tcfg.lr_pos * (1e-2 if g.use_msdf_mlp else 1.0)
        self.tx_geo = optax.chain(
            group(tcfg.lr_pos, lambda p: _mask(p, {"deform"})),
            group(lr_msdf, lambda p: _mask(p, {"msdf", "msdf_net"})),
            group(tcfg.lr_pos * 1e-2, lambda p: _mask(p, {"sdf", "sdf_net"})),
        )
        # material: hash tables grad ÷8 (ref :435) then Adam
        self.tx_mat = optax.chain(
            _scale_tables(1.0 / 8.0), optax.adam(_lr_schedule(tcfg.lr_mat), eps=1e-8)
        )
        # light: grad ×64 (ref :433) then Adam
        self.tx_lgt = optax.chain(
            optax.scale(64.0), optax.adam(_lr_schedule(lr_lgt), eps=1e-8)
        )

        # world AABB of the deformed lattice, for shadow-ray marching
        import numpy as np

        half = 0.5 * g.scale * np.asarray(g.boxscale)
        self.aabb_min = tuple((-half).tolist())
        self.aabb_size = tuple((2 * half).tolist())

    def init_state(self, key: jax.Array, pretrain_steps: int = 1000) -> TrainState:
        k1, k2, k3 = jax.random.split(key, 3)
        from ..render.material import init_mlp_texture

        params_geo = self.geo.init_params(k1)
        if self.geo.cfg.use_sdf_mlp and pretrain_steps > 0:
            params_geo = self.geo.pretrain_sdf(params_geo, steps=pretrain_steps)
        params_mat = init_mlp_texture(k2, self.mat_cfg)
        light_base = jax.random.uniform(k3, (512, 512, 3)) * 0.5 + 0.25
        return TrainState(
            params_geo=params_geo,
            params_mat=params_mat,
            light_base=light_base,
            opt_geo=self.tx_geo.init(params_geo),
            opt_mat=self.tx_mat.init(params_mat),
            opt_lgt=self.tx_lgt.init(light_base),
            step=jnp.zeros((), jnp.int32),
        )

    @partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, key: jax.Array, target: dict):
        tcfg = self.tcfg
        it = state.step
        shadow_scale = jnp.minimum(it / tcfg.shadow_ramp_iters, 1.0)
        denoiser_sigma = jnp.maximum(shadow_scale * 2.0, 1e-4)

        def loss_fn(params_geo, params_mat, light_base):
            light = update_pdf(light_base)
            if tcfg.use_shadows and tcfg.shadow_source == "mesh_splat":
                # occluder built INSIDE tick from the extracted cut mesh
                visibility_fn = "mesh_splat"
            elif tcfg.use_shadows:
                # legacy template-SDF proxy; the trained SDF is inside-
                # NEGATIVE (see GShellGeometry.sdf_lattice) and the builders
                # test occupancy as value > 0 — negate.
                occ_grid = -self.geo.sdf_lattice(params_geo)
                # (cfg, consts) parts form: the traced shadow volume rides the
                # MC accumulator's args (no tracer closures under lax.map)
                if tcfg.shadow_method == "field":
                    visibility_fn = make_shadow_field_parts(
                        occ_grid, self.aabb_min, self.aabb_size, ko=tcfg.shadow_ko
                    )
                else:
                    visibility_fn = make_sdf_visibility_parts(
                        occ_grid, self.aabb_min, self.aabb_size
                    )
            else:
                visibility_fn = None
            img_loss, depth_loss, reg_loss, aux = self.geo.tick(
                key,
                params_geo,
                params_mat,
                self.mat_cfg,
                light,
                target,
                it,
                self.flags,
                self.image_loss_fn,
                visibility_fn=visibility_fn,
                shadow_scale=shadow_scale,
                denoiser_sigma=denoiser_sigma,
                spatial_mesh=self.mesh,
                shadow_ko=tcfg.shadow_ko,
            )
            # total = img + depth + reg (ref optimize_mesh :429)
            total = img_loss + depth_loss + reg_loss
            return total, (img_loss, depth_loss, reg_loss, aux)

        (total, (img_loss, depth_loss, reg_loss, aux)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.params_geo, state.params_mat, state.light_base)
        # Gradient sanitization: Monte-Carlo rendering occasionally produces
        # non-finite gradients on isolated elements (grazing rays, degenerate
        # silhouette crossings).  Zero them instead of poisoning Adam moments,
        # and surface the count as a metric for observability.
        bad_count = 0
        def _sanitize(g):
            nonlocal bad_count
            def fix(x):
                nonlocal bad_count
                finite = jnp.isfinite(x)
                bad_count = bad_count + (~finite).sum()
                return jnp.where(finite, x, 0.0)
            return jax.tree_util.tree_map(fix, g)
        grads = tuple(_sanitize(g) for g in grads)
        g_geo, g_mat, g_lgt = grads

        upd, opt_geo = self.tx_geo.update(g_geo, state.opt_geo, state.params_geo)
        params_geo = optax.apply_updates(state.params_geo, upd)
        upd, opt_mat = self.tx_mat.update(g_mat, state.opt_mat, state.params_mat)
        params_mat = optax.apply_updates(state.params_mat, upd)
        upd, opt_lgt = self.tx_lgt.update(g_lgt, state.opt_lgt, state.light_base)
        light_base = optax.apply_updates(state.light_base, upd)

        # post-step clamps (ref :460-476)
        params_geo = self.geo.clamp_params(params_geo)
        light_base = jnp.clip(light_base, min=1e-4)

        new_state = TrainState(
            params_geo=params_geo,
            params_mat=params_mat,
            light_base=light_base,
            opt_geo=opt_geo,
            opt_mat=opt_mat,
            opt_lgt=opt_lgt,
            step=it + 1,
        )
        metrics = {
            "total": total,
            "img_loss": img_loss,
            "depth_loss": depth_loss,
            "reg_loss": reg_loss,
            "nonfinite_grads": bad_count,
            **aux,
        }
        return new_state, metrics


def _mask(params, names: set):
    """Pytree mask selecting top-level keys in ``names``."""
    return {k: jax.tree_util.tree_map(lambda _: k in names, v) for k, v in params.items()}


def _scale_tables(factor: float) -> optax.GradientTransformation:
    """Scale the hash-table gradients only (ref encoder grad ÷8)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if hasattr(updates, "tables"):
            updates = updates._replace(
                tables=jax.tree_util.tree_map(lambda t: t * factor, updates.tables)
            )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
