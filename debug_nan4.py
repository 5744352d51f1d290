import jax, sys
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "tests")
from test_reconstruct_e2e import make_target, RES, GRID
from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
from gshell_tpu.render.render import RenderFlags, render_mesh
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig
from gshell_tpu.render.light import update_pdf
from gshell_tpu.ops.rasterize import rasterize, interpolate, antialias
from gshell_tpu.ops.math import xfm_points

gcfg = GeometryConfig(grid_res=GRID, scale=1.4, use_sdf_mlp=False, use_eikonal=False,
                      n_eikonal_samples=256, total_iters=100)
geo = GShellGeometry(gcfg)
mat_cfg = MLPTexture3DConfig(channels=6, internal_dims=16, hidden=2,
    hash=HashGridConfig(n_levels=4, log2_table_size=12, base_resolution=4, desired_resolution=32),
    aabb_min=(-1.0,)*3, aabb_max=(1.0,)*3, min_max=default_kd_ks_min_max())
flags = RenderFlags(resolution=(RES, RES), n_samples=2, bsdf="diffuse", use_denoiser=False, raster_chunk=512)
tcfg = TrainConfig(iters=10, batch=1, use_shadows=False)
rec = Reconstructor(geo, mat_cfg, flags, tcfg)
state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=0)
target = make_target()

def finite(tree):
    return all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(tree))

mvp = target["mvp"][0]
def mesh_of(pg):
    return geo.extractor(*geo.fields(pg), watertight_template=True)

def check(name, fn, pg):
    g = jax.jit(jax.grad(fn))(pg)
    bad = [jax.tree_util.keystr(p) for p, l in jax.tree_util.tree_flatten_with_path(g)[0]
           if not np.isfinite(np.asarray(l)).all()]
    print(f"  {name}: {'NONFINITE ' + str(bad) if bad else 'ok'}", flush=True)
    return bool(bad)

key = jax.random.PRNGKey(7)
prev = state
for i in range(8):
    key, k = jax.random.split(key)
    new_state, metrics = rec.train_step(state, k, target)
    pf = finite(new_state.params_geo)
    print(f"step {i}: total={float(metrics['total']):.5f} params_finite={pf}", flush=True)
    if not pf:
        pg = state.params_geo  # last finite params
        assert finite(pg), "previous params also bad!"
        print("bisect at last-finite params:", flush=True)
        bad_v = check("vert-sum", lambda pg: mesh_of(pg).verts.sum(), pg)
        check("msdf-sum", lambda pg: mesh_of(pg).msdf.sum(), pg)
        check("nrm-sum", lambda pg: mesh_of(pg).v_nrm.sum(), pg)
        if bad_v:
            # drill into extractor stages
            def stage_tmplverts(pg):
                v_def, sdf, msdf = geo.fields(pg)
                ex = geo.extractor
                E, V = ex.n_grid_edges, ex.max_verts
                sdf_p = jnp.concatenate([sdf, jnp.ones((1,))])
                pos_p = jnp.concatenate([v_def, jnp.zeros((1,3))])
                occ_p = sdf_p > 0
                e_occ = occ_p[ex.edges_pad[:-1]]
                crossing = e_occ[:,0] != e_occ[:,1]
                (edge_slots,) = jnp.nonzero(crossing, size=V, fill_value=E)
                slot_valid = edge_slots < E
                ev = ex.edges_pad[edge_slots]
                pa, pb = pos_p[ev[:,0]], pos_p[ev[:,1]]
                sa, sb = sdf_p[ev[:,0]], sdf_p[ev[:,1]]
                d = jnp.where(slot_valid, sa-sb, 1.0)
                mag = jnp.maximum(jnp.abs(d), 1e-8)
                dinv = jnp.where(d>=0, 1.0, -1.0)/mag
                wa, wb = -sb*dinv, sa*dinv
                verts = pa*wa[:,None] + pb*wb[:,None]
                return jnp.where(slot_valid[:,None], verts, 0.).sum()
            check("stage-templverts", stage_tmplverts, pg)
        # grads of each loss component on full tick
        def tickpart(pg, which):
            light = update_pdf(state.light_base)
            img_loss, reg_loss, aux = geo.tick(k, pg, state.params_mat, mat_cfg,
                light, target, state.step, flags, rec.image_loss_fn,
                visibility_fn=None, shadow_scale=0.0, denoiser_sigma=1.0)
            return img_loss if which==0 else reg_loss
        check("tick-img", lambda pg: tickpart(pg,0), pg)
        check("tick-reg", lambda pg: tickpart(pg,1), pg)
        break
    prev = state
    state = new_state
