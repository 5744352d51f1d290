"""Pallas bilateral-denoiser kernel vs the pure-jnp reference twin.

The kernel (ops/denoiser._accumulate_pallas) walks all (2r+1)² taps inside
one VMEM-resident halo strip; the jnp twin (_accumulate) dynamic-slices the
padded HBM images per tap.  Both must agree — values AND the transposed
(denom_from_tap) stencil the custom VJP uses — to f32 round-off.  Runs in
interpret mode (tests are on CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.ops.denoiser import (
    _accumulate,
    _accumulate_pallas,
    _tap_weight,
    bilateral_denoiser,
)

R = 5  # smaller radius keeps interpret-mode runtime sane; math is r-generic
H, W = 24, 40


def _inputs(seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    col = jax.random.uniform(k[0], (H, W, 3))
    nrm = jax.random.normal(k[1], (H, W, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    z = jax.random.uniform(k[2], (H, W, 1)) * 3.0 + 1.0
    dz = jax.random.uniform(k[3], (H, W, 1)) * 0.5 + 0.1
    return col, nrm, jnp.concatenate([z, dz], -1)


def test_forward_matches_jnp_twin():
    col, nrm, zdz = _inputs()
    sigma = jnp.asarray(2.0)
    ref_c, ref_w = _accumulate(col, nrm, zdz, sigma, R)
    pal_c, pal_w = _accumulate_pallas(
        col, nrm, zdz, sigma, R, interpret=True, th=8
    )
    np.testing.assert_allclose(np.asarray(pal_w), np.asarray(ref_w), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pal_c), np.asarray(ref_c), rtol=2e-5, atol=1e-6)


def test_transposed_stencil_matches_jnp_backward():
    """denom_from_tap=True reproduces the jnp custom-VJP backward loop."""
    col, nrm, zdz = _inputs(1)
    sigma = jnp.asarray(1.5)
    gp = jax.random.normal(jax.random.PRNGKey(9), (H, W, 3))

    # jnp backward loop (inlined from ops.denoiser._bwd, xla branch)
    r = R
    variance = sigma * sigma
    gpp = jnp.pad(gp, ((r, r), (r, r), (0, 0)))
    nrmp = jnp.pad(nrm, ((r, r), (r, r), (0, 0)))
    zdzp = jnp.pad(zdz, ((r, r), (r, r), (0, 0)))
    maskp = jnp.pad(jnp.ones((H, W, 1)), ((r, r), (r, r), (0, 0)))

    def body(i, acc):
        fy = i // (2 * r + 1) - r
        fx = i % (2 * r + 1) - r
        sl = lambda t: jax.lax.dynamic_slice(
            t, (r - fy, r - fx, 0), (H, W, t.shape[-1])
        )
        wgt = _tap_weight(sl(nrmp), sl(zdzp), nrm, zdz, fx, fy, variance) * sl(maskp)
        return acc + sl(gpp) * wgt

    ref = jax.lax.fori_loop(0, (2 * r + 1) ** 2, body, jnp.zeros_like(gp))
    pal, _ = _accumulate_pallas(
        gp, nrm, zdz, sigma, R, denom_from_tap=True, interpret=True, th=8
    )
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_custom_vjp_backend_parity(monkeypatch):
    """bilateral_denoiser value + color-gradient agree across backends."""
    col, nrm, zdz = _inputs(2)
    sigma = jnp.asarray(2.0)

    def run():
        f = lambda c: (bilateral_denoiser(c, nrm, zdz, sigma, 5) * 0.7).sum()
        return bilateral_denoiser(col, nrm, zdz, sigma, 5), jax.grad(f)(col)

    monkeypatch.setenv("GSHELL_DENOISER_BACKEND", "xla")
    v_x, g_x = run()
    monkeypatch.setenv("GSHELL_DENOISER_BACKEND", "pallas_interpret")
    import gshell_tpu.ops.denoiser as dn

    monkeypatch.setattr(
        dn, "_accumulate_pallas",
        lambda *a, **kw: _accumulate_pallas(*a, **{**kw, "interpret": True, "th": 8}),
    )
    monkeypatch.setattr(dn, "_backend", lambda: "pallas")
    v_p, g_p = run()
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-5, atol=1e-6)
