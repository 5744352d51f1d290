"""nonzero_compact vs jnp.nonzero parity (the scatter-free compaction)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gshell_tpu.ops.compact import nonzero_compact


@pytest.mark.parametrize("n", [0, 1, 31, 32, 33, 511, 512, 513, 5000, 70001])
@pytest.mark.parametrize("density", [0.0, 0.03, 0.5, 1.0])
def test_matches_jnp_nonzero(n, density):
    rng = np.random.default_rng(n * 7 + int(density * 100))
    mask = jnp.asarray(rng.random(n) < density)
    for size in {0, 1, max(1, n // 7), n, n + 9}:
        fill = n + 3
        ours = nonzero_compact(mask, size, fill)
        if n == 0:
            # jnp.nonzero on empty input ignores fill_value (returns zeros);
            # we keep fill semantics — assert ours is all-fill instead.
            np.testing.assert_array_equal(np.asarray(ours), np.full(size, fill))
            continue
        ref = jnp.nonzero(mask, size=size, fill_value=fill)[0]
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_3d_input_row_major():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((9, 11, 13)) < 0.2)
    ours = nonzero_compact(vol, 200, 9 * 11 * 13)
    ref = jnp.nonzero(vol.reshape(-1), size=200, fill_value=9 * 11 * 13)[0]
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_jits_and_int_mask():
    mask = jnp.asarray([0, 2, 0, 5, 1, 0], jnp.int32)
    out = jax.jit(lambda m: nonzero_compact(m, 4, -1))(mask)
    np.testing.assert_array_equal(np.asarray(out), [1, 3, 4, -1])
