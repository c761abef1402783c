"""Pallas TPU panel kernels, validated in interpreter mode against the jnp
reference kernels (SURVEY.md section 4: Pallas interpret mode + golden CPU
runs).  Compiled-mode validation runs on real TPU via the verify recipe."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from mpf_tpu.ops.panel_pallas import hgetf2_panel, getf2_npv_block
from mpf_tpu.ops.getf2 import panel_pivots_perm, getf2_npv


@pytest.mark.parametrize("m,r,off", [(64, 8, 0), (64, 8, 7), (96, 16, 5)])
def test_hgetf2_matches_jnp(m, r, off, rng):
    pan = jnp.asarray(rng.random((m, r)) * 9.9, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        piv_p, perm_p = hgetf2_panel(pan, off)
    piv_j, perm_j = panel_pivots_perm(pan, off)
    np.testing.assert_array_equal(np.asarray(piv_p), np.asarray(piv_j))
    np.testing.assert_array_equal(np.asarray(perm_p), np.asarray(perm_j))


def test_hgetf2_prev_perm_composition(rng):
    """In-kernel swap composition == XLA gather composition."""
    m, r = 64, 8
    pan = jnp.asarray(rng.random((m, r)) * 9.9, jnp.bfloat16)
    prev = jnp.asarray(rng.permutation(m).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        piv_p, perm_p, comp_p = hgetf2_panel(pan, 3, prev_perm=prev)
    piv_j, perm_j, comp_j = panel_pivots_perm(pan, 3, prev_perm=prev)
    np.testing.assert_array_equal(np.asarray(piv_p), np.asarray(piv_j))
    np.testing.assert_array_equal(np.asarray(comp_p), np.asarray(comp_j))
    np.testing.assert_array_equal(
        np.asarray(comp_p), np.asarray(prev)[np.asarray(perm_p)]
    )


def test_hgetf2_colliding_values(rng):
    """Ties must resolve to the lowest current position (reference strict->
    scan, hgetf2_kernel.cu:68-82)."""
    m, r = 64, 8
    pan = np.ones((m, r), dtype=np.float32)  # all ties
    with pltpu.force_tpu_interpret_mode():
        piv_p, perm_p = hgetf2_panel(jnp.asarray(pan, jnp.bfloat16), 0)
    piv_j, perm_j = panel_pivots_perm(jnp.asarray(pan, jnp.bfloat16), 0)
    np.testing.assert_array_equal(np.asarray(piv_p), np.asarray(piv_j))
    np.testing.assert_array_equal(np.asarray(perm_p), np.asarray(perm_j))


@pytest.mark.parametrize("r", [8, 32])
def test_npv_matches_jnp(r, rng):
    blk = jnp.asarray(rng.random((r, r)) + r * np.eye(r), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        lu_p, info_p = getf2_npv_block(blk)
    lu_j, info_j = getf2_npv(blk)
    np.testing.assert_allclose(np.asarray(lu_p), np.asarray(lu_j), rtol=1e-6, atol=1e-6)
    assert int(info_p) == int(info_j) == 0


def test_npv_zero_pivot_info():
    a = jnp.asarray([[1.0, 2.0], [3.0, 6.0]], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        _, info = getf2_npv_block(a)
    assert int(info) == 2
