"""Unit tests for the unblocked panel kernels against scipy
(SURVEY.md section 4 test plan: unit-test each kernel vs CPU references)."""

import numpy as np
import scipy.linalg
import jax.numpy as jnp
import pytest

from mpf_tpu.ops.getf2 import panel_pivots, getf2_npv, getf2_pivoted
from mpf_tpu.utils import matgen


def _lapack_pivots(a):
    lu, piv = scipy.linalg.lu_factor(np.asarray(a, dtype=np.float64))
    return lu, piv  # piv: 0-based "row i swapped with piv[i]"


@pytest.mark.parametrize("n", [4, 16, 33])
def test_getf2_pivoted_matches_scipy(n, rng):
    a = rng.random((n, n)).astype(np.float32) * 9.9
    lu, piv, info = getf2_pivoted(jnp.asarray(a))
    assert int(info) == 0
    ref_lu, ref_piv = _lapack_pivots(a)
    np.testing.assert_array_equal(np.asarray(piv), ref_piv)
    np.testing.assert_allclose(np.asarray(lu), ref_lu, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("m,r", [(16, 4), (64, 16), (40, 8)])
def test_panel_pivots_fp32_matches_scipy(m, r, rng):
    """In fp32 the pre-pivoting panel must pick exactly LAPACK's pivots."""
    a = rng.random((m, r)).astype(np.float32)
    piv = panel_pivots(jnp.asarray(a))
    _, ref_piv = scipy.linalg.lu_factor(np.asarray(a, dtype=np.float64))
    np.testing.assert_array_equal(np.asarray(piv), ref_piv)


def test_panel_pivots_bf16_well_scaled(rng):
    """Property test (SURVEY.md section 4): on well-separated columns the
    bf16-chosen pivots equal the fp32-chosen pivots."""
    m, r = 32, 8
    # well-scaled: entries drawn from a coarse grid so bf16 rounding cannot
    # reorder magnitudes
    a = (rng.integers(1, 100, size=(m, r)) / 4.0).astype(np.float32)
    # make argmax unambiguous under bf16 by spreading values
    piv_bf16 = panel_pivots(jnp.asarray(a, dtype=jnp.bfloat16))
    piv_fp32 = panel_pivots(jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(piv_bf16), np.asarray(piv_fp32))


@pytest.mark.parametrize("n", [4, 16, 32])
def test_getf2_npv(n, rng):
    # diagonally dominant => no pivoting needed, npv LU is stable
    a = rng.random((n, n)).astype(np.float32) + n * np.eye(n, dtype=np.float32)
    lu, info = getf2_npv(jnp.asarray(a))
    assert int(info) == 0
    lu = np.asarray(lu, dtype=np.float64)
    l = np.tril(lu, -1) + np.eye(n)
    u = np.triu(lu)
    np.testing.assert_allclose(l @ u, a, rtol=1e-4, atol=1e-4)


def test_getf2_npv_zero_pivot_info():
    a = np.array([[1.0, 2.0], [3.0, 6.0]], dtype=np.float32)  # singular
    _, info = getf2_npv(jnp.asarray(a))
    assert int(info) == 2  # 1-based first zero pivot


def test_ragged_ncols(rng):
    a = rng.random((16, 8)).astype(np.float32)
    piv = panel_pivots(jnp.asarray(a), ncols=5)
    # trailing entries identity
    np.testing.assert_array_equal(np.asarray(piv[5:]), np.arange(5, 8))
