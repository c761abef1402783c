"""Fused npv+inverse Pallas kernel and triangular-inverse leaf kernel,
validated in interpreter mode against the jnp/triangular-solve references."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from mpf_tpu.ops.panel_pallas import getf2_npv_inv_block, unit_lower_inv_pallas
from mpf_tpu.ops.getf2 import getf2_npv
from mpf_tpu.ops.blas3 import unit_lower_inv, upper_inv


@pytest.mark.parametrize("r", [8, 32])
def test_npv_inv_matches_reference(r, rng):
    blk = jnp.asarray(rng.random((r, r)) + r * np.eye(r), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        lu_p, linv_p, uinv_p, info_p = getf2_npv_inv_block(blk)
    lu_j, info_j = getf2_npv(blk)
    np.testing.assert_allclose(np.asarray(lu_p), np.asarray(lu_j), rtol=1e-5, atol=1e-5)
    assert int(info_p) == int(info_j) == 0
    np.testing.assert_allclose(
        np.asarray(linv_p), np.asarray(unit_lower_inv(lu_j)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(uinv_p), np.asarray(upper_inv(lu_j)), rtol=1e-4, atol=1e-4
    )


def test_tri_inv_leaf(rng):
    r = 32
    l = np.tril(rng.random((r, r)).astype(np.float32) * 0.5, -1) + np.eye(r, dtype=np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(unit_lower_inv_pallas(jnp.asarray(l)))
    np.testing.assert_allclose(got @ l, np.eye(r), atol=1e-4)
