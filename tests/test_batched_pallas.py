"""Batched grid-parallel Pallas LU (interpret mode on CPU) — BASELINE.json
config 5 path."""

import numpy as np
import jax
import jax.numpy as jnp

from mpf_tpu.ops.batched_pallas import batched_lu
from mpf_tpu.ops.getf2 import panel_pivots_perm
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization


def test_batched_lu_oracle():
    rng = np.random.default_rng(7)
    bsz, n = 4, 32
    a = rng.standard_normal((bsz, n, n)).astype(np.float32)
    lu, ipiv, perm, info = jax.tree.map(
        np.asarray, batched_lu(jnp.asarray(a), nb_tile=2, interpret=True)
    )
    assert (info == 0).all()
    for m in range(bsz):
        rep = check_factorization(
            a[m].astype(np.float64), lu[m], ipiv[m], nbe_tol=1e-5
        )
        assert rep.ok, (m, rep)
        assert np.array_equal(np.sort(perm[m]), np.arange(n))


def test_batched_lu_pivots_match_reference_kernel():
    """Pivot sequence equals the jnp reference panel kernel (full-width
    panel = full LU) on exact-arithmetic inputs."""
    rng = np.random.default_rng(8)
    bsz, n = 2, 16
    a = (rng.integers(-4, 5, (bsz, n, n)) * 2.0
         ** rng.integers(-2, 3, (bsz, n, n))).astype(np.float32)
    a[a == 0] = 1.0
    lu, ipiv, perm, info = jax.tree.map(
        np.asarray, batched_lu(jnp.asarray(a), nb_tile=1, interpret=True)
    )
    for m in range(bsz):
        piv_ref, perm_ref = panel_pivots_perm(jnp.asarray(a[m]), row_offset=0)
        np.testing.assert_array_equal(ipiv[m] - 1, np.asarray(piv_ref))
        np.testing.assert_array_equal(perm[m], np.asarray(perm_ref))


def test_batched_lu_singular_info():
    a = np.stack([np.eye(8, dtype=np.float32), np.zeros((8, 8), np.float32)])
    _, _, _, info = jax.tree.map(
        np.asarray, batched_lu(jnp.asarray(a), nb_tile=2, interpret=True)
    )
    assert info[0] == 0 and info[1] == 1
