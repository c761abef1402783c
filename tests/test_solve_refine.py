"""Solve + iterative refinement: the north-star gate is O(eps_fp32)
solution backward error within <= 3 IR sweeps (BASELINE.json)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpf_tpu import mpf_factorize, getrs, ir_solve, mpf_solve, MPF_BF16, MPF_REF, PURE_FP32
from mpf_tpu.models.refine import gmres_ir_solve
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import solve_residual


def test_getrs_fp32():
    n = 64
    a = matgen.random_dense(n, seed=1)
    x_true = np.linspace(-1, 1, n).astype(np.float32)
    b = (a.astype(np.float64) @ x_true).astype(np.float32)
    res = mpf_factorize(jnp.asarray(a), r=16, policy=PURE_FP32)
    x = getrs(res.lu, res.ipiv, jnp.asarray(b))
    assert solve_residual(a, np.asarray(x), b) < 1e-6


@pytest.mark.parametrize("n,r", [(64, 16), (128, 32)])
def test_ir_recovers_fp32_accuracy(n, r):
    """bf16-GEMM factors + <=3 Richardson sweeps -> fp32-level backward error."""
    a = matgen.random_dense(n, seed=n)
    rng = np.random.default_rng(n)
    b = rng.random(n).astype(np.float32)
    res = mpf_factorize(jnp.asarray(a), r=r, policy=MPF_BF16)
    ir = ir_solve(jnp.asarray(a), res.lu, res.ipiv, jnp.asarray(b), sweeps=3)
    be = solve_residual(a, np.asarray(ir.x), b)
    assert be < 5e-7, f"backward error {be:.2e} after 3 sweeps"
    # residual norms decrease
    norms = np.asarray(ir.residual_norms)
    assert norms[-1] < norms[0]


def test_mpf_solve_end_to_end():
    n = 96
    a = matgen.random_dense(n, seed=7)
    b = np.ones(n, dtype=np.float32)
    out = mpf_solve(jnp.asarray(a), jnp.asarray(b), r=32, policy=MPF_BF16, sweeps=3)
    assert solve_residual(a, np.asarray(out.x), b) < 5e-7


def test_ill_conditioned_kappa1e6():
    """BASELINE.json config 5: kappa=1e6 system.

    With bf16-GEMM factors eps_bf16 * kappa >> 1: plain Richardson must
    *detect divergence* (north-star failure-detection requirement) and
    GMRES-IR stalls around 1e-5.  The reference-faithful MPF_REF policy
    (mixed precision only in pivot selection) reaches fp32-level backward
    error under GMRES-IR.
    """
    n = 64
    a = matgen.random_conditioned(n, kappa=1e6, seed=2)
    rng = np.random.default_rng(3)
    b = rng.random(n).astype(np.float32)

    res = mpf_factorize(jnp.asarray(a), r=16, policy=MPF_BF16)
    ir = ir_solve(jnp.asarray(a), res.lu, res.ipiv, jnp.asarray(b), sweeps=3)
    assert bool(ir.diverged), "expected IR divergence flag on kappa=1e6 bf16 factors"
    x = gmres_ir_solve(jnp.asarray(a), res.lu, res.ipiv, jnp.asarray(b),
                       restart=20, maxiter=5)
    assert solve_residual(a, np.asarray(x), b) < 1e-4

    res_ref = mpf_factorize(jnp.asarray(a), r=16, policy=MPF_REF)
    x_ref = gmres_ir_solve(jnp.asarray(a), res_ref.lu, res_ref.ipiv, jnp.asarray(b),
                           restart=20, maxiter=5)
    be = solve_residual(a, np.asarray(x_ref), b)
    assert be < 1e-7, f"MPF_REF GMRES-IR backward error {be:.2e}"


def test_composed_perm_matches_ipiv():
    """MPFResult.perm is the composed row map of the sequential ipiv swaps,
    and getrs(perm=...) (one gather) equals getrs via ipiv recomposition."""
    from mpf_tpu.ops.pivoting import ipiv_to_perm
    from mpf_tpu.models.solve import getrs

    n = 96
    a = matgen.random_dense(n, seed=7)
    rng = np.random.default_rng(8)
    b = rng.random(n).astype(np.float32)

    res = mpf_factorize(jnp.asarray(a), r=16, policy=MPF_BF16, block=32)
    assert res.perm is not None
    np.testing.assert_array_equal(
        np.asarray(res.perm), np.asarray(ipiv_to_perm(res.ipiv))
    )
    x_perm = getrs(res.lu, res.ipiv, jnp.asarray(b), res.perm)
    x_ipiv = getrs(res.lu, res.ipiv, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x_perm), np.asarray(x_ipiv), rtol=0, atol=0)
    assert solve_residual(a, np.asarray(x_perm), b) < 5e-3  # direct solve, bf16 GEMMs


def test_getrs_blocked_matches_xla(monkeypatch):
    """The blocked-substitution large-n path (VERDICT r2 item 6) must match
    the XLA triangular_solve path to fp32 roundoff."""
    import mpf_tpu.models.solve as S

    n = 256
    a = matgen.random_dense(n, seed=5)
    rng = np.random.default_rng(5)
    b = rng.random((n, 3)).astype(np.float32)
    res = mpf_factorize(jnp.asarray(a), r=32, policy=PURE_FP32)
    x_ref = np.asarray(getrs(res.lu, res.ipiv, jnp.asarray(b), perm=res.perm))
    monkeypatch.setattr(S, "_BLOCKED_SOLVE_MIN", 64)
    monkeypatch.setattr(S, "_SOLVE_NB", 64)
    x_blk = np.asarray(
        S.getrs.__wrapped__(res.lu, res.ipiv, jnp.asarray(b), res.perm)
    )
    np.testing.assert_allclose(x_blk, x_ref, rtol=2e-4, atol=2e-4)
    # vector RHS route too
    xv = np.asarray(
        S.getrs.__wrapped__(res.lu, res.ipiv, jnp.asarray(b[:, 0]), res.perm)
    )
    np.testing.assert_allclose(xv, x_ref[:, 0], rtol=2e-4, atol=2e-4)
