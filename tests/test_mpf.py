"""Integration tests: blocked MPF factorization against the P*L*U
reconstruction oracle (the reference's test methodology,
`benchmark.cpp:106-144`) and differential tests vs scipy/LAPACK
(`benchmark.cpp:239-256`)."""

import numpy as np
import scipy.linalg
import jax.numpy as jnp
import pytest

from mpf_tpu import mpf_factorize, MPF_BF16, PURE_FP32, MPF_FP16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization, reconstruct


@pytest.mark.parametrize("n,r", [(8, 4), (32, 8), (64, 16), (96, 32), (50, 16)])
def test_oracle_fp32(n, r, rng):
    a = matgen.random_dense(n, seed=n + r)
    res = mpf_factorize(jnp.asarray(a), r=r, policy=PURE_FP32)
    assert int(res.info) == 0
    rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=1e-6)
    assert rep.ok, str(rep)


@pytest.mark.parametrize("n,r", [(32, 8), (64, 16), (128, 32)])
def test_oracle_mixed_bf16(n, r):
    a = matgen.random_dense(n, seed=n)
    res = mpf_factorize(jnp.asarray(a), r=r, policy=MPF_BF16)
    assert int(res.info) == 0
    rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=5e-4)
    assert rep.ok, str(rep)


def test_pivots_match_lapack_fp32():
    """With an fp32 panel, MPF's pivot sequence must match LAPACK's exactly
    on generic matrices (differential test)."""
    n, r = 48, 16
    a = matgen.random_dense(n, seed=9)
    res = mpf_factorize(jnp.asarray(a), r=r, policy=PURE_FP32)
    _, piv = scipy.linalg.lu_factor(np.asarray(a, dtype=np.float64))
    np.testing.assert_array_equal(np.asarray(res.ipiv) - 1, piv)


def test_reference_corpus_end_to_end():
    """Factor the reference-identical corpus (glibc rand, sizes 2..32) and
    gate every matrix through the oracle — the reference benchmark flow."""
    for a in matgen.generate_corpus(32):
        n = a.shape[0]
        res = mpf_factorize(jnp.asarray(a, dtype=jnp.float32), r=8, policy=MPF_BF16)
        rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=1e-3)
        assert rep.ok, f"corpus n={n}: {rep}"


def test_no_pivot_mode():
    """Config 1 of BASELINE.json: no-pivot blocked LU on a dominant matrix."""
    n = 64
    rng = np.random.default_rng(0)
    a = rng.random((n, n)).astype(np.float32) + n * np.eye(n, dtype=np.float32)
    res = mpf_factorize(jnp.asarray(a), r=16, policy=PURE_FP32, pivot=False)
    assert int(res.info) == 0
    np.testing.assert_array_equal(np.asarray(res.ipiv), np.arange(1, n + 1))
    rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=1e-6)
    assert rep.ok, str(rep)


def test_fp16_parity_policy():
    """The strict reference-semantics policy (fp16 panel with saturation/FTZ,
    `fp16_utils.h:15-23`) also passes the oracle."""
    a = matgen.random_dense(48, seed=3)
    res = mpf_factorize(jnp.asarray(a), r=16, policy=MPF_FP16)
    rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=5e-4)
    assert rep.ok, str(rep)


def test_singular_matrix_info():
    a = np.zeros((8, 8), dtype=np.float32)
    res = mpf_factorize(jnp.asarray(a), r=4)
    assert int(res.info) > 0


def test_ipiv_identity_tail():
    """The 1x1 tail panel is skipped (`MPF.cu:104` guard) — its ipiv entry
    stays identity."""
    n = 9
    a = matgen.random_dense(n, seed=5)
    res = mpf_factorize(jnp.asarray(a), r=4, policy=PURE_FP32)
    assert int(np.asarray(res.ipiv)[-1]) == n
    rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=1e-6)
    assert rep.ok, str(rep)
