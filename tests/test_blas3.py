"""BLAS3 building blocks: triangular inverses (scalar + log-depth blocked),
TRSMs, trailing update precision policy."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpf_tpu.ops.blas3 import (
    unit_lower_inv,
    unit_lower_inv_blocked,
    upper_inv,
    trsm_u12,
    trsm_l21,
    trailing_update,
)
from mpf_tpu.precision import MPF_BF16, PURE_FP32


def _rand_unit_lower(n, rng):
    l = np.tril(rng.random((n, n)).astype(np.float32) * 0.5, -1) + np.eye(n, dtype=np.float32)
    return l


@pytest.mark.parametrize("n", [4, 64, 128])
def test_unit_lower_inv(n, rng):
    l = _rand_unit_lower(n, rng)
    linv = np.asarray(unit_lower_inv(jnp.asarray(l)))
    np.testing.assert_allclose(linv @ l, np.eye(n), atol=1e-4)


@pytest.mark.parametrize("n,base", [(256, 64), (384, 128), (512, 128), (96, 32)])
def test_unit_lower_inv_blocked(n, base, rng):
    """Recursive 2x2-block inverse == scalar triangular solve inverse."""
    l = _rand_unit_lower(n, rng)
    got = np.asarray(unit_lower_inv_blocked(jnp.asarray(l), base=base))
    np.testing.assert_allclose(got @ l, np.eye(n), atol=1e-3)
    want = np.asarray(unit_lower_inv(jnp.asarray(l)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_upper_inv(rng):
    n = 64
    u = np.triu(rng.random((n, n)).astype(np.float32)) + 2 * np.eye(n, dtype=np.float32)
    uinv = np.asarray(upper_inv(jnp.asarray(u)))
    np.testing.assert_allclose(uinv @ u, np.eye(n), atol=1e-4)


def test_trsms_solve_correctly(rng):
    r, n = 32, 96
    lu11 = np.tril(rng.random((r, r)).astype(np.float32) * 0.5, -1) + np.triu(
        rng.random((r, r)).astype(np.float32) + 2 * np.eye(r, dtype=np.float32)
    )
    a12 = rng.random((r, n)).astype(np.float32)
    a21 = rng.random((n, r)).astype(np.float32)
    l = np.tril(lu11, -1) + np.eye(r)
    u = np.triu(lu11)
    u12 = np.asarray(trsm_u12(jnp.asarray(lu11), jnp.asarray(a12), PURE_FP32))
    np.testing.assert_allclose(l @ u12, a12, atol=1e-4)
    l21 = np.asarray(trsm_l21(jnp.asarray(lu11), jnp.asarray(a21), PURE_FP32))
    np.testing.assert_allclose(l21 @ u, a21, atol=1e-4)


def test_trailing_update_policies(rng):
    n, r = 64, 16
    a22 = rng.random((n, n)).astype(np.float32)
    l21 = rng.random((n, r)).astype(np.float32)
    u12 = rng.random((r, n)).astype(np.float32)
    exact = a22 - l21 @ u12
    got32 = np.asarray(trailing_update(jnp.asarray(a22), jnp.asarray(l21), jnp.asarray(u12), PURE_FP32))
    np.testing.assert_allclose(got32, exact, atol=1e-4)
    gotbf = np.asarray(trailing_update(jnp.asarray(a22), jnp.asarray(l21), jnp.asarray(u12), MPF_BF16))
    # bf16 inputs: error O(eps_bf16 * |L||U|)
    assert np.max(np.abs(gotbf - exact)) < 0.3
    assert np.max(np.abs(gotbf - exact)) > np.max(np.abs(got32 - exact))
