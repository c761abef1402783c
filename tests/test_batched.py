"""Batched LUs via vmap (BASELINE.json config 5)."""

import numpy as np
import jax.numpy as jnp

from mpf_tpu import batched_factorize, MPF_BF16
from mpf_tpu.models.batched import batched_solve
from mpf_tpu.utils.oracle import check_factorization, solve_residual


def test_batched_oracle():
    rng = np.random.default_rng(0)
    batch, n = 4, 32
    a = (rng.random((batch, n, n)) * 9.9).astype(np.float32)
    res = batched_factorize(jnp.asarray(a), r=8, policy=MPF_BF16)
    assert res.lu.shape == (batch, n, n)
    for i in range(batch):
        rep = check_factorization(a[i], np.asarray(res.lu[i]), np.asarray(res.ipiv[i]),
                                  nbe_tol=5e-4)
        assert rep.ok, f"batch {i}: {rep}"


def test_batched_dp_sharded():
    """Data-parallel batched LU over the 8-device test mesh: results match
    the unsharded path exactly and the outputs stay batch-sharded (zero
    cross-device communication — every op is batch-pointwise)."""
    import jax

    from mpf_tpu.models.batched import batched_factorize_dp

    rng = np.random.default_rng(7)
    batch, n = 8, 32
    a = (rng.random((batch, n, n)) * 9.9).astype(np.float32)
    res = batched_factorize_dp(jnp.asarray(a), r=8, policy=MPF_BF16)
    ref = batched_factorize(jnp.asarray(a), r=8, policy=MPF_BF16)
    assert len(res.lu.sharding.device_set) == len(jax.devices())
    np.testing.assert_array_equal(np.asarray(res.ipiv), np.asarray(ref.ipiv))
    np.testing.assert_allclose(
        np.asarray(res.lu), np.asarray(ref.lu), rtol=0, atol=0)


def test_batched_solve():
    rng = np.random.default_rng(1)
    batch, n = 3, 24
    a = (rng.random((batch, n, n)) * 9.9).astype(np.float32)
    b = rng.random((batch, n)).astype(np.float32)
    x = batched_solve(jnp.asarray(a), jnp.asarray(b), r=8)
    for i in range(batch):
        assert solve_residual(a[i], np.asarray(x[i]), b[i]) < 1e-6
