"""Two-level driver blocking: results must be independent of the outer block
size and inner panel width (only numerics at O(eps) differ)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpf_tpu import mpf_factorize, PURE_FP32, MPF_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization


@pytest.mark.parametrize("block", [16, 32, 64, 128])
def test_block_size_invariance_fp32(block):
    """fp32 pivots are block-size invariant (and equal LAPACK's)."""
    n, r = 128, 16
    a = matgen.random_dense(n, seed=3)
    res_ref = mpf_factorize(jnp.asarray(a), r=r, policy=PURE_FP32, block=n)
    res = mpf_factorize(jnp.asarray(a), r=r, policy=PURE_FP32, block=block)
    np.testing.assert_array_equal(np.asarray(res.ipiv), np.asarray(res_ref.ipiv))
    # values agree to rounding; the trailing updates accumulate in different
    # GEMM groupings per block size, so only O(eps * depth) agreement holds
    np.testing.assert_allclose(
        np.asarray(res.lu), np.asarray(res_ref.lu), rtol=1e-3, atol=5e-3
    )


@pytest.mark.parametrize("n,r,block", [(100, 16, 48), (130, 32, 64), (96, 128, 2048)])
def test_ragged_blocking_oracle(n, r, block):
    """Non-divisible n/block/r combinations still pass the oracle."""
    a = matgen.random_dense(n, seed=n)
    res = mpf_factorize(jnp.asarray(a), r=r, policy=MPF_BF16, block=block)
    rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=1e-3)
    assert rep.ok, str(rep)
