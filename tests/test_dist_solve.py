"""Distributed getrs + IR on the 8-device virtual CPU mesh (VERDICT round-2
item 5: mesh-sharded solve on block-cyclic factors with a backward-error
gate)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpf_tpu import MPF_BF16, PURE_FP32
from mpf_tpu.parallel.mesh import make_mesh
from mpf_tpu.parallel.block_cyclic import to_block_cyclic
from mpf_tpu.parallel.dist_lu import make_dist_lu
from mpf_tpu.parallel.dist_solve import make_dist_getrs, make_dist_ir_solve
from mpf_tpu.models.solve import getrs
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import solve_residual


@pytest.mark.parametrize("shape", [(2, 4), (2, 2)])
def test_dist_getrs_matches_single(shape):
    ndev = shape[0] * shape[1]
    mesh = make_mesh(shape, devices=jax.devices()[:ndev])
    n, b = 64, 8
    a = matgen.hpl_ai_matrix(n, seed=3)
    rhs = np.linspace(-1, 1, n).astype(np.float32)
    tiles = to_block_cyclic(jnp.asarray(a), *shape, b)
    tiles_lu, ipiv, info, perm = make_dist_lu(n, b, mesh, PURE_FP32)(tiles)
    x_d = make_dist_getrs(n, b, mesh)(tiles_lu, perm, jnp.asarray(rhs))
    from mpf_tpu import mpf_factorize

    res = mpf_factorize(jnp.asarray(a), r=b, policy=PURE_FP32)
    x_s = getrs(res.lu, res.ipiv, jnp.asarray(rhs), res.perm)
    np.testing.assert_allclose(np.asarray(x_d), np.asarray(x_s), rtol=2e-4, atol=2e-5)


def test_dist_ir_reaches_fp32_level():
    mesh = make_mesh((2, 4))
    n, b = 256, 16
    a = matgen.hpl_ai_matrix(n, seed=9)
    rhs = np.ones(n, np.float32)
    tiles = to_block_cyclic(jnp.asarray(a), 2, 4, b)
    tiles_lu, ipiv, info, perm = make_dist_lu(n, b, mesh, MPF_BF16)(tiles)
    x, rn, bn = make_dist_ir_solve(n, b, mesh, sweeps=3)(
        tiles, tiles_lu, perm, jnp.asarray(rhs)
    )
    be = solve_residual(a.astype(np.float64), np.asarray(x), rhs)
    assert be < 1e-6, be  # fp32-level backward error after <=3 sweeps
    assert float(rn) / float(bn) < 1e-5
