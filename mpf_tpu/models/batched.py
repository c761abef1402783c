"""Batched LU factorizations (north-star addition, BASELINE.json config 5:
4096 x 256^2 batched LUs).

The blocked driver uses only static shapes and functional updates, so it is
directly ``jax.vmap``-compatible; the batch axis can additionally be sharded
across a device mesh for data-parallel batched factorization (see
``mpf_tpu.parallel``).
"""

from __future__ import annotations

import functools

import jax

from mpf_tpu.precision import PrecisionPolicy, MPF_BF16
from mpf_tpu.models.mpf import mpf_factorize_traced, MPFResult


@functools.partial(jax.jit, static_argnames=("r", "policy", "pivot"))
def batched_factorize(
    a: jax.Array,
    r: int = 128,
    policy: PrecisionPolicy = MPF_BF16,
    pivot: bool = True,
) -> MPFResult:
    """Factor a (batch, n, n) stack of matrices.  Returns stacked MPFResult.

    On TPU with fp32 working precision the grid-parallel batched Pallas
    kernel factors tiles of matrices vectorized across the batch
    (`ops/batched_pallas.py` — the round-2 TPU path for BASELINE.json
    config 5); otherwise the blocked driver runs under ``vmap`` with the
    jnp reference kernels (the fused single-matrix kernels' aliasing/DMA
    patterns are not vmappable).
    """
    import jax.numpy as jnp

    from mpf_tpu import config

    bsz, n = a.shape[0], a.shape[1]
    if (
        pivot
        and config.use_pallas()
        and jnp.dtype(policy.working) == jnp.float32
        and n % 8 == 0
        and n <= 1024
        and bsz % 2 == 0  # nb_tile=1 degenerates the in-program batch
        # vectorization the kernel is built around — odd batches fall back
    ):
        from mpf_tpu.ops.batched_pallas import batched_lu

        nb = next(t for t in (8, 4, 2) if bsz % t == 0)
        lu, ipiv, perm, info = batched_lu(
            a.astype(policy.working), nb_tile=nb
        )
        return MPFResult(lu=lu, ipiv=ipiv, info=info, perm=perm)

    fn = lambda m: mpf_factorize_traced(m, r=r, policy=policy, pivot=pivot)
    with config.force_jnp_kernels():
        return jax.vmap(fn)(a)


@functools.partial(jax.jit, static_argnames=("r", "policy", "sweeps"))
def batched_solve(a: jax.Array, b: jax.Array, r: int = 128,
                  policy: PrecisionPolicy = MPF_BF16, sweeps: int = 2):
    """Factor + IR-solve a (batch, n, n) stack against (batch, n) RHS."""
    from mpf_tpu.models.refine import ir_solve

    def one(m, rhs):
        res = mpf_factorize_traced(m, r=r, policy=policy, pivot=True)
        return ir_solve(m.astype(policy.working), res.lu, res.ipiv, rhs, sweeps=sweeps).x

    from mpf_tpu import config

    with config.force_jnp_kernels():
        return jax.vmap(one)(a, b)
