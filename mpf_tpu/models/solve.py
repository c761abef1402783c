"""Triangular solves on the packed factors (getrs).

The reference stops at the factorization (its oracle reconstructs P*L*U,
`benchmark.cpp:106-144`); the solve path is required by the north star's
iterative refinement.  LAPACK getrs conventions: apply the ipiv swaps to the
right-hand side, then L (unit lower) and U solves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mpf_tpu.ops.pivoting import apply_row_swaps_vector


def _as_matrix(b):
    if b.ndim == 1:
        return b[:, None], True
    return b, False


# Above this size the two full-matrix triangular_solve custom calls are
# replaced by blocked substitution: XLA's LU custom call already vmem-OOMs
# at n=32768 on the v5e backend (BENCH_r02 tail), and its TRSM shares the
# same monolithic lowering.  Blocked substitution reads each triangle once
# (HBM-bound, ~n^2/2 elements per triangle) with only (nb, nb) native
# solves on the diagonal blocks.
_BLOCKED_SOLVE_MIN = 32768
_SOLVE_NB = 2048


def _blocked_substitution(lu, b, nb: int):
    """Forward (unit-lower) then backward (upper) blocked substitution.
    The block loop is unrolled at trace time (static shapes, n/nb <= 32
    iterations at the headline sizes)."""
    n = lu.shape[0]
    y = jnp.zeros_like(b)
    for i in range(0, n, nb):
        rhs = b[i:i + nb]
        if i:
            rhs = rhs - lu[i:i + nb, :i] @ y[:i]
        yi = jax.lax.linalg.triangular_solve(
            lu[i:i + nb, i:i + nb], rhs, left_side=True, lower=True,
            unit_diagonal=True,
        )
        y = jax.lax.dynamic_update_slice(y, yi, (i, 0))
    x = jnp.zeros_like(b)
    for i in range(n - nb, -1, -nb):
        rhs = y[i:i + nb]
        if i + nb < n:
            rhs = rhs - lu[i:i + nb, i + nb:] @ x[i + nb:]
        xi = jax.lax.linalg.triangular_solve(
            lu[i:i + nb, i:i + nb], rhs, left_side=True, lower=False,
        )
        x = jax.lax.dynamic_update_slice(x, xi, (i, 0))
    return x


@jax.jit
def getrs(
    lu: jax.Array, ipiv: jax.Array, b: jax.Array, perm: jax.Array | None = None
) -> jax.Array:
    """Solve A x = b given the packed LU and 1-based global ipiv.

    Pass ``perm`` (``MPFResult.perm``, the composed row map) to apply the
    pivots with one gather; without it the map is recomposed from ipiv
    first (O(n) scalar swaps)."""
    b, was_vec = _as_matrix(b)
    b = apply_row_swaps_vector(b, ipiv, perm)
    n = lu.shape[0]
    if n >= _BLOCKED_SOLVE_MIN and n % _SOLVE_NB == 0:
        x = _blocked_substitution(lu, b, _SOLVE_NB)
    else:
        y = jax.lax.linalg.triangular_solve(
            lu, b, left_side=True, lower=True, unit_diagonal=True
        )
        x = jax.lax.linalg.triangular_solve(lu, y, left_side=True, lower=False)
    return x[:, 0] if was_vec else x


@jax.jit
def lu_solve(
    lu: jax.Array, ipiv: jax.Array, b: jax.Array, perm: jax.Array | None = None
) -> jax.Array:
    """Alias for :func:`getrs` (scipy.linalg.lu_solve-style name)."""
    return getrs(lu, ipiv, b, perm)


@functools.partial(jax.jit, static_argnames=())
def logdet(lu: jax.Array, ipiv: jax.Array):
    """(sign, log|det|) from the packed factors — diag(U) and the swap parity."""
    n = lu.shape[0]
    d = jnp.diagonal(lu)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    nswaps = jnp.sum((ipiv - 1 != idx).astype(jnp.int32))
    sign = jnp.prod(jnp.sign(d)) * jnp.where(nswaps % 2 == 0, 1.0, -1.0).astype(lu.dtype)
    return sign, jnp.sum(jnp.log(jnp.abs(d)))
