"""MPF: blocked right-looking mixed-precision pre-pivoting LU (single chip).

TPU-native redesign of the reference driver `MPF(double*, int N, int r,
int *IPIV)` (`MPF.cu:66-256`).  Per r-wide panel the reference does:

  1. extract panel, cast fp64->fp16 (`MPF.cu:106-121`)
  2. fp16 partial-pivoted panel LU, keep only pivots (`MPF.cu:131`)
  3. globalize pivots via a host round-trip (`MPF.cu:145-159`) and apply them
     to the full matrix with a LASWP kernel (`MPF.cu:162`)
  4. re-factor the pre-pivoted panel in fp64 without pivoting (`MPF.cu:183`)
  5. TRSM + GEMM trailing update via cuBLAS (`MPF.cu:215-239`)

Here the **entire factorization is one traced XLA computation**: the panel
loop is unrolled at trace time with static (shrinking) shapes, so there are
no host synchronization points at all — the reference pays a device->host
pivot round-trip plus 5 `cudaDeviceSynchronize()` per panel
(`MPF.cu:116-189`); we pay zero.  Precision translation per SURVEY.md:
fp16 panel -> bf16, fp64 working -> fp32, fp64 accumulation -> fp32 MXU
accumulation.

Shapes are static per panel, so the same driver works under ``jax.vmap``
(batched LUs) and inside ``shard_map`` shards.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpf_tpu.precision import PrecisionPolicy, MPF_BF16, cast_to_panel
from mpf_tpu.ops.getf2 import panel_pivots, getf2_npv
from mpf_tpu.ops.pivoting import apply_row_swaps
from mpf_tpu.ops.blas3 import trsm_u12, trsm_l21, trailing_update


class MPFResult(NamedTuple):
    """Factorization result (LAPACK getrf conventions).

    ``lu``   — (n, n) packed factors in working precision: strictly-lower =
               L (unit diagonal implicit), upper = U
    ``ipiv`` — (n,) int32, **1-based global** pivot rows (`MPF.cu:144-159`
               convention; initialized to identity like `benchmark.cpp:215-217`)
    ``info`` — int32, 1-based column of the first zero pivot, 0 if clean
               (LAPACK-style; the reference has no such guard)
    """

    lu: jax.Array
    ipiv: jax.Array
    info: jax.Array


def _panel_step(a, ipiv, info, k, cols, policy, pivot, panel_kernel):
    """One blocked panel step at static offset ``k`` with static width ``cols``."""
    n = a.shape[0]

    if pivot:
        # (1)+(2) low-precision pre-pivoting panel LU; factors discarded
        panel = cast_to_panel(a[k:, k : k + cols], policy)
        piv_local = panel_kernel(panel)
        piv_global = piv_local[:cols] + jnp.int32(k)
        ipiv = ipiv.at[k : k + cols].set(piv_global + 1)
        # (3) LASWP over the full matrix width, sequential-swap semantics
        a = apply_row_swaps(a, piv_global, k, cols)

    # (4) working-precision no-pivot re-factorization of the panel:
    # r x r block by unblocked elimination, sub-diagonal part as a TRSM
    blk, info_k = getf2_npv(a[k : k + cols, k : k + cols])
    info = jnp.where((info == 0) & (info_k > 0), info_k + jnp.int32(k), info)
    a = a.at[k : k + cols, k : k + cols].set(blk)

    if k + cols < n:
        l21 = trsm_l21(blk, a[k + cols :, k : k + cols], policy)
        a = a.at[k + cols :, k : k + cols].set(l21)
        # (5) TRSM for U12 + rank-r trailing GEMM on the MXU
        u12 = trsm_u12(blk, a[k : k + cols, k + cols :], policy)
        a = a.at[k : k + cols, k + cols :].set(u12)
        a22 = trailing_update(a[k + cols :, k + cols :], l21, u12, policy)
        a = a.at[k + cols :, k + cols :].set(a22)
    return a, ipiv, info


def mpf_factorize_traced(
    a: jax.Array,
    r: int = 128,
    policy: PrecisionPolicy = MPF_BF16,
    pivot: bool = True,
    panel_kernel=None,
) -> MPFResult:
    """Trace-time body: blocked LU with the panel loop unrolled over static
    shapes.  Call through :func:`mpf_factorize` / :func:`make_mpf` for the
    jitted entry points.  ``panel_kernel`` overrides the pre-pivoting panel
    implementation (default: the jnp reference kernel; the Pallas TPU kernel
    plugs in here)."""
    n = a.shape[0]
    if a.shape != (n, n):
        raise ValueError(f"expected square matrix, got {a.shape}")
    a = a.astype(policy.working)
    if panel_kernel is None:
        panel_kernel = panel_pivots
    ipiv = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] + 1  # identity
    info = jnp.int32(0)
    k = 0
    while k < n:
        cols = min(r, n - k)
        if n - k <= 1:
            # `panel_rows > 1` guard (`MPF.cu:104`): a 1x1 tail needs no
            # elimination; its ipiv entry stays identity.
            break
        a, ipiv, info = _panel_step(a, ipiv, info, k, cols, policy, pivot, panel_kernel)
        k += cols
    return MPFResult(lu=a, ipiv=ipiv, info=info)


@functools.partial(jax.jit, static_argnames=("r", "policy", "pivot"))
def mpf_factorize(
    a: jax.Array,
    r: int = 128,
    policy: PrecisionPolicy = MPF_BF16,
    pivot: bool = True,
) -> MPFResult:
    """Jitted blocked MPF factorization (the library entry point, reference
    `MPF.h:3`)."""
    return mpf_factorize_traced(a, r=r, policy=policy, pivot=pivot)


def make_mpf(
    n: int,
    r: int = 128,
    policy: PrecisionPolicy = MPF_BF16,
    pivot: bool = True,
    panel_kernel=None,
    donate: bool = True,
):
    """Build a jitted factorizer for a fixed problem size, optionally donating
    the input buffer (in-place factorization like the reference's overwrite of
    A, `MPF.h:3`)."""

    def fn(a):
        return mpf_factorize_traced(a, r=r, policy=policy, pivot=pivot, panel_kernel=panel_kernel)

    return jax.jit(fn, donate_argnums=(0,) if donate else ())
