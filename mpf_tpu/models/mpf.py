"""MPF: blocked right-looking mixed-precision pre-pivoting LU (single chip).

TPU-native redesign of the reference driver `MPF(double*, int N, int r,
int *IPIV)` (`MPF.cu:66-256`).  Per r-wide panel the reference does:

  1. extract panel, cast fp64->fp16 (`MPF.cu:106-121`)
  2. fp16 partial-pivoted panel LU, keep only pivots (`MPF.cu:131`)
  3. globalize pivots via a host round-trip (`MPF.cu:145-159`) and apply them
     to the full matrix with a LASWP kernel (`MPF.cu:162`)
  4. re-factor the pre-pivoted panel in fp64 without pivoting (`MPF.cu:183`)
  5. TRSM + GEMM trailing update via cuBLAS (`MPF.cu:215-239`)

Here the **entire factorization is one traced XLA computation** with
two-level blocking:

  * an **outer loop over block columns** of width ``block`` is unrolled at
    trace time with static shrinking shapes, so the O(n^3)-dominant trailing
    GEMMs compile at their true sizes (no masking overhead where it matters);
  * an **inner ``lax.fori_loop`` over r-wide panels** factors each (m, block)
    block column with fixed shapes and masked updates (the 2x flop overhead
    of masking is confined to the O(n^2 * block) block-column work), keeping
    compile time bounded for n in the tens of thousands;
  * each panel step runs the reference's pipeline: low-precision pivot
    selection (factors discarded, only pivots + the composed row map escape),
    one bounded-gather LASWP, working-precision diag re-factorization, and
    TRSM / trailing GEMM via triangular-inverse MXU GEMMs.

The reference pays a device->host pivot round-trip plus 5
`cudaDeviceSynchronize()` per panel (`MPF.cu:116-189`); this driver pays
zero host syncs.  Precision translation per SURVEY.md: fp16 panel -> bf16,
fp64 working -> fp32, fp64 accumulation -> fp32 MXU accumulation.

Shapes are static everywhere, so the driver works under ``jax.vmap``
(batched LUs) and inside ``shard_map`` shards.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpf_tpu import config
from mpf_tpu.precision import PrecisionPolicy, MPF_BF16, cast_to_panel
from mpf_tpu.ops.getf2 import panel_pivots_perm, getf2_npv
from mpf_tpu.ops.blas3 import (
    unit_lower_inv,
    unit_lower_inv_blocked,
    upper_inv,
    _mm_precision,
)


def _auto_panel_kernel(m: int, rp: int):
    """Pick the pre-pivoting panel implementation: the fused Pallas TPU
    kernel when shapes meet its tiling constraints (lane-major transposed
    panel), else the jnp reference kernel."""
    if config.use_pallas() and m % 128 == 0 and rp % 8 == 0:
        from mpf_tpu.ops.panel_pallas import hgetf2_panel

        return hgetf2_panel
    return panel_pivots_perm


def _auto_npv_kernel(rp: int, dtype=jnp.float32):
    if config.use_pallas() and rp % 8 == 0 and jnp.dtype(dtype) == jnp.float32:
        from mpf_tpu.ops.panel_pallas import getf2_npv_block

        return getf2_npv_block
    return getf2_npv


def _auto_npv_inv_kernel(rp: int, dtype=jnp.float32):
    """No-pivot diag factorization WITH fused triangular inverses:
    (diag) -> (lu, linv, uinv, info).  Pallas on TPU for fp32 blocks (one
    kernel, no XLA triangular_solve in the panel loop; bf16 comparisons are
    unsupported by Mosaic on this target); jnp + triangular solves
    elsewhere."""
    if config.use_pallas() and rp % 8 == 0 and jnp.dtype(dtype) == jnp.float32:
        from mpf_tpu.ops.panel_pallas import getf2_npv_inv_block

        return getf2_npv_inv_block

    def jnp_version(diag):
        lu, info = getf2_npv(diag)
        return lu, unit_lower_inv(lu), upper_inv(lu), info

    return jnp_version


class MPFResult(NamedTuple):
    """Factorization result (LAPACK getrf conventions).

    ``lu``   — (n, n) packed factors in working precision: strictly-lower =
               L (unit diagonal implicit), upper = U
    ``ipiv`` — (n,) int32, **1-based global** pivot rows (`MPF.cu:144-159`
               convention; initialized to identity like `benchmark.cpp:215-217`)
    ``info`` — int32, 1-based column of the first zero pivot, 0 if clean
               (LAPACK-style; the reference has no such guard)
    ``perm`` — (n,) int32, the COMPOSED row map of all swaps:
               ``lu[i] = (P a)[i] = a[perm[i]]``.  Equivalent to applying the
               ipiv swaps sequentially; kept so the solve path applies pivots
               to a right-hand side with ONE gather instead of n sequential
               exchanges.  May be None for legacy constructors.
    """

    lu: jax.Array
    ipiv: jax.Array
    info: jax.Array
    perm: jax.Array | None = None


def _iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]


def _inner_panel_step(slab, perm, piv_all, info, kk, jj0, rp, policy, pivot, panel_kernel):
    """One r-wide panel step inside a block column.

    ``slab``: (n, bc) full-height block-column slab (columns kk..kk+bc of the
    matrix); ``jj0``: traced slab-local column offset (global diagonal sits
    at row/column kk + jj0); ``rp``: static panel width.  Fixed shapes,
    masked updates.  Panels are always full height so ONE Pallas kernel
    instance serves every panel of the factorization (instances are
    shape-keyed; per-instance first-run compilation is expensive).
    """
    n, bc = slab.shape
    rows = _iota(n)
    cols = _iota(bc)
    fprec = _mm_precision(slab)
    j0 = kk + jj0  # global diagonal offset (traced)

    panel = jax.lax.dynamic_slice(slab, (0, jj0), (n, rp))
    use_fused = (
        pivot
        and panel_kernel is None
        and config.use_pallas()
        and n % 128 == 0
        and rp % 8 == 0
        and not policy.saturate_panel  # saturating casts stay XLA-side
        and jnp.dtype(policy.panel) in (jnp.bfloat16, jnp.float32)
    )
    srcs = None
    if use_fused:
        from mpf_tpu.ops.panel_pallas import hgetf2_panel_swaps

        # working-precision panel straight in; cast+transpose run in-kernel
        piv, pperm, perm, srcs = hgetf2_panel_swaps(
            panel, j0, perm, panel_dtype=policy.panel
        )
    elif pivot:
        kern = panel_kernel if panel_kernel is not None else panel_pivots_perm
        piv, pperm, perm = kern(
            cast_to_panel(panel, policy), row_offset=j0, prev_perm=perm
        )
    else:
        piv = j0 + _iota(rp)
        pperm = rows

    # LASWP over the slab: one bounded row exchange over the <=2r global
    # row positions that can move (sequential-swap semantics preserved by
    # the composed row map; cross-panel composition and the gather-source
    # resolution both happen inside the panel kernel)
    cand = jnp.concatenate([j0 + _iota(rp), piv])
    src = srcs if srcs is not None else jnp.take(pperm, cand)
    if config.use_pallas() and bc % 128 == 0 and slab.dtype == jnp.float32:
        # (bf16 buffers pack 2 rows per sublane; the (n,1,w) DMA view is
        # fp32-only — other dtypes use the XLA gather/scatter path)
        from mpf_tpu.ops.panel_pallas import laswp_apply

        slab = laswp_apply(slab, cand, src)
    else:
        moved_rows = jnp.take(slab, src, axis=0)
        slab = slab.at[cand, :].set(moved_rows)
    piv_all = jax.lax.dynamic_update_slice(piv_all, piv, (jj0,))

    # working-precision no-pivot re-factorization of the rp x rp diag block,
    # with triangular inverses fused into the same kernel
    diag = jax.lax.dynamic_slice(slab, (j0, jj0), (rp, rp))
    diag_lu, linv, uinv, info_k = _auto_npv_inv_kernel(rp, diag.dtype)(diag)
    info = jnp.where((info == 0) & (info_k > 0), info_k + j0, info)
    slab = jax.lax.dynamic_update_slice(slab, diag_lu, (j0, jj0))

    # L21 = A21 U11^{-1} (full-height masked GEMM)
    colp = jax.lax.dynamic_slice(slab, (0, jj0), (n, rp))
    l21 = jnp.dot(
        colp, uinv, preferred_element_type=policy.accum, precision=fprec
    ).astype(slab.dtype)
    below = rows >= j0 + rp
    l21 = jnp.where(below[:, None], l21, colp)
    slab = jax.lax.dynamic_update_slice(slab, l21, (0, jj0))

    # U12 within the block column (full-width masked)
    rowp = jax.lax.dynamic_slice(slab, (j0, 0), (rp, bc))
    u12 = jnp.dot(
        linv, rowp, preferred_element_type=policy.accum,
        precision=fprec,
    ).astype(slab.dtype)
    right = cols >= jj0 + rp
    u12 = jnp.where(right[None, :], u12, rowp)
    slab = jax.lax.dynamic_update_slice(slab, u12, (j0, 0))

    # trailing update within the block column (masked rank-rp MXU GEMM)
    lm = jnp.where(below[:, None], l21, 0).astype(policy.gemm_in)
    um = jnp.where(right[None, :], u12, 0).astype(policy.gemm_in)
    upd = jnp.dot(
        lm, um, preferred_element_type=policy.accum, precision=_mm_precision(lm)
    )
    slab = (slab.astype(policy.accum) - upd).astype(slab.dtype)
    return slab, perm, piv_all, info


_PAD_QUANTUM = 4096  # row padding quantum for fused-path kernel instances
# Streaming-update row-block height: every window is a _PAD_QUANTUM multiple
# so 2048 always divides; the round-2 value (512) made the B kernel
# grid-step-overhead-bound (512 steps of 256 KB at n=32768 — ~2x its HBM
# floor), and (rb, r) fp32 blocks at 2048 are still only 1 MB of VMEM each
_FUSED_RB = 2048
_PAD_ALIGN = 1024    # identity-extension target for non-aligned n
_PAD_MIN_N = 2048    # below this, the masked fallback path is fine


def _pad_quantum(n: int) -> int:
    """Window quantum: every distinct window height is a distinct compiled
    instance of each Pallas kernel, and the n=32768 driver hit the 2 GB
    executable-serialization limit — larger n gets a coarser quantum."""
    return _PAD_QUANTUM * (2 if n > 32768 else 1)


def _fused_ok(n: int, k: int, bc: int, r: int, policy, pivot, panel_kernel,
              ov: int = 0) -> bool:
    """Gate for the fused virtual-pivoting block-column path (round 2).
    ``ov``: appended overflow rows (deferred-exchange driver) — the slab is
    physically m + ov tall."""
    if not (pivot and panel_kernel is None and config.use_pallas()):
        return False
    if policy.saturate_panel or jnp.dtype(policy.panel) not in (
        jnp.bfloat16, jnp.float32
    ):
        return False
    if jnp.dtype(policy.working) not in (jnp.bfloat16, jnp.float32):
        return False
    if n % 128 or bc % r or r % 8 or r < 8:
        return False
    # compiled Mosaic requires lane-aligned (128) panel-width intermediates;
    # CPU interpret mode (tests) has no such constraint
    if r % 128 and jax.default_backend() == "tpu":
        return False
    q = _pad_quantum(n)
    m = min(n, -((k - n) // q) * q) + ov
    # rb self-adjusts down by halving (512 floor preferred for grid-step
    # amortization; at chip shapes ov = S*block keeps m % 512 == 0 — the
    # finer 128 floor only admits the small-shape test geometries)
    if m % min(512 if ov == 0 else 128, m):
        return False
    # transposed panel must fit VMEM next to the strip buffers (v5e VMEM is
    # 128 MB; n=65536 bf16 panels need ~17 MB)
    if r * m * jnp.dtype(policy.panel).itemsize > (40 << 20):
        return False
    return True


def _pad_target(n: int, r: int, policy, pivot, panel_kernel) -> int:
    """Padded size that keeps non-aligned n on the fused fast path, or 0.

    The reference factors any N at full speed via `min(r, N-k)` remainders
    (`MPF.cu:100-104`); here the fused pipeline's Pallas kernels need
    lane/granule-aligned shapes, so non-aligned n would silently fall back
    to the order-of-magnitude-slower masked path.  Instead: factor the
    identity-extended [[A, 0], [0, I]] at the next multiple of 1024 (every
    fused gate — n%128, window quantum, trailing-GEMM %1024 tiling — holds
    there) and slice the result back.  Pad rows are zero in the first n
    columns, so they are never chosen as pivots (except for exactly-zero
    columns, where ``info`` fires anyway), and pad columns have U12 = 0 so
    the trailing identity block is untouched.  Worst-case flop overhead at
    n=32769 is (33792/32769)^3 ~ 1.10x."""
    if not (pivot and panel_kernel is None and config.use_pallas()):
        return 0
    if n < _PAD_MIN_N or n % (_PAD_ALIGN // 2) == 0:
        # small n: the masked path handles remainders fine; half-aligned n:
        # the fused gates already admit it natively
        return 0
    n_pad = -((-n) // _PAD_ALIGN) * _PAD_ALIGN
    if not _fused_ok(n_pad, 0, min(_PAD_ALIGN, n_pad), r, policy, pivot,
                     panel_kernel):
        return 0
    return n_pad


_SENT = 2**31 - 1  # dead-row position sentinel (see `strip_panel_pivots`)


def _factor_block_column_fused(slab, diag0, r, policy, pos0=None,
                               pos_bound=None):
    """Virtual-pivoting factorization of the (m, bc) slab (rows are a tail
    window of the matrix; ``diag0`` = slab-local row of the block column's
    first diagonal).  Rows NEVER move during the inner loop — the strip
    pivot kernel carries ``pos``/``perm`` maps, the streaming update kernel
    masks on positions, and the finished pivot-row values accumulate in a
    side buffer ``u_all``.  One bounded physical row exchange per block
    column happens in the caller (vs one per panel in round 1, and a host
    pivot round-trip + LASWP launch per panel in the reference,
    `MPF.cu:145-162`).

    Returns (slab', pos (m,), olog (bc,) — the original row landing at each
    diagonal position, piv (bc,) local positions, u_all (bc, bc),
    info local).

    ``pos0`` (deferred-exchange driver, round 5): initial position map
    instead of the identity — live rows carry their virtual positions
    (overflow rows stand in for the stale physical copies at their
    deferred destinations), dead rows carry the ``_SENT`` sentinel (stale
    copies and unused overflow slots; excluded from search, swaps, and
    elimination by the strip kernel).  ``pos_bound``: exclusive bound of
    live position values (= the LOGICAL slab height when the physical slab
    carries appended overflow rows) — gates the quant16 search."""
    from mpf_tpu.ops.panel_strip import strip_panel_pivots
    from mpf_tpu.ops.panel_fused import (
        rowblock_assemble,
        panel_apply_update_trim,
    )

    m, bc = slab.shape
    gemm_bf16 = (
        jnp.dtype(policy.gemm_in) == jnp.bfloat16
        and jnp.dtype(policy.working) != jnp.bfloat16
    )
    rb = min(_FUSED_RB, m)
    while m % rb:  # 512-aligned windows (the _fused_ok floor) still divide
        rb //= 2

    # The panel loop is UNROLLED at trace time: jj0/j0 become constants, so
    # the panel slice and the per-panel bookkeeping compile to static
    # (fusable) ops — a fori_loop variant measured ~0.5 ms/panel of XLA
    # dynamic-slice/DUS overhead alone.  Kernel instances are shape-keyed
    # and shared across panels (offsets arrive as runtime scalars).
    pos = _iota(m) if pos0 is None else pos0
    info = jnp.int32(0)
    pivs = []
    ologs = []
    rowblocks = []
    for t in range(bc // r):
        jj0 = t * r
        j0 = diag0 + jj0
        # the pivot kernel reads its panel straight out of the slab in HBM
        # (lane offset jj0) — no (m, r) panel slice is ever materialized
        if config.ablate("a1"):  # timing-only stub (results WRONG)
            piv, glist = j0 + _iota(r), j0 + _iota(r)
        else:
            piv, pos, glist = strip_panel_pivots(
                slab, j0, pos, panel_dtype=policy.panel, jj0=jj0, r=r,
                pos_bound=pos_bound,
            )
        if config.ablate("a2"):  # timing-only stub (results WRONG)
            rowblock = jax.lax.dynamic_slice(slab, (j0, 0), (r, bc))
            uinv = jnp.triu(jnp.ones((r, r), slab.dtype))
            info_k = jnp.int32(0)
        else:
            rowblock, uinv, info_k = rowblock_assemble(slab, glist, jj0)
        info = jnp.where((info == 0) & (info_k > 0), info_k + jj0, info)
        if not config.ablate("bstream"):
            slab = panel_apply_update_trim(
                slab, pos, rowblock, uinv, j0, jj0, rb=rb, gemm_bf16=gemm_bf16
            )
        pivs.append(piv)
        ologs.append(glist)
        rowblocks.append(rowblock)
    piv_all = pivs[0] if len(pivs) == 1 else jnp.concatenate(pivs)
    olog_all = ologs[0] if len(ologs) == 1 else jnp.concatenate(ologs)
    u_all = (
        rowblocks[0] if len(rowblocks) == 1 else jnp.concatenate(rowblocks)
    )
    return slab, pos, olog_all, piv_all, u_all, info


def _fused_panel_stage(a, k: int, bc: int, r, policy, ipiv, info,
                       ov: int = 0, pos0=None):
    """Virtual-pivoting panel work (A1+A2+B) of the fused path for block
    column ``k``: factor the quantized tail slab, write it back, update
    ``ipiv``/``info``.  Returns ``(a, ipiv, info, stage)`` with ``stage =
    (k0, band_idx, glist, dests, u_all, pos_l)`` — everything the physical
    row exchange and the bookkeeping need.  Shared by the classic loop, the
    one-deep-lookahead loop, and the deferred-exchange loop so their panel
    semantics cannot diverge.

    Deferred-exchange driver: ``a`` is the (n + ov, n) extended matrix
    (the bottom ``ov`` rows are the overflow region) and ``pos0`` the
    slab-local initial position map (see `_factor_block_column_fused`)."""
    n = a.shape[0] - ov
    q = _pad_quantum(n)
    m = min(n, -((k - n) // q) * q)
    k0 = n - m  # rows above k0 can neither pivot nor update
    sub = a[k0:, k : k + bc]  # height m + ov
    sub, pos_l, olog_l, piv_l, u_all, info_b = (
        _factor_block_column_fused(sub, k - k0, r, policy, pos0=pos0,
                                   pos_bound=m if ov else None)
    )
    if not config.ablate("slabio"):
        a = a.at[k0:, k : k + bc].set(sub)
    ipiv = ipiv.at[k : k + bc].set(k0 + piv_l + 1)
    info = jnp.where((info == 0) & (info_b > 0), info_b + k, info)
    band_idx = (k - k0) + _iota(bc)
    dests = k0 + jnp.take(pos_l, band_idx)  # band rows' new positions
    glist = k0 + olog_l  # pivot-row sources (original rows)
    return a, ipiv, info, (k0, band_idx, glist, dests, u_all, pos_l)


def _compose_perm(perm_total, k: int, bc: int, stage, vglist=None):
    """Compose one fused block column's row map into the running total —
    only the band and the displaced destinations change.  ``vglist``
    (deferred-exchange driver): the pivot rows' column-start VIRTUAL
    positions — ``glist`` is physical and may point into the overflow
    region, but ``perm_total`` is indexed by virtual position (for
    materialized rows the two coincide, so the classic loop passes
    nothing)."""
    k0, band_idx, glist, dests = stage[:4]
    pt_old = perm_total
    src = glist if vglist is None else vglist
    perm_total = perm_total.at[k + _iota(bc)].set(jnp.take(pt_old, src))
    perm_total = perm_total.at[dests].set(jnp.take(pt_old, k0 + band_idx))
    return perm_total


def _factor_block_column(slab, kk, r, policy, pivot, panel_kernel):
    """Partial-pivoted factorization of the (n, bc) block-column slab whose
    diagonal starts at global offset ``kk`` (static).

    Returns (factored slab, composed global row map perm (n,), global
    0-based pivot rows (bc,), global info)."""
    n, bc = slab.shape
    perm0 = _iota(n)
    piv0 = kk + _iota(bc)
    nfull, tail = divmod(bc, r)

    def body(t, carry):
        slab, perm, piv_all, info = carry
        return _inner_panel_step(
            slab, perm, piv_all, info, kk, t * r, r, policy, pivot, panel_kernel
        )

    carry = (slab, perm0, piv0, jnp.int32(0))
    if nfull == 1:
        carry = body(0, carry)  # avoid loop machinery for a single panel
    elif nfull > 1:
        carry = jax.lax.fori_loop(0, nfull, body, carry)
    slab, perm, piv_all, info = carry
    if tail:
        jj0 = nfull * r
        if n - (kk + jj0) == 1:
            # `panel_rows > 1` guard (`MPF.cu:104`): 1x1 tail needs no work;
            # its pivot entry stays identity.
            pass
        else:
            slab, perm, piv_all, info = _inner_panel_step(
                slab, perm, piv_all, info, kk, jj0, tail, policy, pivot, panel_kernel
            )
    return slab, perm, piv_all, info


def _resolve_super(n: int, block: int, super_block) -> int | None:
    """Resolve the superblock width for three-level blocking (``None``
    disables it).  ``"auto"`` (the default) resolves to **disabled**: the
    deferred-far-update structure LOST its chip A/Bs on both headline
    configs — n=32768 MPF_BF16 551 vs 484 ms and n=65536 ALL_BF16 1640 vs
    1522 ms (v5e, round 3) — even with the blocked far-U12 that keeps its
    fp32 TRSM flops identical to two-level.  The predicted A22 RMW saving
    (~8n^3/3 * (1/block - 1/S) bytes) did not materialize as wall-clock;
    the structure remains available for experimentation via an explicit
    ``super_block=<int>`` or ``MPF_SUPER=<int>`` (``0`` disables)."""
    import os

    env = os.environ.get("MPF_SUPER", "")
    if env:
        super_block = None if env in ("0", "none") else (
            "auto" if env == "auto" else int(env))
    if super_block == "auto":
        super_block = None
    if super_block is not None:
        if super_block % block or super_block <= block or n < 2 * super_block:
            return None
    return super_block


def _trailing_update(a, ks: int, kw: int, ce: int, policy, fprec, lu_diag, r,
                     u12_block: int | None = None, linv=None):
    """Deferred-window trailing update from the ``kw``-wide packed diagonal
    block at ``ks``: U12 := L11^{-1} A12 over columns [ks+kw, ce), then
    A[ks+kw:, ks+kw:ce] -= L21 @ U12.  ``ce == n`` reproduces the classic
    full-width right-looking update (reference `MPF.cu:215-239`); the
    three-level driver also calls it with ``ce`` = superblock end (narrow
    mid update) and with ``kw`` = superblock width (wide far update,
    ``u12_block`` set)."""
    n = a.shape[0]
    e = ks + kw
    w = ce - e
    if w <= 0:
        return a
    if u12_block and kw > u12_block:
        # Blocked far-U12 (three-level driver): a one-shot dense
        # linv(kw) @ A12 costs 2 kw^2 w flops at fp32-HIGHEST (6-pass MXU
        # emulation, ~1/6 rate) — kw/u12_block x the fp32 TRSM flops the
        # two-level driver spends on the same columns, which measured +88 ms
        # at n=32768 S=4096 and erased the RMW saving.  Solve per inner
        # block instead and push the inter-block coupling into
        # ``policy.gemm_in``-precision correction GEMMs (full MXU rate).
        for bs in range(0, kw, u12_block):
            bw = min(u12_block, kw - bs)
            d = jax.lax.dynamic_slice(a, (ks + bs, ks + bs), (bw, bw))
            linv_b = unit_lower_inv_blocked(d, base=min(r, 128))
            a12_b = jax.lax.dynamic_slice(a, (ks + bs, e), (bw, w))
            u12_b = jnp.dot(
                linv_b, a12_b, preferred_element_type=policy.accum,
                precision=fprec,
            ).astype(a.dtype)
            a = jax.lax.dynamic_update_slice(a, u12_b, (ks + bs, e))
            rem = kw - bs - bw
            if rem:
                l21_b = jax.lax.dynamic_slice(
                    a, (ks + bs + bw, ks + bs), (rem, bw)
                ).astype(policy.gemm_in)
                corr = jnp.dot(
                    l21_b, u12_b.astype(policy.gemm_in),
                    preferred_element_type=policy.accum,
                    precision=_mm_precision(l21_b),
                )
                band = (
                    jax.lax.dynamic_slice(
                        a, (ks + bs + bw, e), (rem, w)
                    ).astype(policy.accum) - corr
                ).astype(a.dtype)
                a = jax.lax.dynamic_update_slice(a, band, (ks + bs + bw, e))
        u12 = jax.lax.dynamic_slice(a, (ks, e), (kw, w))
    else:
        # U12 block: L11^{-1} A12 via log-depth blocked triangular inverse
        # (``linv`` precomputed by the lookahead driver, which splits the
        # update narrow/wide and must not invert the diagonal twice).
        # MPF_U12_PREC (round 5): the 32k cost model puts ~65 ms of the
        # 262 ms outer stage on this dot at fp32-HIGHEST (6-pass MXU);
        # "high" (3-pass) halves that at ~2^-18 relative error.
        if linv is None:
            linv = unit_lower_inv_blocked(lu_diag, base=min(r, 128))
        a12 = jax.lax.dynamic_slice(a, (ks, e), (kw, w))
        u12 = jnp.dot(
            linv, a12, preferred_element_type=policy.accum,
            precision=config.u12_precision(fprec),
        ).astype(a.dtype)
        a = jax.lax.dynamic_update_slice(a, u12, (ks, e))
    # trailing update at true (static) sizes — the O(n^3) hot GEMM
    l21 = a[e:, ks:e].astype(policy.gemm_in)
    u12c = u12.astype(policy.gemm_in)
    mtr = n - e
    kon, interp = config.kernels_on()
    if (
        kon
        and mtr % 1024 == 0
        and e % 1024 == 0
        and w % 1024 == 0
        and jnp.dtype(a.dtype) in (jnp.float32, jnp.bfloat16)
    ):
        # subtract fused into the GEMM epilogue, aliased in place
        # (XLA materializes the product before subtracting — an extra
        # full HBM round-trip of the updated region)
        from mpf_tpu.ops.panel_fused import trailing_gemm_sub

        a = trailing_gemm_sub(a, l21, u12c, e, ncols=w, interpret=interp)
    else:
        upd = jnp.dot(
            l21, u12c, preferred_element_type=policy.accum,
            precision=_mm_precision(l21),
        )
        a22 = (
            a[e:, e:ce].astype(policy.accum) - upd
        ).astype(a.dtype)
        a = a.at[e:, e:ce].set(a22)
    return a


def _factorize_3d(a3, r, policy, fprec, block, ipiv, info, perm_total,
                  interp: bool, k_lo: int = 0, k_hi: int | None = None):
    """Pair-layout (natively-3D) fused loop (round 5): the working matrix
    is (n/2, 2, n), row i at ``a3[i // 2, i % 2]`` — the layout whose
    2-row DMA granule cuts the physical exchange's window-granule waste 8x
    on the pivot-heavy corpus (`ops/pair3d.py` module docstring; the 2D
    bf16 layout's 16-row granule cost ~520 ms of the 64k-uniform north
    star).  Same math, block structure, and LASWP semantics
    (`MPF.cu:42-59`) as the classic fused loop; the per-block-column slab
    is extracted 2D so the panel kernels (A1/A2/B) run UNCHANGED, and the
    exchange/U12/trailing-GEMM kernels run pair-layout variants that are
    bit-exact given identical inputs.

    Caller guarantees (validated in `mpf_factorize_traced`): kernels on,
    pivoting, every block column `_fused_ok`, n % block == 0, no
    superblocking/lookahead/deferral.

    ``k_lo``/``k_hi``: block-column range [k_lo, k_hi) — the multi-part
    driver (round 5) splits large n across SEQUENTIAL jitted executables
    because the tunnel's compile helper is OOM-killed on ~2.5+ MB Mosaic
    modules (the 64k pair driver ships 2.75 MB single-shot; each kernel
    call SITE embeds its serialized payload, and the per-block-column
    Python loop inlines ~45 sites/column).  State (a3, ipiv, info, perm)
    passes between parts on-device; one extra dispatch (~30 us) per split
    against a ~1.5 s factorization."""
    from mpf_tpu.ops.exchange import rows_exchange3
    from mpf_tpu.ops.pair3d import (
        band_write_rows,
        slab_extract,
        slab_writeback,
        trailing_sub3,
        u12_transform,
    )

    n = a3.shape[2]
    q = _pad_quantum(n)
    xoff = config.ablate("exchange")
    for k in range(k_lo, n if k_hi is None else k_hi, block):
        bc = min(block, n - k)
        if n - k <= 1:
            break
        # ---- panel stage (A1+A2+B) on the quantized-tail 2D slab ---------
        m = min(n, -((k - n) // q) * q)
        k0 = n - m
        sub = slab_extract(a3, k0, k, m, bc, interpret=interp)
        sub, pos_l, olog_l, piv_l, u_all, info_b = (
            _factor_block_column_fused(sub, k - k0, r, policy)
        )
        if not config.ablate("slabio"):
            a3 = slab_writeback(a3, sub, k0, k, interpret=interp)
        ipiv = ipiv.at[k : k + bc].set(k0 + piv_l + 1)
        info = jnp.where((info == 0) & (info_b > 0), info_b + k, info)
        band_idx = (k - k0) + _iota(bc)
        dests = k0 + jnp.take(pos_l, band_idx)
        glist = k0 + olog_l
        # ---- bounded physical exchange (2-row granule windows) -----------
        if not xoff:
            a3, piv3 = rows_exchange3(a3, k, glist, dests, interpret=interp)
            a3 = band_write_rows(a3, piv3, k, interpret=interp)
        # finished diagonal/U12 rowblock over the band's panel columns
        # (small: the (bc, bc) -> (bc/2, 2, bc) relayout is ~2 MB)
        u3 = u_all.reshape(bc // 2, 2, bc)
        a3 = jax.lax.dynamic_update_slice(a3, u3, (k // 2, 0, k))
        perm_total = _compose_perm(perm_total, k, bc,
                                   (k0, band_idx, glist, dests))
        # ---- trailing update: U12 in place, epilogue-fused GEMM ----------
        e = k + bc
        if e < n and not config.ablate("outer"):
            linv = unit_lower_inv_blocked(u_all, base=min(r, 128))
            w = n - e
            a3 = u12_transform(a3, linv, k, e, w,
                               config.u12_precision(fprec), interpret=interp)
            l21_3 = jax.lax.dynamic_slice(
                a3, (e // 2, 0, k), ((n - e) // 2, 2, bc)
            ).astype(policy.gemm_in)
            u12_3 = jax.lax.dynamic_slice(
                a3, (k // 2, 0, e), (bc // 2, 2, w)
            ).astype(policy.gemm_in)
            a3 = trailing_sub3(a3, l21_3, u12_3, e, interpret=interp)
    return MPFResult(lu=a3, ipiv=ipiv, info=info, perm=perm_total)


def _lookahead_factorize(a, r, policy, fprec, block, ipiv, info, perm_total,
                         interp: bool):
    """One-deep pipelined fused loop (round 4, ``MPF_LOOKAHEAD``): the
    trailing update of block column k is split at the next block column's
    right edge — after the NARROW part (columns [k+bc, k+2bc)) the next
    panel is factored (virtual pivoting, `_fused_panel_stage`), and its
    physical row exchange rides INSIDE the WIDE trailing GEMM (columns
    [k+2bc, n)) via `ops/gemmx.py`: the exchange's window DMAs are threaded
    between the MXU tiles, each entry gated on completion of the GEMM row
    strip it touches.  Mathematically identical to "full-width update, then
    exchange" (the reference's strictly serial panel -> LASWP -> TRSM ->
    GEMM order, `MPF.cu:100-240`); on chip the exchange's HBM/latency cost
    rides the bandwidth the MXU-bound GEMM leaves idle.

    Caller guarantees: every block column passes `_fused_ok`, >= 2 block
    columns, n/block/bc aligned for `gemm_trailing`'s tile schedule
    (1024 compiled / 128 interpret), combined exchange on,
    superblocking off."""
    from mpf_tpu.ops.exchange import rows_exchange
    from mpf_tpu.ops.gemmx import gemm_trailing

    n = a.shape[0]
    nb = [(k, min(block, n - k)) for k in range(0, n, block) if n - k > 1]
    tile = dict(ti=128, t=128) if interp else {}
    xoff = config.ablate("exchange")
    outer_off = config.ablate("outer")

    # prologue: panel + eager exchange for block column 0 (there is no
    # earlier trailing GEMM for its exchange to hide inside)
    k0_, bc0_ = nb[0]
    a, ipiv, info, stage = _fused_panel_stage(a, k0_, bc0_, r, policy,
                                              ipiv, info)
    eager_x = not xoff  # block column 0's exchange is still pending

    for i, (k, bc) in enumerate(nb):
        _, _, glist, dests, u_all = stage[:5]
        if eager_x:
            a, pivrows = rows_exchange(a, k, glist, dests, interpret=interp)
            a = jax.lax.dynamic_update_slice(a, pivrows, (k, 0))
        a = jax.lax.dynamic_update_slice(a, u_all, (k, k))
        perm_total = _compose_perm(perm_total, k, bc, stage)
        e = k + bc
        if i + 1 >= len(nb):
            if e < n and not outer_off:  # epilogue tail (no next panel)
                a = _trailing_update(a, k, bc, n, policy, fprec, u_all, r)
            break
        kn, bc2 = nb[i + 1]
        e2 = kn + bc2
        if not outer_off:
            linv = unit_lower_inv_blocked(u_all, base=min(r, 128))
            # narrow: U12 + trailing GEMM over exactly the next block column
            a = _trailing_update(a, k, bc, e2, policy, fprec, u_all, r,
                                 linv=linv)
        a, ipiv, info, stage = _fused_panel_stage(a, kn, bc2, r, policy,
                                                  ipiv, info)
        _, _, glist2, dests2 = stage[:4]
        if outer_off or e2 >= n:
            # nothing wide to hide in: next iteration exchanges eagerly
            eager_x = not xoff
            continue
        # wide: U12 over [e2, n), then ONE kernel = trailing GEMM with block
        # column k+1's row exchange threaded through it
        a12w = jax.lax.dynamic_slice(a, (k, e2), (bc, n - e2))
        u12w = jnp.dot(
            linv, a12w, preferred_element_type=policy.accum, precision=fprec
        ).astype(a.dtype)
        a = jax.lax.dynamic_update_slice(a, u12w, (k, e2))
        l21 = a[e:, k:e].astype(policy.gemm_in)
        u12g = u12w.astype(policy.gemm_in)
        if xoff:
            a = gemm_trailing(a, l21, u12g, e, e2, interpret=interp, **tile)
            eager_x = False
        else:
            a, pivrows2 = gemm_trailing(
                a, l21, u12g, e, e2, xargs=(kn, glist2, dests2),
                interpret=interp, **tile,
            )
            a = jax.lax.dynamic_update_slice(a, pivrows2, (kn, 0))
            eager_x = False
    return MPFResult(lu=a, ipiv=ipiv, info=info, perm=perm_total)


def _deferred_factorize(a, r, policy, fprec, block, ipiv, info, perm_total,
                        interp: bool, S: int):
    """Deferred-overflow exchange loop (round 5, ``MPF_DEFER``): block
    columns run in groups of ``S``; each column's displaced band rows whose
    destination lies BEYOND the group's last column append CONTIGUOUSLY to
    an overflow region of ``S * block`` rows extended below the matrix,
    instead of scattering into 16-row granule windows (the measured 64k
    uniform-corpus bound: each visited window streams 16 full rows to move
    1-2, STATUS round-4).  One flush per group then overlays all deferred
    rows home — each touched window now carries ~S x more moves per visit,
    dividing the granule waste by up to S.  Destinations INSIDE the group
    stay eager (same `rows_exchange` call, deferred dests self-masked), so
    every band the group will factor is always physically materialized.

    Correctness machinery: ``posg`` maps every physical row of the
    extended matrix to its virtual position (identity when materialized,
    the deferred destination for live overflow rows, the ``_SENT`` dead
    sentinel for stale physical copies and unused slots).  The strip
    kernel searches/updates by positions, so pivoting sees the overflow
    rows AT their deferred destinations (reference tie-break semantics
    preserved — the row behaves exactly as if it sat at its destination);
    dead rows are excluded from search and multipliers, and their values
    (garbage after trailing updates — harmless, row-local) are overwritten
    by the flush.  Pivot gathers need no indirection at all: the strip
    kernel's ``olog`` already returns the PHYSICAL winning row, overflow
    or not.  ``perm_total`` stays virtual-position-indexed via ``vglist =
    posg[glist]``.  The trailing GEMM covers the overflow strip (its rows
    are real trailing rows); the sequential-swap semantics of the
    reference's LASWP (`MPF.cu:42-59`) are preserved through the
    indirection — pivots bit-match the eager driver (tested).

    Caller guarantees every block column passes `_fused_ok(..., ov)`,
    n % block == 0, combined exchange on, no superblock/lookahead."""
    from mpf_tpu.ops.exchange import (
        rows_exchange,
        flush_overflow,
        copy_rows_block,
    )

    n = a.shape[1]
    ov = S * block
    sent = jnp.int32(_SENT)
    if a.shape[0] == n + ov:
        # pre-extended input (rectangular (n + ov, n)): the bottom ov rows
        # are the overflow region, initial values don't-care.  This is the
        # zero-copy entry for n=65536 bf16, where extending an (n, n) input
        # in-trace keeps BOTH buffers alive (8 + 9 GB > 15.75 GB HBM).
        a_ext = a
    else:
        a_ext = jnp.zeros((n + ov, n), a.dtype)
        a_ext = jax.lax.dynamic_update_slice(a_ext, a, (0, 0))
    posg = jnp.concatenate([_iota(n), jnp.full((ov,), sent, jnp.int32)])
    xoff = config.ablate("exchange")
    nb = [k for k in range(0, n, block) if n - k > 1]
    groups = [nb[i : i + S] for i in range(0, len(nb), S)]

    for group in groups:
        gend = min(group[-1] + block, n)  # defer only dests >= gend
        for si, k in enumerate(group):
            bc = min(block, n - k)
            q = _pad_quantum(n)
            m = min(n, -((k - n) // q) * q)
            k0 = n - m
            posl = jax.lax.dynamic_slice(posg, (k0,), (m + ov,))
            pos0 = jnp.where(posl == sent, sent, posl - k0)
            a_ext, ipiv, info, stage = _fused_panel_stage(
                a_ext, k, bc, r, policy, ipiv, info, ov=ov, pos0=pos0
            )
            _, band_idx, glist, dests, u_all, _ = stage
            vglist = jnp.take(posg, glist)
            perm_total = _compose_perm(perm_total, k, bc, stage,
                                       vglist=vglist)
            defer = dests >= gend
            sbase = n + si * block  # this column's overflow slot range
            if not xoff:
                # band -> overflow append (one contiguous HBM->HBM DMA;
                # pre-exchange values = the displaced occupants)
                a_ext = copy_rows_block(a_ext, k, sbase, bc,
                                        interpret=interp)
                # eager exchange: deferred dests self-masked (in-band
                # dests are inactive in the kernel's schedule)
                eager_dests = jnp.where(defer, k + _iota(bc), dests)
                a_ext, pivrows = rows_exchange(a_ext, k, glist, eager_dests,
                                               interpret=interp)
                a_ext = jax.lax.dynamic_update_slice(a_ext, pivrows, (k, 0))
            a_ext = jax.lax.dynamic_update_slice(a_ext, u_all, (k, k))
            # posg bookkeeping: slots whose row was consumed as a pivot
            # die; this column's deferred dests go stale with their values
            # at fresh slots.  (Overflow-row positions only ever change by
            # WINNING a pivot search — the displaced diagonal occupant is
            # always in-band — so the incremental update is complete.)
            drop = jnp.int32(n + ov)  # out-of-bounds -> mode="drop"
            posg = posg.at[jnp.where(glist >= n, glist, drop)].set(
                sent, mode="drop")
            slots = sbase + _iota(bc)
            posg = posg.at[jnp.where(defer, slots, drop)].set(
                dests, mode="drop")
            posg = posg.at[jnp.where(defer, dests, drop)].set(
                sent, mode="drop")
            if k + bc < n and not config.ablate("outer"):
                a_ext = _trailing_update(a_ext, k, bc, n, policy, fprec,
                                         u_all, r)
        # flush: every live overflow row home, ONE window sweep per group
        dov = jax.lax.dynamic_slice(posg, (n,), (ov,))
        if not xoff:
            a_ext = flush_overflow(a_ext, n, dov, interpret=interp)
        live = dov < n
        posg = posg.at[jnp.where(live, dov, drop)].set(
            jnp.where(live, dov, sent), mode="drop")
        posg = jax.lax.dynamic_update_slice(
            posg, jnp.full((ov,), sent, jnp.int32), (n,))

    return MPFResult(lu=a_ext[:n, :], ipiv=ipiv, info=info, perm=perm_total)


def _resolve_defer(n: int, block: int, r: int, policy, pivot, panel_kernel,
                   defer, pre_extended: bool = True) -> int:
    """Group size S for the deferred-overflow exchange, or 0 (off).

    ``defer``: explicit int S / True (= env or default S) / False / None
    (defer to ``MPF_DEFER``: "0" off, "auto", or an int S).  Auto policy:
    ON for bf16 working precision at n >= 49152 — the regime where the
    exchange is HBM-granule-bytes bound (the 64k uniform corpus measures
    ~520 ms of window traffic); at 32k and below the exchange is
    latency-bound and deferral's extra passes do not pay (chip A/B)."""
    import os

    env = os.environ.get("MPF_DEFER", "auto")
    if defer is None:
        defer = {"0": False, "auto": "auto"}.get(env, env)
    if defer is False or not pivot:
        return 0
    s = 0
    if defer == "auto":
        # Chip A/B verdict (round 5, tools/chip_logs_r5_defer_t64.log):
        # deferral LOSES at the 64k north star on BOTH corpora — hpl 1763.9
        # vs 1474.2 ms, uniform 2198.5 vs 1904.1 (S=8).  The structural
        # cost is the overflow strip riding EVERY trailing GEMM and slab
        # kernel (+S*block rows = +12.5% GEMM rows ~ +181 ms MXU at 64k,
        # +~70 ms extended-slab A1/B), while the expected exchange saving
        # never materialized: pivot-row GATHER visits dominate the
        # pivot-heavy exchange, and the eager combined kernel already
        # shares each window visit between sources and dests — deferring
        # dests removes the write-back but not the visit.  auto = OFF;
        # the machinery stays correct (bit-exact parity tests + chip val)
        # behind explicit defer=S / MPF_DEFER=S.
        s = 0
        env_s = os.environ.get("MPF_DEFER_AUTO_S", "")
        if env_s and jnp.dtype(policy.working) == jnp.bfloat16 and n >= 49152:
            s = int(env_s)
        if s and not pre_extended:
            # square input at the HBM edge: the in-trace extension keeps
            # matrix + extended buffer alive side by side — auto stays off
            # there (explicit defer=S is honored on the caller's head;
            # pre-extend via `defer_extension` + a rectangular input)
            it = jnp.dtype(policy.working).itemsize
            if it * n * (2 * n + s * block) > int(14.5e9):
                s = 0
    elif defer is True:
        s = int(os.environ.get("MPF_DEFER_S", "8"))
    else:
        s = int(defer)
    if s <= 0:
        return 0
    if n % block or n < 2 * block:
        return 0
    if not config.combined_exchange():
        return 0
    kon, _ = config.kernels_on()
    if not kon:
        return 0
    ov = s * block
    ok = all(
        _fused_ok(n, k, min(block, n - k), r, policy, pivot, panel_kernel,
                  ov=ov)
        for k in range(0, n, block)
        if n - k > 1
    )
    return s if ok else 0


def _auto_block(n: int, r: int, policy, block: int | None) -> int:
    """Chip-measured auto block rule (STATUS.md round-3 A/B ledger): the
    wide block pays only where the fp32 trailing RMW dominates the panel
    overhead it adds — n=32768 fp32-working: 466.7 ms at 2048 vs 493.5 at
    1024; but n=16384 fp32: 86.7 at 1024 vs 105.2 at 2048, and n=65536
    bf16: 1522 at 1024 vs 1786 at 2048."""
    if block is None:
        wide = n >= 32768 and jnp.dtype(policy.working) == jnp.dtype(jnp.float32)
        block = max(r, min(n, 2048 if wide else 1024))
    return max(block, r)


def defer_extension(n: int, r: int = 128, policy=MPF_BF16,
                    block: int | None = None, defer=None,
                    pivot: bool = True) -> int:
    """Overflow rows the deferred-exchange driver will append for this
    config (0 = deferral off).  Callers at the HBM edge (n=65536 bf16:
    8.6 GB matrix) should pre-extend their input to ``(n + ov, n)`` —
    bottom rows don't-care — so the driver takes the zero-copy rectangular
    entry instead of materializing matrix + extension side by side."""
    block = _auto_block(n, r, policy, block)
    return _resolve_defer(n, block, r, policy, pivot, None, defer) * block


def mpf_factorize_traced(
    a: jax.Array,
    r: int = 128,
    policy: PrecisionPolicy = MPF_BF16,
    pivot: bool = True,
    block: int | None = None,
    panel_kernel=None,
    super_block="auto",
    lookahead: bool | None = None,
    defer=None,
    _k3d: tuple[int, int] | None = None,
    _st3d=None,
) -> MPFResult:
    """Trace-time body: two-level blocked LU.  Call through
    :func:`mpf_factorize` / :func:`make_mpf` for the jitted entry points.

    ``_k3d``/``_st3d`` (private, pair-layout multi-part driver): restrict
    the 3D fused loop to block columns [k_lo, k_hi) and optionally resume
    from carried (ipiv, info, perm) state — see `make_mpf`'s split wrapper
    and `_factorize_3d`'s module-size rationale.

    ``panel_kernel(panel_lowprec, row_offset) -> (piv, perm)`` overrides the
    pre-pivoting panel implementation (default: the jnp reference kernel;
    the Pallas TPU kernel plugs in here).

    ``defer``: deferred-overflow exchange (round 5) — int group size S,
    True (env/default S), False, or None (the ``MPF_DEFER`` env knob;
    default "auto": on for bf16 working at n >= 49152).  See
    `_deferred_factorize`.
    """
    if a.ndim == 3:
        # Pair-layout (natively-3D) input: (n/2, 2, n), row i at
        # a[i // 2, i % 2] — explicit opt-in by shape, like the
        # row-extended deferred entry below.  See `_factorize_3d`.
        n = a.shape[2]
        if a.shape[:2] != (n // 2, 2):
            raise ValueError(f"expected (n/2, 2, n) pair layout, got {a.shape}")
        a = a.astype(policy.working)
        block = _auto_block(n, r, policy, block)
        kon, interp = config.kernels_on()
        ok = (
            kon
            and pivot
            and panel_kernel is None
            and _resolve_super(n, block, super_block) is None
            and not (config.lookahead() if lookahead is None else lookahead)
            and not _resolve_defer(n, block, r, policy, pivot, panel_kernel,
                                   defer)
            and config.combined_exchange()
            and n % block == 0
            and block % 2 == 0
            and all(
                _fused_ok(n, k, min(block, n - k), r, policy, pivot,
                          panel_kernel)
                for k in range(0, n, block)
                if n - k > 1
            )
        )
        if not ok:
            raise ValueError(
                "pair-layout (3D) input requires the fused kernel path: "
                "kernels on, pivot=True, default panel kernel, combined "
                "exchange, no superblock/lookahead/defer, n % block == 0 "
                f"and every block column fused-eligible (n={n}, "
                f"block={block}, kernels_on={kon})"
            )
        if _st3d is not None:
            ipiv3, info3, perm3 = _st3d
        else:
            ipiv3, info3, perm3 = _iota(n) + 1, jnp.int32(0), _iota(n)
        k_lo, k_hi = _k3d if _k3d is not None else (0, None)
        return _factorize_3d(a, r, policy, _mm_precision(a), block, ipiv3,
                             info3, perm3, interp, k_lo, k_hi)

    n = a.shape[1]
    ov_in = a.shape[0] - n  # rectangular (n + ov, n): pre-extended deferred
    if ov_in < 0:
        raise ValueError(f"expected square or row-extended matrix, got {a.shape}")
    a = a.astype(policy.working)

    n_pad = 0 if ov_in else _pad_target(n, r, policy, pivot, panel_kernel)
    if n_pad:
        apad = jnp.zeros((n_pad, n_pad), a.dtype)
        apad = jax.lax.dynamic_update_slice(apad, a, (0, 0))
        tail = _iota(n_pad - n) + n
        apad = apad.at[tail, tail].set(jnp.ones((), a.dtype))
        res = mpf_factorize_traced(
            apad, r=r, policy=policy, pivot=pivot, block=block,
            panel_kernel=panel_kernel, super_block=super_block,
            lookahead=lookahead, defer=defer,
        )
        return MPFResult(
            lu=res.lu[:n, :n],
            ipiv=res.ipiv[:n],
            # pad columns have unit diagonals; clamp defensively anyway
            info=jnp.where(res.info > n, 0, res.info),
            perm=res.perm[:n] if res.perm is not None else None,
        )

    block = _auto_block(n, r, policy, block)
    S = _resolve_super(n, block, super_block)
    fprec = _mm_precision(a)

    ipiv = _iota(n) + 1  # identity init (`benchmark.cpp:215-217`)
    info = jnp.int32(0)
    perm_total = _iota(n)  # composed row map: lu[i] = a_orig[perm_total[i]]

    # One-deep lookahead (round 4): pipelined panel/exchange/GEMM order.
    # Valid only when EVERY block column takes the fused path and the
    # shapes satisfy `gemm_trailing`'s tile alignment.
    looka = (
        pivot
        and not ov_in  # rectangular input is deferred-exchange-only
        and (config.lookahead() if lookahead is None else lookahead)
        and S is None
        and config.combined_exchange()
        and not config.ablate("slabio")
    )
    if looka:
        kon, interp = config.kernels_on()
        align = 128 if interp else 1024
        looka = (
            kon
            and n % align == 0
            and block % align == 0
            and n >= 2 * block
            and all(
                _fused_ok(n, k, min(block, n - k), r, policy, pivot,
                          panel_kernel)
                for k in range(0, n, block)
                if n - k > 1
            )
        )
    if looka:
        return _lookahead_factorize(
            a, r, policy, fprec, block, ipiv, info, perm_total, interp
        )

    # Deferred-overflow exchange (round 5): grouped block columns with one
    # window-sweep flush per group (pivot-heavy-corpus exchange cost)
    if pivot and not looka and S is None and not config.ablate("slabio"):
        S_defer = _resolve_defer(n, block, r, policy, pivot, panel_kernel,
                                 defer, pre_extended=ov_in > 0)
        if ov_in and S_defer * block != ov_in:
            raise ValueError(
                f"row-extended input carries ov={ov_in} overflow rows but "
                f"the deferred exchange resolved S={S_defer} (block={block}"
                f", ov must equal S*block; pass defer={ov_in // block})"
            )
        if S_defer:
            _, interp = config.kernels_on()
            return _deferred_factorize(
                a, r, policy, fprec, block, ipiv, info, perm_total, interp,
                S_defer,
            )
    if ov_in:
        raise ValueError(
            "row-extended (pre-allocated overflow) input requires the "
            "deferred-exchange path; it did not resolve "
            f"(shape {a.shape}, block={block}, defer={defer!r})"
        )

    for k in range(0, n, block):
        bc = min(block, n - k)
        if n - k <= 1:
            break
        if _fused_ok(n, k, bc, r, policy, pivot, panel_kernel):
            # ---- round-2 fused path: virtual pivoting within the block
            # column, ONE bounded physical exchange per block column --------
            a, ipiv, info, stage = _fused_panel_stage(
                a, k, bc, r, policy, ipiv, info
            )
            k0, band_idx, glist_b, dests_b, u_all = stage[:5]
            # Bounded physical row exchange (LAPACK LASWP semantics,
            # `MPF.cu:42-59`, composed into one row map), split by the
            # structure of the composed map: (a) every row moving INTO the
            # band [k, k+bc) is a pivot row at an arbitrary position — a
            # true gather, done by the DMA rows_gather kernel (XLA row
            # gathers run ~45 GB/s here and dominated the round-2 profile);
            # (b) every row moving OUT to a non-band position is an ORIGINAL
            # band occupant (swap chains always bottom out in the band), so
            # its values come from a contiguous slice and only a bounded
            # scatter (cheap, in-place) is needed.
            if not config.ablate("exchange"):
                kon, interp = config.kernels_on()
                if kon:
                    # XLA lowers row scatter as a full-buffer rewrite (2x
                    # the whole matrix per block column); the window-RMW
                    # kernels touch only the granule windows that actually
                    # contain moves.  Default (round 3): the combined
                    # one-sweep kernel — out-of-band gather sources are
                    # exactly the out-of-band scatter destinations (the
                    # composed map is a permutation with chains bottoming
                    # in the band), so gathering and scattering in the
                    # same window visit halves the window reads on
                    # pivot-heavy (uniform-corpus) inputs.
                    # bf16 slabs use fp32-widened single-row staging inside
                    # the kernel (Mosaic rejects (1, w) bf16 row slices
                    # under (2,128) sublane packing; exact round trip) —
                    # chip-validated end of round 3.
                    use_combined = config.combined_exchange()
                    if use_combined:
                        from mpf_tpu.ops.exchange import rows_exchange

                        a, pivrows = rows_exchange(a, k, glist_b, dests_b,
                                                   interpret=interp)
                    else:
                        from mpf_tpu.ops.panel_fused import (
                            rows_gather,
                            rows_scatter_from_band,
                        )

                        pivrows = rows_gather(a, glist_b, interpret=interp)
                        a = rows_scatter_from_band(a, k, dests_b,
                                                   interpret=interp)
                    a = jax.lax.dynamic_update_slice(a, pivrows, (k, 0))
                else:
                    pivrows = jax.lax.optimization_barrier(
                        jnp.take(a, glist_b, axis=0)
                    )
                    band = jax.lax.optimization_barrier(a[k : k + bc, :])
                    a = jax.lax.dynamic_update_slice(a, pivrows, (k, 0))
                    a = a.at[dests_b, :].set(band)
            # the finished diagonal/U12 rows of the block column
            a = jax.lax.dynamic_update_slice(a, u_all, (k, k))
            # compose this block's row map boundedly: only the band and the
            # displaced destinations change
            perm_total = _compose_perm(perm_total, k, bc, stage)
            lu11 = u_all
        else:
            slab = a[:, k : k + bc]
            slab, perm, piv_b, info_b = _factor_block_column(
                slab, k, r, policy, pivot, panel_kernel
            )
            a = a.at[:, k : k + bc].set(slab)
            ipiv = ipiv.at[k : k + bc].set(piv_b + 1)  # piv_b is global 0-based
            info = jnp.where((info == 0) & (info_b > 0), info_b, info)
            if pivot:
                # compose this block's row map into the running total:
                # A_after[i] = A_before[perm[i]] = A_orig[perm_total[perm[i]]]
                perm_total = jnp.take(perm_total, perm)

            # LASWP on the rest of the matrix: one bounded row exchange over
            # the <=2bc global positions that can have moved (full LAPACK
            # row-swap semantics, `MPF.cu:42-59`, including already-factored
            # L columns).  The full-width exchange double-swaps the block
            # column; the factored slab write below overwrites it.
            if pivot and (k > 0 or k + bc < n):
                cand = jnp.concatenate([k + _iota(bc), piv_b])
                src = jnp.take(perm, cand)
                if config.use_pallas() and n % 128 == 0 and a.dtype == jnp.float32:
                    from mpf_tpu.ops.panel_pallas import laswp_apply

                    a = laswp_apply(a, cand, src)
                    a = a.at[:, k : k + bc].set(slab)
                else:
                    if k > 0:
                        left = a[:, :k]
                        a = a.at[cand, :k].set(jnp.take(left, src, axis=0))
                    if k + bc < n:
                        right = a[:, k + bc :]
                        a = a.at[cand, k + bc :].set(jnp.take(right, src, axis=0))
            lu11 = slab[k : k + bc, :]

        if k + bc < n and not config.ablate("outer"):
            # Three-level blocking: within a superblock the trailing update
            # is confined to the superblock's remaining columns (narrow mid
            # update); the far trailing matrix is touched once per
            # superblock with one wide k=S GEMM.  S=None (or the last,
            # possibly partial, superblock) degenerates to the classic
            # full-width update.
            sb_end = n if S is None else min(k - k % S + S, n)
            a = _trailing_update(a, k, bc, sb_end, policy, fprec, lu11, r)
            if (S is not None and k + bc == sb_end and sb_end < n
                    and not config.ablate("far")):
                s0 = sb_end - S
                a = _trailing_update(
                    a, s0, S, n, policy, fprec, None, r, u12_block=block
                )

    return MPFResult(lu=a, ipiv=ipiv, info=info, perm=perm_total)


@functools.partial(
    jax.jit,
    static_argnames=("r", "policy", "pivot", "block", "super_block",
                     "lookahead", "defer"),
)
def mpf_factorize(
    a: jax.Array,
    r: int = 128,
    policy: PrecisionPolicy = MPF_BF16,
    pivot: bool = True,
    block: int | None = None,
    super_block="auto",
    lookahead: bool | None = None,
    defer=None,
) -> MPFResult:
    """Jitted blocked MPF factorization (the library entry point, reference
    `MPF.h:3`).  ``lookahead``: one-deep pipelined loop (round 4); ``None``
    defers to the ``MPF_LOOKAHEAD`` env knob — an explicit bool is part of
    the jit cache key, so A/B harnesses must pass it explicitly.
    ``defer``: deferred-overflow exchange group size (round 5; ``None`` =
    the ``MPF_DEFER`` env knob, same A/B caveat)."""
    return mpf_factorize_traced(
        a, r=r, policy=policy, pivot=pivot, block=block,
        super_block=super_block, lookahead=lookahead, defer=defer,
    )


_PAIR3D_SPLIT_COLS = 32


def _pair3d_parts(n: int, r: int, policy, block: int | None):
    """Block-column ranges for the pair-layout multi-part driver: at most
    ``_PAIR3D_SPLIT_COLS`` block columns per jitted executable.  The
    per-column Python loop inlines ~45 Pallas call sites, each embedding
    its serialized Mosaic payload; 64 columns (n=65536, block=1024) ships
    2.75 MB and OOM-kills the tunnel's compile helper, 32 columns measures
    ~half that (tools/tpu_modsize_r5.py).  One range = the classic
    single-executable driver (no wrapper)."""
    block = _auto_block(n, r, policy, block)
    ncols = max(1, -(-n // block))
    nparts = -(-ncols // _PAIR3D_SPLIT_COLS)
    if nparts <= 1:
        return [(0, None)]
    per = -(-ncols // nparts)
    bounds = [min(i * per * block, n) for i in range(nparts)] + [None]
    return list(zip(bounds[:-1], bounds[1:]))


@functools.lru_cache(maxsize=32)
def make_mpf(
    n: int,
    r: int = 128,
    policy: PrecisionPolicy = MPF_BF16,
    pivot: bool = True,
    block: int | None = None,
    panel_kernel=None,
    donate: bool = True,
    super_block="auto",
    lookahead: bool | None = None,
    defer=None,
):
    """Build a jitted factorizer for a fixed problem size, optionally donating
    the input buffer (in-place factorization like the reference's overwrite of
    A, `MPF.h:3`).  lru-cached: repeated calls with the same config return
    the SAME jitted callable, so multi-leg harnesses (e.g. bench.py's hpl +
    uniform north-star pair) don't re-trace/re-compile a fresh closure —
    jax.jit keys on function identity, and a compile costs ~10 min at the
    flagship sizes through the tunnel.  (Env knobs read at trace time are
    therefore frozen at first build for a given config — A/B harnesses must
    use the explicit arguments, e.g. ``lookahead=``, never env flips.)"""

    def fn(a):
        return mpf_factorize_traced(
            a, r=r, policy=policy, pivot=pivot, block=block,
            panel_kernel=panel_kernel, super_block=super_block,
            lookahead=lookahead, defer=defer,
        )

    jfn = jax.jit(fn, donate_argnums=(0,) if donate else ())

    # Pair-layout multi-part driver (round 5): at n=65536 the single-shot
    # 3D module ships 2.75 MB of MLIR and the tunnel's compile helper is
    # OOM-killed (SIGKILL; the 2D driver's ~same-size module sits just
    # under the wall — tools/tpu_modsize_r5.py: 55.7 vs 53.7 MB lowered
    # text).  Split the block-column loop across sequential jitted
    # executables, carrying (a3, ipiv, info, perm) on-device: one extra
    # dispatch (~30 us) per split vs a ~1.5 s factorization, and each
    # part's module lands at ~half the wall.  2D inputs are unaffected
    # (the wrapper dispatches on ndim at call time).
    parts = _pair3d_parts(n, r, policy, block)
    if len(parts) <= 1:
        return jfn

    def _part_fn(k_lo, k_hi, first):
        def pf(a, ipiv=None, info=None, perm=None):
            return mpf_factorize_traced(
                a, r=r, policy=policy, pivot=pivot, block=block,
                panel_kernel=panel_kernel, super_block=super_block,
                lookahead=lookahead, defer=defer,
                _k3d=(k_lo, k_hi),
                _st3d=None if first else (ipiv, info, perm),
            )
        dn = (0,) if first else (0, 1, 2, 3)
        return jax.jit(pf, donate_argnums=dn if donate else ())

    pjits = [_part_fn(lo, hi, i == 0) for i, (lo, hi) in enumerate(parts)]

    def fac(a):
        if getattr(a, "ndim", 2) != 3:
            return jfn(a)
        res = pjits[0](a)
        for pj in pjits[1:]:
            res = pj(res.lu, res.ipiv, res.info, res.perm)
        return res

    return fac
