"""Strip-blocked pre-pivoting panel LU (Pallas TPU kernel, round 2).

TPU-native redesign of the reference's cooperative panel kernel
(`HGETF2_kernel`, `hgetf2_kernel.cu:15-120`), superseding the round-1
rank-1-per-column kernel (`panel_pallas._hgetf2t_kernel`).  The reference
(and the round-1 kernel) pay O(r) full-panel vector passes; here the
per-column VPU work is confined to an 8-row *strip* of the transposed
panel, and the updates to future strips are deferred into rank-8 MXU GEMMs
with an in-strip triangular correction — the standard blocked-LU trick,
restructured for the (r, m) lane-major layout:

  * the panel is held transposed, (r, m) in VMEM, panel dtype (bf16 for
    the MPF policies): panel columns are lane-major rows, so every
    per-column op runs at full 128-lane VPU width;
  * **virtual pivoting**: rows are never moved; the kernel carries
    ``pos`` (original row -> current position) and ``perm`` (position ->
    original row) and swaps two entries per column.  Pivot search masks on
    ``pos >= d``; ties resolve to the lowest current position, matching
    the reference's strict-``>`` scan (`hgetf2_kernel.cu:68-82`);
  * the active 8-column strip is carried in **fp32** (better pivot
    decisions than the reference's fp16 arithmetic) together with the
    strip's multiplier rows M (8, m).  After the strip, every future strip
    row k is updated in one pass: the strip's U entries for row k satisfy
    U_k (I + N) = T_k[o_0..o_7] with N[j',j] = M[j', o_j] (strictly upper,
    8x8), so  T_k -= (T_k S) (I+N)^{-1} M  — two small MXU GEMMs per
    8-row chunk, where S is the one-hot pivot-lane selector (MXU gathers
    replace the per-lane extractions that dominated the round-1 kernel);
  * multipliers/factors are **discarded** (reference semantics: only
    `ipiv_panel` is read back, `MPF.cu:145`); only pivots and the updated
    position maps escape.

The kernel is the first stage of the fused panel pipeline (see
`mpf_tpu/ops/panel_fused.py` and `models/mpf.py`): it also emits
``glist[j] = perm[j0 + j]`` — the original rows that virtually landed on
the diagonal — which the second stage uses to DMA-gather the pivot rows.

Constraints: ``r % 8 == 0``, ``m % 128 == 0``, panel dtype bf16 or fp32
(fp32 in-kernel compute either way; Mosaic has no bf16 compares here).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W = 8          # strip width (sublane granule of the fp32 transposed panel)
_CHUNK = 1024   # rows per transpose-load DMA chunk


def _search_column(colv3, posk, d2, quant16):
    """The per-column pivot search chain, shape-agnostic (works on the flat
    (1, m) vectors of `_strip_pivot_kernel` and the (8, ml) group-major
    tiles of `_strip_pivot_kernel_gm` alike).

    Returns ``(winner, posk', cpk, safe)``: the winner lane mask, the
    updated position-key state, the pivot's doubled position (1, 1), and
    the signed division-safe pivot value (1, 1).

    quant16=False (exact, fp32 panels): TWO cross-lane reductions — max
    over the int32 bit patterns of |colv| (monotone for non-negative IEEE
    floats, recovers |pivval| for free), then min over the (pos << 1 |
    sign) keys among the max-abs ties (lowest CURRENT POSITION wins,
    reference strict-'>' scan semantics, `hgetf2_kernel.cu:68-82`; the low
    bit carries the winner's sign).  ``posk`` carries pos << 1.

    quant16=True (bf16 panels): ONE reduction — max over the packed key
    [abs_top15 | invpos16 | sign], compared as int32 after an
    order-preserving u32->i32 XOR bias.  ``posk`` carries the INVERTED
    doubled position (65535 - pos) << 1.  Pivot selection happens at bf16
    |value| granularity with ties coarsened to the lowest current
    position, and the divisor is the top-15-bit-truncated pivot value —
    both safe because the panel factors are DISCARDED (reference
    semantics, `MPF.cu:120-145`); only which of two near-equal pivots is
    picked can change (|chosen| >= (1 - 2^-8)|max|).

    (The multiplier divide downstream stays a true vector divide: a scalar
    reciprocal + multiply would double-round and break bit parity with the
    jnp reference kernel.)
    """
    f32 = jnp.float32
    bits = jax.lax.bitcast_convert_type(colv3, jnp.int32)
    if quant16:
        id2 = jnp.int32(131070) - d2   # inverted doubled diagonal
        sgn = jax.lax.shift_right_logical(bits, jnp.int32(31))
        ks = jnp.bitwise_xor(
            jnp.left_shift(
                jnp.bitwise_and(bits, jnp.int32(0x7FFF0000)), jnp.int32(1)
            ),
            jnp.int32(-(2**31)),
        )
        kx = jnp.where(
            posk <= id2,                   # pos >= d (active)
            jnp.bitwise_or(jnp.bitwise_or(ks, posk), sgn),
            jnp.int32(-(2**31)),
        )
        kmx = jnp.max(kx, keepdims=True).reshape(1, 1)
        winner = kx == kmx
        # (1, 1) scalar decode, off the vector chain
        ku = jnp.bitwise_xor(kmx, jnp.int32(-(2**31)))
        wk = jnp.bitwise_and(ku, jnp.int32(0x1FFFE))  # winner invposk
        awb = jnp.bitwise_and(
            jax.lax.shift_right_logical(ku, jnp.int32(1)),
            jnp.int32(0x7FFF0000),
        )                                  # truncated |pivval| bits
        mxf = jax.lax.bitcast_convert_type(awb, f32)
        pivval = jnp.where(jnp.bitwise_and(ku, 1) == 1, -mxf, mxf)
        safe = jnp.where(awb == 0, f32(1), pivval)
        cpk = jnp.int32(131070) - wk       # pivot posk (doubled pos)
        posk = jnp.where(winner, id2, jnp.where(posk == id2, wk, posk))
    else:
        absb = jnp.bitwise_and(bits, jnp.int32(0x7FFFFFFF))
        masked = jnp.where(posk >= d2, absb, jnp.int32(-1))
        mxb = jnp.max(masked, keepdims=True).reshape(1, 1)
        sgn = jax.lax.shift_right_logical(bits, jnp.int32(31))
        key = jnp.where(
            masked == mxb,
            jnp.bitwise_or(posk, sgn),
            jnp.int32(2**31 - 1),
        )
        kmin = jnp.min(key, keepdims=True).reshape(1, 1)
        cpk = jnp.bitwise_and(kmin, jnp.int32(-2))  # pivot posk (even)
        winner = posk == cpk
        # the lane displaced from the diagonal is identified by posk==d2
        # directly — no winner/displaced map maintenance
        posk = jnp.where(winner, d2, jnp.where(posk == d2, cpk, posk))
        # pivot value reconstructed from the two reduces, bit-exact:
        # |pivval| = mxb reinterpreted, sign = key's low bit
        mxf = jax.lax.bitcast_convert_type(mxb, f32)
        pivval = jnp.where(jnp.bitwise_and(kmin, 1) == 1, -mxf, mxf)
        safe = jnp.where(mxb == 0, f32(1), pivval)      # (1,1) scalar
    return winner, posk, cpk, safe


def _posk_init(pos, quant16):
    return (jnp.int32(131070) - (pos << 1)) if quant16 else (pos << 1)


def _below_diag(posk, d2, quant16):
    """Mask of lanes strictly below the diagonal (pos > d), in whichever
    key space ``posk`` carries."""
    return (posk < jnp.int32(131070) - d2) if quant16 else (posk > d2)


def _posk_final(posk, quant16):
    if quant16:
        posk = jnp.int32(131070) - posk  # undo inversion
    return jax.lax.shift_right_logical(posk, jnp.int32(1))


def _strip_pivot_kernel(
    meta_ref, panel_ref, pos_in_ref,
    piv_ref, pos_ref, glist_ref,
    t_ref, chunk_ref, upf_ref, sem,
    *, r: int, m: int, nchunk: int, ch: int, allow_packed: bool = False,
    roll_packed: bool = False, quant16: bool = False,
):
    dt = t_ref.dtype
    f32 = jnp.float32

    # ---- load + cast + transpose the (m, r) panel into T (r, m), chunked
    # (double-buffered DMAs; the slab stays in HBM — the panel is read at
    # lane offset jj0 straight out of the full block-column slab, so the
    # driver never materializes an (m, r) panel slice) ----------------------
    jj0 = pl.multiple_of(meta_ref[1], min(r, 128))

    def chunk_dma(slot, c):
        return pltpu.make_async_copy(
            panel_ref.at[pl.ds(c * ch, ch), pl.ds(jj0, r)],
            chunk_ref.at[slot],
            sem.at[slot],
        )

    chunk_dma(0, 0).start()
    for c in range(nchunk):
        if c + 1 < nchunk:
            chunk_dma((c + 1) % 2, c + 1).start()
        chunk_dma(c % 2, c).wait()
        t_ref[:, c * ch : (c + 1) * ch] = jnp.swapaxes(
            chunk_ref[c % 2].astype(dt), 0, 1
        )

    off = meta_ref[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)   # original row ids
    pivlanes = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    wlanes = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
    wrows = jax.lax.broadcasted_iota(jnp.int32, (_W, 1), 0)

    # The per-column search/bookkeeping chain runs on (8, m/8) PACKED views:
    # (1, m) vectors occupy one sublane of each vreg (1/8 VPU efficiency),
    # and the chain is ~15 dependent ops per column — packing runs it at
    # full vector width.  Compiled Mosaic on this target rejects
    # lane->sublane shape casts AND lowers slice/concat and ref-roundtrip
    # repacks pathologically (round-3 micro-tests: 15 ms per repack), but
    # the per-sublane-strided lane ROLL is native: pack = broadcast to
    # (8, m) + roll row s right by (s+1)*ml + take lanes [0, ml) — row s
    # then holds v[(7-s)*ml + g] (reversed-row split).  Unpack (the working
    # direction) stores the 8 sublane slices at their lane offsets of a
    # (1, m) scratch.  Interpret mode (tests) uses plain reshapes with the
    # same reversed-row convention, so both modes are bit-identical.
    packable = (allow_packed or roll_packed) and m % (8 * 128) == 0
    ml = m // 8 if packable else m

    def pk(v):   # (1, m) -> (8, ml) reversed-row split
        if not packable:
            return v
        if roll_packed:
            b = jnp.broadcast_to(v, (8, m))
            return pltpu.roll(b, ml, 1, stride=ml, stride_axis=0)[:, :ml]
        return v.reshape(8, ml)[::-1, :]

    def upk(v):  # (8, ml) -> (1, m), f32 only (routes through upf_ref)
        if not packable:
            return v
        if roll_packed:
            for s in range(8):
                upf_ref[0:1, (7 - s) * ml:(8 - s) * ml] = v[s:s + 1, :]
            return upf_ref[0:1, :]
        return v[::-1, :].reshape(1, m)

    lanes3 = pk(lanes)
    # pos is carried PRE-SHIFTED (posk = pos << 1) so the per-column tie key
    # (pos << 1 | sign) needs no shift on the critical chain; comparisons
    # against d become comparisons against 2d (scalar, free).
    # quant16 (bf16 panels): posk instead carries the INVERTED doubled
    # position (65535 - pos) << 1, so the single packed search key
    # [abs_top15 | invpos16 | sign] is max-reduced in ONE cross-lane
    # reduction (see col_body).
    posk = pk(_posk_init(pos_in_ref[:], quant16))
    piv = pivlanes + off
    # olog[j] = the ORIGINAL ROW chosen as column j's pivot.  Position
    # off+j is final once column j completes (later swaps only touch
    # positions > off+j), so olog IS the glist the fused second stage
    # gathers — no full position->row map is maintained at all (the driver
    # composes its global row map boundedly from olog + pos).
    olog = pivlanes + off
    nstrips = r // _W

    # Strips run under a fori_loop (small carry: pos/perm/piv only — the
    # strip values/multipliers live within one iteration) with the 8-column
    # inner loop UNROLLED (static jc keeps st/mbuf live, no VMEM carry
    # spills).  A fully strip-unrolled variant compiled ~16x more Mosaic
    # code per kernel instance and pushed the n=32768 driver program past
    # the 2 GB executable-serialization limit.
    def strip_body(s, carry0):
        posk, piv, olog = carry0
        s0 = pl.multiple_of(s * _W, _W)
        st = t_ref[pl.ds(s0, _W), :].astype(f32)     # active strip, fp32
        mbuf = jnp.zeros((_W, m), f32)               # multiplier rows
        olist = jnp.zeros((1, _W), jnp.int32)        # pivot lanes o_j

        def col_body(jc, carry):
            st, mbuf, olist, posk, piv, olog = carry
            d2 = 2 * (off + s0 + jc)       # doubled diagonal (posk units)
            # current column values: one (W, m) masked reduce, then packed
            colv = jnp.sum(
                jnp.where(wrows == jc, st, 0.0), axis=0, keepdims=True
            )  # (1, m)
            colv3 = pk(colv)
            # Pivot search, TWO cross-lane reductions on the critical path
            # (round 3; the round-2 chain had four *sequential* reduces —
            # mx, cp, o1, pivval — each ~1us of VPU latency per column):
            #   1. max over the int32 bit patterns of |colv| (monotone for
            #      non-negative IEEE floats), which also recovers |pivval|
            #      without the separate pivval reduce;
            #   2. min over the key (pos << 1 | signbit) among the max-abs
            #      ties: lowest CURRENT POSITION wins (reference strict-'>'
            #      scan semantics, `hgetf2_kernel.cu:68-82`), and the key's
            #      low bit carries the winner's sign for pivval.
            # The winner LANE is then identified elementwise (posk == cpk;
            # pos is a permutation so the lane is unique) — the o1 value
            # reduce below only feeds the olog/olist outputs, NOT the next
            # column, so it sits off the sequential dependency chain.
            # Op-count trims (round 3b): the masked-|bits| array from the
            # max reduce IS the tie mask operand (tie = masked == mxb, one
            # compare instead of active & (absb == mxb)); the sign bit
            # comes from a logical shift (no compare+select); the key needs
            # no per-lane shift because posk is pre-doubled.  (The multiplier
            # divide stays a true vector divide: a scalar reciprocal +
            # multiply would double-round and break bit parity with the jnp
            # reference kernel.)
            winner, posk, cpk, safe = _search_column(colv3, posk, d2, quant16)
            below = _below_diag(posk, d2, quant16)
            o1 = jnp.sum(jnp.where(winner, lanes3, 0), keepdims=True
                         ).reshape(1, 1)
            piv = jnp.where(pivlanes == s0 + jc,
                            jax.lax.shift_right_logical(cpk, jnp.int32(1)),
                            piv)
            olog = jnp.where(pivlanes == s0 + jc, o1, olog)
            olist = jnp.where(wlanes == jc, o1, olist)
            mult3 = jnp.where(below, colv3 / safe, 0.0)            # (8, ml)
            mult = upk(mult3)                                      # (1, m)
            mbuf = jnp.where(wrows == jc, mult, mbuf)
            # in-strip elimination: rows jc+1.. of the strip only.  In the
            # flat path the (1, m) winner mask broadcasts straight against
            # st; packed paths unpack it first.  Either way ucol needs no
            # o1 — keeping o1's reduce off the critical chain.
            wmask = winner if not packable else (
                upk(jnp.where(winner, f32(1), f32(0))) != 0)        # (1, m)
            ucol = jnp.sum(jnp.where(wmask, st, 0.0), axis=1,
                           keepdims=True)
            ucol = jnp.where(wrows > jc, ucol, 0.0)                # (W, 1)
            st = st - ucol * mult
            return st, mbuf, olist, posk, piv, olog

        # columns unrolled: the fori carry (st + mbuf, ~2x(W,m) fp32) would
        # spill/reload through VMEM every iteration; with static jc the
        # values stay live and the masked wrows==jc selects fold to slices
        carry = (st, mbuf, olist, posk, piv, olog)
        for jc in range(_W):
            carry = col_body(jc, carry)
        st, mbuf, olist, posk, piv, olog = carry
        t_ref[pl.ds(s0, _W), :] = st.astype(dt)

        # ---- deferred rank-W update of all future strips (MXU) ------------
        # The pivot-lane selector is built TRANSPOSED, (W, m): an (m, W)
        # one-hot pads its lane dim to 128 (i.e. 16x the memory — 33 MB of
        # kernel stack at m=65536), so the extractions contract lane-vs-lane
        # (A @ B^T form, native on the MXU).
        mq = mbuf.astype(dt)
        selT = (jnp.swapaxes(olist, 0, 1) == lanes).astype(dt)  # (W, m)
        hi = jax.lax.Precision.HIGHEST if dt == f32 else None
        dnums = (((1,), (1,)), ((), ()))  # contract lanes of both operands

        def sel_extract(x):
            return jax.lax.dot_general(
                x, selT, dnums, preferred_element_type=f32, precision=hi
            )

        # N[j', j] = M[j', o_j]; strictly upper by construction (mult of
        # column j' is zero at pivot lanes o_j, j <= j')
        nmat = sel_extract(mq)
        # Vinv = (I + N)^{-1} via the Neumann series (N nilpotent)
        eye = (wrows == wlanes).astype(f32)
        vinv = eye - nmat
        p = -nmat
        for _ in range(_W - 2):
            p = jnp.dot(-nmat, p, preferred_element_type=f32)
            vinv = vinv + p

        def upd_body(s2, _):
            so = pl.multiple_of(s2 * _W, _W)
            tk = t_ref[pl.ds(so, _W), :]                       # (W, m)
            u = jnp.dot(sel_extract(tk), vinv,
                        preferred_element_type=f32)            # (W, W)
            upd = jnp.dot(u.astype(dt), mq, preferred_element_type=f32,
                          precision=hi)
            t_ref[pl.ds(so, _W), :] = (tk.astype(f32) - upd).astype(dt)
            return 0

        jax.lax.fori_loop(s + 1, nstrips, upd_body, 0)
        return posk, piv, olog

    posk, piv, olog = jax.lax.fori_loop(
        0, nstrips, strip_body, (posk, piv, olog)
    )
    pos = _posk_final(posk, quant16)

    piv_ref[:] = piv
    if roll_packed and packable:
        # int32 unpack straight into the output ref (upf_ref is f32-typed)
        for s in range(8):
            pos_ref[0:1, (7 - s) * ml:(8 - s) * ml] = pos[s:s + 1, :]
    else:
        pos_ref[:] = upk(pos)
    glist_ref[:] = olog  # olog[j] == final occupant of position off+j


def _strip_pivot_kernel_gm(
    meta_ref, panel_ref, pos_in_ref,
    piv_ref, pos_ref, glist_ref,
    t_ref, chunk_ref, sem,
    *, r: int, m: int, nchunk: int, ch: int, quant16: bool = False,
    stub: str = "", v2: bool = False, defer_full: bool = False,
):
    """Group-major strip pivot kernel (round 3, VERDICT r2 item 1).

    The flat kernel's per-column chain runs on (1, m) vectors — ONE sublane
    of every vreg, 1/8 VPU width — and dominated the A1 stage (331 ms of
    the 1766 ms n=65536 ALL_BF16 factorization).  Mosaic rejects
    lane<->sublane value casts, so instead the ENTIRE kernel works in a
    group-major row space: original row ``sigma(s, l) = (7-s)*ml + l`` with
    ml = m/8 (the reversed-row split the interpret-mode packed path always
    used), where every chain op is an (8, ml) FULL vector tile.

      * the transposed panel is stored S-MAJOR, ``t_ref[s, c, l] =
        panel[sigma(s, l), c]``: chunk loads write whole (r, ch) tiles of
        one s-plane (``ml % ch == 0`` keeps chunks inside a plane), and
        strip reads slice the aligned sublane range [s0, s0+W);
      * strip values transpose (1,0,2) between S-major storage and the
        C-major (W, 8, ml) working form once per strip (compiled-verified
        on this toolchain) — colv for column jc is then ``st[jc]``, a free
        dim-0 tile select (the flat kernel paid a masked (W, m) reduce);
      * the deferred rank-W updates contract the packed row space with
        batch-dim-0 ``dot_general`` (compiled-verified; multi-dim
        contraction and batch-at-dim-1 are both rejected), summing 8
        per-plane (W, W) partials — each selector row has exactly ONE
        nonzero, so every partial sum is exact and the kernel is
        BIT-IDENTICAL to the flat kernel (tested);
      * ``pos`` crosses the kernel boundary in group-major (8, ml) form;
        the wrapper converts with an XLA reshape+reverse of the (m,) int32
        map — trivial at these sizes.
    """
    dt = t_ref.dtype
    f32 = jnp.float32
    ml = m // 8
    jj0 = pl.multiple_of(meta_ref[1], min(r, 128))

    def chunk_dma(slot, c):
        return pltpu.make_async_copy(
            panel_ref.at[pl.ds(c * ch, ch), pl.ds(jj0, r)],
            chunk_ref.at[slot],
            sem.at[slot],
        )

    chunk_dma(0, 0).start()
    for c in range(nchunk):
        if c + 1 < nchunk:
            chunk_dma((c + 1) % 2, c + 1).start()
        chunk_dma(c % 2, c).wait()
        sp = 7 - (c * ch) // ml          # static: the chunk's s-plane
        l0 = (c * ch) % ml
        t_ref[sp, :, pl.ds(l0, ch)] = jnp.swapaxes(
            chunk_ref[c % 2].astype(dt), 0, 1
        )

    off = meta_ref[0]
    pivlanes = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    wlanes = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
    wrows = jax.lax.broadcasted_iota(jnp.int32, (_W, 1), 0)
    wrows3 = jax.lax.broadcasted_iota(jnp.int32, (_W, 1, 1), 0)
    # lanes3[s, l] = sigma(s, l), the original row id at gm position (s, l)
    lanes3 = (
        (7 - jax.lax.broadcasted_iota(jnp.int32, (8, ml), 0)) * ml
        + jax.lax.broadcasted_iota(jnp.int32, (8, ml), 1)
    )

    posk = _posk_init(pos_in_ref[:], quant16)        # (8, ml) state
    piv = pivlanes + off
    olog = pivlanes + off
    nstrips = r // _W
    hi = jax.lax.Precision.HIGHEST if dt == f32 else None
    bdn = (((2,), (2,)), ((0,), (0,)))   # batch s-planes, contract lanes

    def deferred_updates(mq_s, olist, s):
        """Rank-W MXU update of all future strips from this strip's
        multipliers (S-major (8, W, ml) ``mq_s``) and pivot lanes."""
        sel_s = (
            jnp.swapaxes(olist, 0, 1)[None] == lanes3[:, None, :]
        ).astype(dt)                                             # (8, W, ml)

        def sel_extract(x_s):
            # (8, W, ml) -> (W, W): x[j', o_j] — per-plane batched dots,
            # exactly one nonzero selector per (j', j) so the 8-partial sum
            # is bit-identical to the flat kernel's single m-lane dot
            p = jax.lax.dot_general(
                x_s, sel_s, bdn, preferred_element_type=f32, precision=hi
            )
            return jnp.sum(p, axis=0)

        nmat = sel_extract(mq_s)
        eye = (wrows == wlanes).astype(f32)
        vinv = eye - nmat
        p = -nmat
        for _ in range(_W - 2):
            p = jnp.dot(-nmat, p, preferred_element_type=f32)
            vinv = vinv + p

        def upd_body(s2, _):
            so = pl.multiple_of(s2 * _W, _W)
            tk = t_ref[:, pl.ds(so, _W), :]                     # (8, W, ml)
            u = jnp.dot(sel_extract(tk), vinv,
                        preferred_element_type=f32)             # (W, W)
            ub = jnp.broadcast_to(u.astype(dt)[None], (8, _W, _W))
            upd = jax.lax.dot_general(
                ub, mq_s, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32, precision=hi,
            )                                                    # (8, W, ml)
            t_ref[:, pl.ds(so, _W), :] = (tk.astype(f32) - upd).astype(dt)
            return 0

        def upd_full():
            """One full-panel masked rank-W update instead of the per-chunk
            tail loop (``MPF_A1_DEFER=full``, round 4): the round-4 chip
            attribution pinned ~79% of A1 on the per-chunk loop's tiny
            (W-row output) MXU dots; the full-panel form runs the same
            row-independent arithmetic as THREE r-row dots (~10x better MXU
            shapes) with frozen rows masked to an exact no-op (u = 0 =>
            tk - 0, and the f32->dt cast of an exact dt value is identity)
            — bit-identical to the chunk loop (tested)."""
            tk = t_ref[:, :, :]                                 # (8, r, ml)
            p = jax.lax.dot_general(
                tk, sel_s, bdn, preferred_element_type=f32, precision=hi
            )                                                    # (8, r, W)
            u = jnp.dot(jnp.sum(p, axis=0), vinv,
                        preferred_element_type=f32)              # (r, W)
            rows_r = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
            u = jnp.where(rows_r >= (s + 1) * _W, u, 0.0)
            ub = jnp.broadcast_to(u.astype(dt)[None], (8, r, _W))
            upd = jax.lax.dot_general(
                ub, mq_s, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32, precision=hi,
            )                                                    # (8, r, ml)
            t_ref[:, :, :] = (tk.astype(f32) - upd).astype(dt)

        if "defer" not in stub:  # stub: timing attribution (results WRONG)
            if defer_full:
                @pl.when(s + 1 < nstrips)  # last strip: nothing to update
                def _():
                    upd_full()
            else:
                jax.lax.fori_loop(s + 1, nstrips, upd_body, 0)

    def search_or_stub(colv3, posk, d2):
        if "search" in stub:  # stub: diagonal pivot, no reduce (WRONG)
            winner = posk == ((jnp.int32(131070) - d2) if quant16 else d2)
            cpk = jnp.zeros((1, 1), jnp.int32) + d2
            safe = jnp.ones((1, 1), f32)
            return winner, posk, cpk, safe
        return _search_column(colv3, posk, d2, quant16)

    def strip_body(s, carry0):
        posk, piv, olog = carry0
        s0 = pl.multiple_of(s * _W, _W)
        # C-major working strip: st[jc] = column jc's values over (8, ml)
        st = jnp.transpose(
            t_ref[:, pl.ds(s0, _W), :].astype(f32), (1, 0, 2)
        )
        mbuf = jnp.zeros((_W, 8, ml), f32)
        olist = jnp.zeros((1, _W), jnp.int32)

        def col_body(jc, carry):
            st, mbuf, olist, posk, piv, olog = carry
            d2 = 2 * (off + s0 + jc)
            colv3 = st[jc]                             # free tile select
            winner, posk, cpk, safe = search_or_stub(colv3, posk, d2)
            below = _below_diag(posk, d2, quant16)
            o1 = jnp.sum(jnp.where(winner, lanes3, 0), keepdims=True
                         ).reshape(1, 1)
            piv = jnp.where(pivlanes == s0 + jc,
                            jax.lax.shift_right_logical(cpk, jnp.int32(1)),
                            piv)
            olog = jnp.where(pivlanes == s0 + jc, o1, olog)
            olist = jnp.where(wlanes == jc, o1, olist)
            mult3 = jnp.where(below, colv3 / safe, 0.0)        # (8, ml)
            mbuf = jnp.where(wrows3 == jc, mult3[None], mbuf)
            if "elim" in stub:  # timing-attribution stub (results WRONG)
                return st, mbuf, olist, posk, piv, olog
            if jc + 1 == _W:  # last strip column: nothing right of it
                return st, mbuf, olist, posk, piv, olog
            # in-strip elimination, STATIC-SLICED to the columns right of jc
            # (round 5, VERDICT r4 item 4): jc is unrolled, so both the
            # winner-row extraction reduce and the rank-1 update run on
            # (W-jc-1, 8, ml) instead of the full strip — the old full-width
            # form computed the masked columns' x - 0 no-ops anyway
            # (bit-identical; ~halves the in-strip VPU work, which the
            # round-4 chip attribution put at ~34% of A1)
            rest = st[jc + 1:]
            ucol = jnp.sum(
                jnp.sum(jnp.where(winner[None], rest, 0.0), axis=2,
                        keepdims=True),
                axis=1, keepdims=True,
            )                                                   # (W-jc-1,1,1)
            st = jnp.concatenate(
                [st[: jc + 1], rest - ucol * mult3[None]], axis=0
            )
            return st, mbuf, olist, posk, piv, olog

        carry = (st, mbuf, olist, posk, piv, olog)
        for jc in range(_W):
            carry = col_body(jc, carry)
        st, mbuf, olist, posk, piv, olog = carry
        t_ref[:, pl.ds(s0, _W), :] = jnp.transpose(st, (1, 0, 2)).astype(dt)
        deferred_updates(jnp.transpose(mbuf.astype(dt), (1, 0, 2)), olist, s)
        return posk, piv, olog

    def strip_body_v2(s, carry0):
        """S-major strip body (round 4, ``MPF_A1_V2``): the strip stays in
        its (8, W, ml) storage layout — column jc is the free dim-1 slice
        ``st[:, jc, :]`` (no per-strip C-major transposes) — and the
        in-strip elimination's winner-row extraction runs as ONE exact
        one-hot MXU dot per column instead of a (W, 8, ml) masked
        double-reduce on the VPU (the dominant per-column cost: round-4
        attribution measured 4.35 us/column total at m=65536, ~1.3 of it
        this extraction).  Multiplier rows accumulate in a Python list
        (columns are unrolled) and stack once per strip, replacing the
        per-column (W, 8, ml) mbuf select.  One-hot extraction under
        HIGHEST is bit-exact (same argument as ``sel_extract``: exactly
        one nonzero per partial, bf16x3 recombination exact), so v1/v2 are
        bit-identical (tested)."""
        posk, piv, olog = carry0
        s0 = pl.multiple_of(s * _W, _W)
        st = t_ref[:, pl.ds(s0, _W), :].astype(f32)    # (8, W, ml) S-major
        olist = jnp.zeros((1, _W), jnp.int32)
        mults = []
        wcol = jax.lax.broadcasted_iota(jnp.int32, (1, _W, 1), 1)

        def col_body(jc, carry):
            st, olist, posk, piv, olog = carry
            d2 = 2 * (off + s0 + jc)
            colv3 = st[:, jc, :]                       # free dim-1 slice
            winner, posk, cpk, safe = search_or_stub(colv3, posk, d2)
            below = _below_diag(posk, d2, quant16)
            o1 = jnp.sum(jnp.where(winner, lanes3, 0), keepdims=True
                         ).reshape(1, 1)
            piv = jnp.where(pivlanes == s0 + jc,
                            jax.lax.shift_right_logical(cpk, jnp.int32(1)),
                            piv)
            olog = jnp.where(pivlanes == s0 + jc, o1, olog)
            olist = jnp.where(wlanes == jc, o1, olist)
            mult3 = jnp.where(below, colv3 / safe, 0.0)        # (8, ml)
            mults.append(mult3)
            if "elim" in stub:  # timing-attribution stub (results WRONG)
                return st, olist, posk, piv, olog
            # winner-row values of ALL strip columns: one one-hot MXU dot
            # (batch s-planes, contract lanes — exactly one nonzero lane
            # mesh-wide, so the plane sum is exact)
            oh = winner.astype(f32)[:, None, :]                 # (8, 1, ml)
            p = jax.lax.dot_general(
                st, oh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                   # (8, W, 1)
            uvec = jnp.sum(p, axis=0, keepdims=True)            # (1, W, 1)
            uvec = jnp.where(wcol > jc, uvec, 0.0)
            st = st - mult3[:, None, :] * uvec
            return st, olist, posk, piv, olog

        carry = (st, olist, posk, piv, olog)
        for jc in range(_W):
            carry = col_body(jc, carry)
        st, olist, posk, piv, olog = carry
        t_ref[:, pl.ds(s0, _W), :] = st.astype(dt)
        mq_s = jnp.stack(mults, axis=1).astype(dt)              # (8, W, ml)
        deferred_updates(mq_s, olist, s)
        return posk, piv, olog

    posk, piv, olog = jax.lax.fori_loop(
        0, nstrips, strip_body_v2 if v2 else strip_body, (posk, piv, olog)
    )
    piv_ref[:] = piv
    pos_ref[:] = _posk_final(posk, quant16)
    glist_ref[:] = olog


@functools.lru_cache(maxsize=64)
def _build_strip_pivot(m: int, w: int, r: int, in_dtype_name: str,
                       panel_dtype_name: str, interpret: bool = False,
                       quant16_override: bool | None = None,
                       gm: bool = False, stub: str = "", v2: bool = False,
                       defer_full: bool = False):
    in_dtype = jnp.dtype(in_dtype_name)
    panel_dtype = jnp.dtype(panel_dtype_name)
    # largest chunk that divides m (the chunk loop is trace-unrolled, so ch
    # must divide m exactly; gcd keeps m = 512 (mod 1024) windows — which
    # the _fused_ok gates admit — off the assert)
    ch = m if m <= _CHUNK else math.gcd(m, _CHUNK)
    assert r % _W == 0 and m % ch == 0 and ch % _W == 0, (m, r, ch)
    # roll_packed: the full-vector-width search chain for compiled mode.
    # Gated behind MPF_ROLL_PACK=1 until pltpu.roll's per-sublane stride
    # is validated on this target (round-3 bring-up: the strided roll
    # compiled but applied a uniform shift, breaking the packing).
    import os
    # quant16: single-reduce pivot search for bf16 panels (the stored strip
    # values are bf16-representable; in-strip fp32 corrections only add low
    # bits that a bf16-granular pivot choice may ignore).  The 16-bit
    # inverted-position field caps the window height at 65536 rows.
    # Resolved by the caller (strip_panel_pivots) so the env knob is part
    # of this builder's lru_cache key; the in-builder fallback serves only
    # direct _build_strip_pivot callers (tools).
    quant16 = (
        panel_dtype == jnp.bfloat16
        and m <= 65536
        and os.environ.get("MPF_QUANT16", "1") != "0"
    ) if quant16_override is None else quant16_override
    # group-major kernel: the full-vector-width row space (see
    # `_strip_pivot_kernel_gm`); bit-identical to the flat kernel, so it is
    # the default wherever its layout constraints hold (the wrapper decides
    # and passes ``gm`` explicitly — it is part of the build cache key)
    if gm:
        ml = m // 8
        chg = ml if ml <= _CHUNK else math.gcd(ml, _CHUNK)
        kernel = functools.partial(
            _strip_pivot_kernel_gm, r=r, m=m, nchunk=m // chg, ch=chg,
            quant16=quant16, stub=stub, v2=v2, defer_full=defer_full,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,  # meta (2,) = [off, jj0]
                grid=(),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),   # (m, w) slab HBM
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # pos in (8, ml)
                ],
                out_specs=(
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # piv (1, r)
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # pos out (8, ml)
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # glist (1, r)
                ),
                scratch_shapes=[
                    pltpu.VMEM((8, r, ml), panel_dtype),   # S-major panel
                    pltpu.VMEM((2, chg, r), in_dtype),     # transpose chunks
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, r), jnp.int32),
                jax.ShapeDtypeStruct((8, ml), jnp.int32),
                jax.ShapeDtypeStruct((1, r), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(
                # S-major panel + chunk ring + the C-major strip/multiplier
                # values (2 x (W, 8, ml) f32) + chain temporaries
                vmem_limit_bytes=int(min(
                    m * r * panel_dtype.itemsize
                    + 2 * chg * r * in_dtype.itemsize
                    + 128 * m + (48 << 20),
                    120 << 20,
                )),
            ),
            interpret=interpret,
        )
    kernel = functools.partial(
        _strip_pivot_kernel, r=r, m=m, nchunk=m // ch, ch=ch,
        allow_packed=interpret,
        roll_packed=(not interpret) and m % 1024 == 0
        and os.environ.get("MPF_ROLL_PACK") == "1",
        quant16=quant16,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # meta (2,) = [off, jj0]
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # (m, w) slab (HBM)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # pos in (1, m)
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),  # piv (1, r)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # pos out (1, m)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # glist/olog (1, r)
            ),
            scratch_shapes=[
                pltpu.VMEM((r, m), panel_dtype),          # transposed panel
                pltpu.VMEM((2, ch, r), in_dtype),         # transpose chunks
                pltpu.VMEM((1, m), jnp.float32),          # packed-chain unpack
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, r), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            # transposed panel + chunk ring + the (1|8, m) search/multiplier
            # temporaries (pos/perm/st/mbuf/sel and their compare masks)
            vmem_limit_bytes=int(min(
                m * r * panel_dtype.itemsize + 2 * ch * r * in_dtype.itemsize
                + 128 * m + (48 << 20),
                120 << 20,
            )),
        ),
        interpret=interpret,
    )


def strip_panel_pivots(panel, off, pos, panel_dtype=None, interpret=False,
                       jj0=0, r=None, _quant16=None, pos_bound=None):
    """Strip-blocked virtual-pivoting panel LU.

    ``panel``: (m, w) working-precision slab (values at ORIGINAL row
    positions; rows whose ``pos`` is below ``off`` are frozen).  The
    r-wide panel factored is columns [``jj0``, ``jj0``+r) — read straight
    out of the slab in HBM, so callers never materialize a panel slice
    (``jj0`` must be a multiple of min(r, 128) for lane-aligned DMA; the
    default jj0=0, r=w factors the whole slab width).
    ``off``: traced int32 — the current position of the diagonal.
    ``pos`` (m,): original row -> current position (block-column-local,
    carried across the panels of a block column).

    Returns ``(piv, pos', glist)``: 0-based pivot *positions* (r,), the
    updated position map, and ``glist[j]`` — the original row chosen as
    column j's pivot == the final occupant of position off+j (positions
    <= the current diagonal never change again).  No position->row map is
    maintained; callers compose their global row maps boundedly from
    ``glist`` + ``pos``.  The low-precision factors are discarded
    (reference semantics, `MPF.cu:120-145`).

    Dead rows (round 5, deferred-exchange driver): ``pos`` entries equal to
    ``2**31 - 1`` mark rows whose true value lives elsewhere (stale
    physical copies, unused overflow slots).  The sentinel is excluded from
    the pivot search, swaps, and elimination in BOTH posk encodings —
    quant16: posk = 131070 - (sentinel << 1 mod 2^32) = 131072 > every
    id2; exact: posk = -2 fails every >= d2 test — and round-trips
    bit-exactly through ``_posk_final`` (logical shift of -2 = the
    sentinel).  ``pos_bound``: exclusive upper bound of LIVE position
    values (defaults to m); the quant16 single-reduce search packs
    positions into a 16-bit inverted field, so it is gated on the position
    RANGE, not the slab height (a deferred-exchange slab is m_logical +
    overflow rows tall while its positions stay < m_logical)."""
    import os

    m, w = panel.shape
    r = w if r is None else r
    panel_dtype = jnp.dtype(panel_dtype or panel.dtype)
    meta = jnp.stack(
        [jnp.asarray(off, jnp.int32), jnp.asarray(jj0, jnp.int32)]
    )
    gm = m % 1024 == 0 and os.environ.get("MPF_GM", "1") != "0"
    if _quant16 is None:
        # resolve the env knob HERE, not inside the lru_cache'd builder —
        # otherwise flipping MPF_QUANT16 in-process silently returns the
        # cached kernel (it is a trace-time A/B knob, e.g. the 32kattr
        # sweep legs)
        _quant16 = (
            panel_dtype == jnp.bfloat16
            and (pos_bound if pos_bound is not None else m) <= 65536
            and os.environ.get("MPF_QUANT16", "1") != "0"
        )
    stub = os.environ.get("MPF_A1_STUB", "")  # timing attribution ONLY
    if stub and not gm:
        # only the group-major kernel implements the stubs — a silent
        # un-stubbed (correct!) run would mislead timing attribution
        # (ADVICE r4 item 1)
        raise RuntimeError(
            f"MPF_A1_STUB={stub!r} requires the group-major kernel "
            f"(m % 1024 == 0 and MPF_GM != 0; got m={m}, "
            f"MPF_GM={os.environ.get('MPF_GM', '1')!r})"
        )
    fn = _build_strip_pivot(
        m, w, r, panel.dtype.name, panel_dtype.name, interpret, _quant16, gm,
        stub,
        gm and os.environ.get("MPF_A1_V2", "0") == "1",
        gm and os.environ.get("MPF_A1_DEFER", "full") == "full",
    )
    if gm:
        # group-major kernel: pos crosses the boundary as the (8, ml)
        # reversed-row split (XLA-side conversion of an (m,) int32 map)
        ml = m // 8
        piv, pos2, glist = fn(meta, panel, pos.reshape(8, ml)[::-1])
        return piv[0], pos2[::-1].reshape(m), glist[0]
    piv, pos2, glist = fn(meta, panel, pos.reshape(1, m))
    return piv[0], pos2[0], glist[0]
