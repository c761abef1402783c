"""Fused panel-step kernels (round 2): pivot-row assembly + streaming update.

Together with the strip-blocked pivot kernel (`ops/panel_strip.py`) these
implement one r-wide panel step of the blocked factorization as THREE
Pallas calls and no other slab-touching XLA ops — replacing the round-1
sequence (XLA dynamic slices, aliased LASWP custom call with its defensive
copies, masked where-passes, separate TRSM/GEMM dispatches) that cost
~2.4 ms/panel at n=16384:

  * :func:`rowblock_assemble` (kernel A2) — DMA-gathers the r virtual
    pivot rows of the slab (granule-aligned reads; row indices arrive as
    scalar prefetch from the pivot kernel), re-factors the diagonal block
    without pivoting in fp32 (`dgetf2_native_npv.cu:11-36` semantics plus
    the zero-pivot ``info`` guard the reference lacks), fuses the
    triangular inverses, and emits the finished (r, bc) row block
    [L-part | diag LU | U12 = L11^{-1} A12] plus U11^{-1} for the L21
    GEMM.  All column selection/placement is done with one-hot MXU
    products — no dynamic lane indexing.
  * :func:`panel_apply_update` (kernel B) — streams the (m, bc) slab once
    (grid over row blocks, output aliased to the input: in-place, no XLA
    copies): per block computes L21 = A[:, panel] U11^{-1} and the
    rank-r trailing subtract A -= L21 U12, masked by the carried virtual
    row positions (rows at positions < j0+r are frozen).  This fuses the
    reference's LASWP + cublasDtrsm + cublasDgemm slab work
    (`MPF.cu:162,215-239`) into a single HBM pass.

Virtual pivoting contract (see `models/mpf.py`): within a block column no
row ever moves; ``pos``/``perm`` carry the row maps and one bounded
physical exchange runs per block column, not per panel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _granule(dtype) -> int:
    """Sublane granule for dynamic row slices of a 2D-tiled buffer."""
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


# --------------------------------------------------------------------------
# Kernel A2: gather pivot rows, re-factor diagonal, build the row block
# --------------------------------------------------------------------------

def _npv_inv_values(diag, r):
    """No-pivot LU of an (r, r) fp32 block with fused L^{-1}/U^{-1}, on
    values (in-kernel).  Same math as `panel_pallas._npv_inv_kernel`."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    eye = (rows == cols).astype(jnp.float32)

    def body(j, carry):
        b, li, info = carry
        colv = jnp.sum(jnp.where(cols == j, b, 0.0), axis=1, keepdims=True)
        pivval = jnp.sum(jnp.where(rows == j, colv, 0.0), axis=0, keepdims=True)
        info = jnp.where((pivval == 0) & (info == 0), j + 1, info)
        safe = jnp.where(pivval == 0, jnp.ones_like(pivval), pivval)
        mult = jnp.where(rows > j, colv / safe, 0.0)
        urow = jnp.sum(jnp.where(rows == j, b, 0.0), axis=0, keepdims=True)
        urow_m = jnp.where(cols > j, urow, 0.0)
        b = jnp.where((cols == j) & (rows > j), mult, b - mult * urow_m)
        lrow = jnp.sum(jnp.where(rows == j, li, 0.0), axis=0, keepdims=True)
        li = li - mult * lrow
        return b, li, info

    lu, linv, info = jax.lax.fori_loop(
        0, r, body, (diag, eye, jnp.zeros((1, 1), jnp.int32))
    )

    # backward substitution for U^{-1}
    def bback(t, y):
        i = r - 1 - t
        urow = jnp.sum(jnp.where(rows == i, lu, 0.0), axis=0, keepdims=True)
        uii = jnp.sum(jnp.where(cols == i, urow, 0.0), axis=1, keepdims=True)
        safe = jnp.where(uii == 0, jnp.ones_like(uii), uii)
        urow_m = jnp.where(cols > i, urow, 0.0)
        acc = jnp.dot(urow_m, y, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        ei = (cols == i).astype(jnp.float32)
        return jnp.where(rows == i, (ei - acc) / safe, y)

    uinv = jax.lax.fori_loop(0, r, bback, jnp.zeros((r, r), jnp.float32))
    return lu, linv, uinv, info


def _rowblock_kernel(
    glist_ref, meta_ref, slab_ref,
    rowblock_ref, uinv_ref, info_ref,
    staged_ref, gbuf_ref, sems,
    *, r: int, bc: int, g: int,
):
    f32 = jnp.float32
    w = staged_ref.dtype
    jj0 = meta_ref[0]
    hi = jax.lax.Precision.HIGHEST if w == f32 else None

    # ---- gather the r pivot rows (granule-aligned DMAs, 8-row batches;
    # fori over batches keeps the Mosaic binary small — the fully unrolled
    # form contributed to the n=32768 2 GB executable blow-up).  Batches are
    # double-buffered (round 3): batch bi+1's eight window DMAs are in
    # flight while batch bi's rows are selected — the A2 stage is
    # DMA-latency-bound (128 small window reads per panel) --------------------
    grows = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    nbat = r // 8

    def start_batch(bi, slot):
        j0b = bi * 8
        for jb in range(8):
            row = glist_ref[j0b + jb]
            gs = pl.multiple_of((row // g) * g, g)
            pltpu.make_async_copy(
                slab_ref.at[pl.ds(gs, g), :], gbuf_ref.at[slot, jb],
                sems.at[slot * 8 + jb],
            ).start()

    start_batch(0, 0)

    def gather_batch(bi, _):
        @pl.when(bi + 1 < nbat)
        def _():
            start_batch(bi + 1, (bi + 1) % 2)

        j0b = pl.multiple_of(bi * 8, 8)
        slot = bi % 2
        rows8 = []
        for jb in range(8):
            row = glist_ref[j0b + jb]
            pltpu.make_async_copy(
                slab_ref.at[pl.ds(pl.multiple_of((row // g) * g, g), g), :],
                gbuf_ref.at[slot, jb], sems.at[slot * 8 + jb],
            ).wait()
            rows8.append(jnp.sum(
                jnp.where(grows == row % g, gbuf_ref[slot, jb].astype(f32), 0.0),
                axis=0, keepdims=True,
            ))  # (1, bc) — the selected row
        staged_ref[pl.ds(j0b, 8), :] = jnp.concatenate(rows8, axis=0).astype(w)
        return 0

    jax.lax.fori_loop(0, nbat, gather_batch, 0)

    staged = staged_ref[:]                                   # (r, bc)
    lanebc = jax.lax.broadcasted_iota(jnp.int32, (1, bc), 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    bcr = jax.lax.broadcasted_iota(jnp.int32, (bc, 1), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)

    # ---- diagonal block extraction + no-pivot refactor (fp32) -------------
    e2 = (lanebc == jj0 + rr).astype(w)                      # (r, bc) one-hot
    e2t = (bcr == jj0 + rc).astype(w)                        # (bc, r) one-hot
    diag = jnp.dot(staged, e2t, preferred_element_type=f32, precision=hi)
    lu, linv, uinv, info = _npv_inv_values(diag, r)
    info_ref[0, 0] = info[0, 0]
    uinv_ref[:] = uinv.astype(w)

    # ---- row block: [staged L-part | diag LU | U12 = L11^{-1} A12] --------
    # U12 at working precision (the reference's cublasDtrsm is full working
    # precision, `MPF.cu:215-225`; only the TRAILING GEMM operands follow
    # policy.gemm_in)
    u12 = jnp.dot(linv.astype(w) if w != f32 else linv, staged,
                  preferred_element_type=f32, precision=hi)
    placed = jnp.dot(lu.astype(w), e2, preferred_element_type=f32,
                     precision=hi)                            # diag at panel lanes
    in_panel = (lanebc >= jj0) & (lanebc < jj0 + r)
    left = lanebc < jj0
    rowblock_ref[:] = jnp.where(
        in_panel, placed.astype(w), jnp.where(left, staged, u12.astype(w))
    )


@functools.lru_cache(maxsize=128)
def _build_rowblock(m: int, bc: int, r: int, dtype_name: str,
                    interpret: bool = False):
    w = jnp.dtype(dtype_name)
    g = _granule(w)
    kernel = functools.partial(_rowblock_kernel, r=r, bc=bc, g=g)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # glist (r,), meta (1,) = [jj0]
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # slab (m, bc)
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),   # rowblock (r, bc)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # uinv (r, r)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # info (1, 1)
            ),
            scratch_shapes=[
                pltpu.VMEM((r, bc), w),                  # staged pivot rows
                pltpu.VMEM((2, 8, g, bc), w),            # batch ring (x2)
                pltpu.SemaphoreType.DMA((16,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, bc), w),
            jax.ShapeDtypeStruct((r, r), w),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((r + 16 * g) * bc * w.itemsize + (48 << 20)),
        ),
        interpret=interpret,
    )


def rowblock_assemble(slab, glist, jj0, interpret=False):
    """Gather the r pivot rows ``glist`` of ``slab`` (m, bc), re-factor the
    (r, r) diagonal block at lane offset ``jj0`` without pivoting, and
    return ``(rowblock, uinv, info)``:

    * ``rowblock`` (r, bc) — the FINAL values of slab positions
      j0..j0+r: columns < jj0 carry the gathered L values, the panel
      columns carry the diagonal LU, columns > jj0+r carry
      U12 = L11^{-1} A12 (the reference's cublasDtrsm, `MPF.cu:215-225`).
    * ``uinv`` (r, r) — U11^{-1} for the L21 GEMM.
    * ``info`` — 1-based first zero pivot, 0 if clean.
    """
    m, bc = slab.shape
    r = glist.shape[0]
    rb, uinv, info = _build_rowblock(m, bc, r, slab.dtype.name, interpret)(
        glist.astype(jnp.int32), jnp.asarray(jj0, jnp.int32).reshape(1), slab
    )
    return rb, uinv, info[0, 0]


# --------------------------------------------------------------------------
# Kernel B: streaming masked L21 + trailing update (in place)
# --------------------------------------------------------------------------

def _apply_update_kernel(
    meta_ref, slab_ref, pos_ref, rowblock_ref, uinv_ref, out_ref,
    *, r: int, bc: int, rb: int, gemm_bf16: bool,
):
    f32 = jnp.float32
    w = slab_ref.dtype
    j0 = meta_ref[0]
    jj0 = meta_ref[1]
    hi = jax.lax.Precision.HIGHEST if w == f32 else None

    b = slab_ref[:]                                         # (RB, bc)
    posT = jnp.swapaxes(pos_ref[:], 0, 1)                   # (RB, 1) int32
    lanebc = jax.lax.broadcasted_iota(jnp.int32, (1, bc), 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    bcr = jax.lax.broadcasted_iota(jnp.int32, (bc, 1), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    e2 = (lanebc == jj0 + rr).astype(w)                     # (r, bc)
    e2t = (bcr == jj0 + rc).astype(w)                       # (bc, r)
    # full-shape int broadcasts BEFORE comparing: lane-replicated i1 vectors
    # hit Mosaic relayout limits on this target
    below_r = jnp.broadcast_to(posT, (rb, r)) >= j0 + r
    below_bc = jnp.broadcast_to(posT, (rb, bc)) >= j0 + r

    p = jnp.dot(b, e2t, preferred_element_type=f32, precision=hi)  # (RB, r)
    l21 = jnp.dot(p.astype(w) if w != f32 else p, uinv_ref[:],
                  preferred_element_type=f32, precision=hi)
    l21 = jnp.where(below_r, l21, 0.0).astype(w)
    placed = jnp.dot(l21, e2, preferred_element_type=f32, precision=hi)
    u12m = jnp.where(lanebc >= jj0 + r, rowblock_ref[:], jnp.zeros((), w))
    if gemm_bf16 and w != jnp.bfloat16:
        upd = jnp.dot(l21.astype(jnp.bfloat16), u12m.astype(jnp.bfloat16),
                      preferred_element_type=f32)
    else:
        upd = jnp.dot(l21, u12m, preferred_element_type=f32, precision=hi)

    in_panel = (lanebc >= jj0) & (lanebc < jj0 + r)
    new = jnp.where(in_panel, placed.astype(w),
                    (b.astype(f32) - upd).astype(w))
    out_ref[:] = jnp.where(below_bc, new, b)


@functools.lru_cache(maxsize=128)
def _build_apply_update(m: int, bc: int, r: int, rb: int, dtype_name: str,
                        gemm_bf16: bool, interpret: bool = False):
    w = jnp.dtype(dtype_name)
    assert m % rb == 0, (m, rb)
    kernel = functools.partial(
        _apply_update_kernel, r=r, bc=bc, rb=rb, gemm_bf16=gemm_bf16
    )
    nblk = m // rb
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # meta (2,) = [j0, jj0]
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((rb, bc), lambda i, meta: (i, 0),
                             memory_space=pltpu.VMEM),       # slab block
                pl.BlockSpec((1, rb), lambda i, meta: (0, i),
                             memory_space=pltpu.VMEM),       # pos block
                pl.BlockSpec((r, bc), lambda i, meta: (0, 0),
                             memory_space=pltpu.VMEM),       # rowblock
                pl.BlockSpec((r, r), lambda i, meta: (0, 0),
                             memory_space=pltpu.VMEM),       # uinv
            ],
            out_specs=pl.BlockSpec((rb, bc), lambda i, meta: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((m, bc), w),
        input_output_aliases={1: 0},  # slab (after 1 scalar-prefetch arg)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                (3 * rb + 2 * r) * bc * max(w.itemsize, 4) + (32 << 20)
            ),
        ),
        interpret=interpret,
    )


def _rows_gather_kernel(rows_ref, first_ref, slot_ref, a_ref, out_ref,
                        gbuf_ref, batch_ref, sems, *, nr: int, g: int):
    """Gather ``nr`` arbitrary rows of the (n, w) HBM matrix into a dense
    (nr, w) HBM output: granule-aligned window DMAs (single-row slices of a
    tiled 2D HBM ref are rejected by Mosaic) + in-VMEM row select, staged
    out in aligned 8-row batches.

    Consecutive rows from the same granule REUSE the previous window — the
    caller precomputes ``first`` (1 iff row i's granule differs from row
    i-1's) and ``slot`` (running count of distinct granules, mod 8), so on
    runs of adjacent source rows (diagonally dominant matrices: pivot rows
    ARE the band) the 8x window amplification disappears entirely.

    The outgoing batch is double-buffered (round 3, like the scatter
    kernel's window ping-pong): batch bi's write-back overlaps batch bi+1's
    window DMAs and row selects, instead of a synchronous start()+wait()
    serializing every 8 rows.  The 8-deep window-slot ring is likewise
    written from at most 8 rows ahead, so a slot's previous DMA has always
    been consumed before the (mod-8) reuse overwrites it."""
    f32 = jnp.float32
    grows = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)

    def out_dma(buf, j0):
        return pltpu.make_async_copy(
            batch_ref.at[buf], out_ref.at[pl.ds(j0, 8), :], sems.at[8 + buf]
        )

    def batch(bi, _):
        j0 = pl.multiple_of(bi * 8, 8)
        buf = bi % 2
        for jb in range(8):
            row = rows_ref[j0 + jb]
            gs = pl.multiple_of((row // g) * g, g)

            @pl.when(first_ref[j0 + jb] != 0)
            def _():
                s = slot_ref[j0 + jb]
                pltpu.make_async_copy(
                    a_ref.at[pl.ds(gs, g), :], gbuf_ref.at[s], sems.at[s]
                ).start()

        rows8 = []
        for jb in range(8):
            row = rows_ref[j0 + jb]
            s = slot_ref[j0 + jb]

            @pl.when(first_ref[j0 + jb] != 0)
            def _():
                pltpu.make_async_copy(
                    a_ref.at[pl.ds(pl.multiple_of((row // g) * g, g), g), :],
                    gbuf_ref.at[s], sems.at[s],
                ).wait()

            rows8.append(jnp.sum(
                jnp.where(grows == row % g, gbuf_ref[s].astype(f32), 0.0),
                axis=0, keepdims=True,
            ))

        @pl.when(bi >= 2)
        def _():  # this buffer's previous write must land before reuse
            out_dma(buf, pl.multiple_of((bi - 2) * 8, 8)).wait()

        batch_ref[buf] = jnp.concatenate(rows8, axis=0).astype(batch_ref.dtype)
        out_dma(buf, j0).start()
        return 0

    nb = nr // 8
    jax.lax.fori_loop(0, nb, batch, 0)
    out_dma((nb - 1) % 2, pl.multiple_of((nb - 1) * 8, 8)).wait()
    if nb >= 2:  # static
        out_dma(nb % 2, pl.multiple_of((nb - 2) * 8, 8)).wait()


@functools.lru_cache(maxsize=64)
def _build_rows_gather(n: int, w: int, nr: int, dtype_name: str,
                       interpret: bool = False):
    dt = jnp.dtype(dtype_name)
    g = _granule(dt)
    kernel = functools.partial(_rows_gather_kernel, nr=nr, g=g)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # rows (nr,), first (nr,), slot (nr,)
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # a (n, w) HBM
            out_specs=pl.BlockSpec(memory_space=pl.ANY),   # out (nr, w) HBM
            scratch_shapes=[
                pltpu.VMEM((8, g, w), dt),   # granule window ring
                pltpu.VMEM((2, 8, w), dt),   # outgoing batch (ping-pong)
                pltpu.SemaphoreType.DMA((10,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nr, w), dt),
        compiler_params=pltpu.CompilerParams(
            # ring + batch + row-select temporaries (pad generously: Mosaic's
            # scoped-stack accounting ran ~2 MB past the tight bound at
            # n=65536 bf16)
            vmem_limit_bytes=int(min(
                (8 * g + 16) * w * dt.itemsize + 8 * w * 4 + (24 << 20),
                120 << 20,
            )),
        ),
        interpret=interpret,
    )


def rows_gather(a, rows, interpret=False):
    """DMA gather of arbitrary ``rows`` (multiple of 8 of them) from an
    (n, w) matrix -> (len(rows), w)."""
    n, w = a.shape
    nr = int(rows.shape[0])
    g = _granule(a.dtype)
    rows = rows.astype(jnp.int32)
    gr = rows // g
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (gr[1:] != gr[:-1]).astype(jnp.int32)]
    )
    slot = (jnp.cumsum(first) - 1) % 8
    return _build_rows_gather(n, w, nr, a.dtype.name, interpret)(
        rows, first, slot.astype(jnp.int32), a
    )


def _rows_scatter_kernel(ds_ref, need_ref, act_ref, *rest,
                         nr: int, g: int, from_band: bool = False):
    """In-place scatter of ``nr`` rows into the (n, w) HBM matrix:
    a[ds[i], :] = vals[i, :] (dests in ANY order — window revisits are
    handled by the ping-pong wait discipline).  XLA lowers row scatter as a
    full-buffer rewrite (~2x the whole matrix per call — 11 ms per block
    column at n=32768); this kernel RMWs only the granule-aligned windows
    that actually contain destinations, and skips windows whose rows are
    all skipped moves (``need[i]``==0 — on diagonally-dominant matrices
    pivots rarely move, so the exchange cost scales with ACTUAL row
    movement).

    from_band (round 3): the value rows are the CURRENT band rows
    a[kb + i, :] read straight out of the aliased matrix in g-row tiles
    (dests are all outside the band, so the tile reads never race the
    window writes) — the driver no longer materializes a (bc, w) band copy
    or a values buffer for the exchange."""
    f32 = jnp.float32
    if from_band:
        kmeta_ref, a_in_ref, a_ref, wbuf, vtile, sems = rest
        vt = g          # value-tile height
    else:
        a_in_ref, vals_ref, a_ref, wbuf, vtile, sems = rest
        vt = 8
    grows = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    vrows = jax.lax.broadcasted_iota(jnp.int32, (vt, 1), 0)

    # Windows are double-buffered (round 3): the write-back of the finished
    # window overlaps the next window's read + row overlays, instead of the
    # fully synchronous write.wait() -> read.wait() sequence of round 2.
    # Invariant: a pending write (wpend==1) is always on slot 1-cur, so it
    # is awaited exactly when that slot is about to be reused for a read.
    def win_read(gr, slot):
        # reads go through the OUTPUT ref: on TPU it aliases the input
        # buffer (input_output_aliases), and in interpret mode — where the
        # two are distinct arrays — this makes window REVISITS (possible
        # since round 3's unsorted dests) see their own earlier writes
        return pltpu.make_async_copy(
            a_ref.at[pl.ds(pl.multiple_of(gr * g, g), g), :],
            wbuf.at[slot], sems.at[slot],
        )

    def win_write(gr, slot):
        return pltpu.make_async_copy(
            wbuf.at[slot], a_ref.at[pl.ds(pl.multiple_of(gr * g, g), g), :],
            sems.at[2 + slot],
        )

    if from_band:
        def vt_read(t):
            kb = pl.multiple_of(kmeta_ref[0] + t * g, g)
            return pltpu.make_async_copy(
                a_ref.at[pl.ds(kb, g), :], vtile, sems.at[4]
            )
    else:
        def vt_read(t):
            return pltpu.make_async_copy(vals_ref.at[t], vtile, sems.at[4])

    vt_read(0).start()
    vt_read(0).wait()

    def body(i, carry):
        last_gr, have, cur, wpend, wgr = carry
        # new values tile every vt rows (values stream in dest order)
        @pl.when((i % vt == 0) & (i > 0))
        def _():
            vt_read(i // vt).start()
            vt_read(i // vt).wait()

        gr = ds_ref[i] // g
        nd = need_ref[i] != 0
        switch = nd & ((gr != last_gr) | (have == 0))
        nxt = jnp.where(have == 0, cur, 1 - cur)

        @pl.when(switch & (wpend == 1))
        def _():  # slot nxt's previous write must land before its reuse;
            # ALSO before re-reading the same window (dests arrive in any
            # order since round 3 — a revisited window must see its pending
            # write).  wgr's write is always on slot nxt, so one wait covers
            # both hazards (the revisit read goes to slot nxt).
            win_write(wgr, nxt).wait()

        @pl.when(switch & (have == 1))
        def _():  # close the current window asynchronously
            win_write(last_gr, cur).start()

        @pl.when(switch)
        def _():
            win_read(gr, nxt).start()
            win_read(gr, nxt).wait()

        wgr = jnp.where(switch & (have == 1), last_gr, wgr)
        wpend = jnp.where(switch & (have == 1), jnp.int32(1), wpend)
        cur = jnp.where(switch, nxt, cur)
        last_gr = jnp.where(switch, gr, last_gr)
        have = jnp.where(switch, jnp.int32(1), have)

        @pl.when(nd & (act_ref[i] != 0))
        def _():
            vrow = jnp.sum(
                jnp.where(vrows == i % vt, vtile[:].astype(f32), 0.0),
                axis=0, keepdims=True,
            ).astype(wbuf.dtype)
            wbuf[cur] = jnp.where(grows == ds_ref[i] % g, vrow, wbuf[cur])

        return last_gr, have, cur, wpend, wgr

    last_gr, have, cur, wpend, wgr = jax.lax.fori_loop(
        0, nr, body,
        (jnp.int32(-1), jnp.int32(0), jnp.int32(0), jnp.int32(0),
         jnp.int32(0)),
    )

    @pl.when(wpend == 1)
    def _():
        win_write(wgr, 1 - cur).wait()

    @pl.when(have == 1)
    def _():
        win_write(last_gr, cur).start()
        win_write(last_gr, cur).wait()


@functools.lru_cache(maxsize=64)
def _build_rows_scatter(n: int, w: int, nr: int, dtype_name: str,
                        interpret: bool = False, from_band: bool = False):
    dt = jnp.dtype(dtype_name)
    g = _granule(dt)
    assert nr % 8 == 0, nr
    kernel = functools.partial(_rows_scatter_kernel, nr=nr, g=g,
                               from_band=from_band)
    if from_band:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]   # a only
        nsp = 4       # ds, need, act, kmeta
        vtile = pltpu.VMEM((g, w), dt)
        aliases = {4: 0}
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # a (n, w) HBM (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # vals (nr/8, 8, w) HBM
        ]
        nsp = 3
        vtile = pltpu.VMEM((8, w), dt)
        aliases = {3: 0}
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=(),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, g, w), dt),   # granule window (double-buffered)
                vtile,                       # values tile
                pltpu.SemaphoreType.DMA((5,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, w), dt),
        input_output_aliases=aliases,  # a (after the scalar-prefetch args)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(
                (2 * g + max(g, 8)) * w * dt.itemsize + 8 * w * 4 + (24 << 20),
                120 << 20
            )),
            has_side_effects=True,
        ),
        interpret=interpret,
    )


def rows_scatter_inplace(a, dests, vals, self_src=None, active=None,
                         interpret=False):
    """In-place bounded row scatter: a[dests[i], :] = vals[i, :].
    Among active rows, ``dests`` must be unique — OR duplicated only with
    bitwise-identical ``vals`` (then write order is immaterial).  The fused
    dist panel exchange relies on the relaxed form: when a pivot is chosen
    from inside the band, position off+j appears in both halves of its
    ``cand`` with the same row values (`parallel/dist_lu.py`).

    Dests are consumed IN THE GIVEN ORDER (round 3): the window ping-pong's
    pending write always sits on the about-to-be-reused slot and is awaited
    before every new window read, so revisits are safe and no sorting is
    required.  Earlier rounds argsorted dests and permuted ``vals`` to
    match — an XLA row gather of the full (nr, w) values buffer (~128 MB,
    several ms per block column at n=65536) purely to maximize
    consecutive-window dedup, which caller orders (band order: dests are
    near-ascending on the headline corpus) already provide.

    ``self_src`` (optional): the CURRENT physical row of each value — rows
    with dests[i] == self_src[i] are no-ops, and granule windows consisting
    only of no-ops are skipped entirely (the common case on diagonally
    dominant matrices, where pivots rarely move).

    ``active`` (optional bool): rows with active[i]==False are dropped
    (their dest may collide with anything — used by the distributed tiles'
    "my rows only" exchange)."""
    n, w = a.shape
    g = _granule(a.dtype)
    nr = int(dests.shape[0])
    act = (
        jnp.ones((nr,), jnp.int32) if active is None
        else active.astype(jnp.int32)
    )
    dests = jnp.where(act != 0, dests, 0)  # clamp dropped rows in-bounds
    ds = dests.astype(jnp.int32)
    vs = vals.reshape(nr // 8, 8, w)
    if self_src is None:
        nonself = act
    else:
        nonself = ((dests != jnp.where(act != 0, self_src, 0)) & (act != 0)
                   ).astype(jnp.int32)
    # window needed iff ANY of its destinations is a real (active) move
    wneed = jnp.zeros((n // g,), jnp.int32).at[dests // g].max(nonself)
    need = jnp.take(wneed, ds // g)
    return _build_rows_scatter(n, w, nr, a.dtype.name, interpret)(
        ds, need, act, a, vs
    )


def rows_scatter_from_band(a, k, dests, interpret=False):
    """Exchange scatter with values read from the band: a[dests[i], :] =
    a[k + i, :] for every i whose ``dests[i]`` lies OUTSIDE the band
    [k, k + nr).  In-band destinations are exactly the rows about to be
    overwritten by the caller's dynamic-update-slice of the gathered pivot
    rows (swap chains bottom out in the band, so an in-band dest always
    carries the same values the gather delivers), and self-moves are
    in-band by definition (dest == k + i) — both are skipped here.

    Replaces the round-2 sequence [band = a[k:k+nr] slice copy -> argsort
    -> jnp.take of the (nr, w) band into dest order -> vals-based scatter]:
    at n=65536 bf16 that moved ~3 extra full band passes (~256 MB each) of
    XLA slice/gather per block column before the RMW kernel even ran; here
    the band rows stream through a VMEM tile at DMA speed straight out of
    the aliased matrix (dests are outside the band, so tile reads never
    race the window writes).  ``k`` (traced) must be granule-aligned."""
    n, w = a.shape
    g = _granule(a.dtype)
    nr = int(dests.shape[0])
    k = jnp.asarray(k, jnp.int32)
    act = ((dests < k) | (dests >= k + nr)).astype(jnp.int32)
    ds = jnp.where(act != 0, dests, 0).astype(jnp.int32)
    # window needed iff ANY of its destinations is a real out-of-band move
    wneed = jnp.zeros((n // g,), jnp.int32).at[ds // g].max(act)
    need = jnp.take(wneed, ds // g)
    return _build_rows_scatter(n, w, nr, a.dtype.name, interpret, True)(
        ds, need, act, k.reshape(1), a
    )


def _trailing_sub_kernel(l_ref, u_ref, a_ref, out_ref, *, hi):
    f32 = jnp.float32
    acc = jnp.dot(l_ref[:], u_ref[:], preferred_element_type=f32,
                  precision=hi)
    out_ref[:] = (a_ref[:].astype(f32) - acc).astype(out_ref.dtype)


@functools.lru_cache(maxsize=512)
def _build_trailing_sub(nrows: int, ncmat: int, ko: int, row0: int,
                        mrows: int, m: int, kk: int, dtype_name: str,
                        gemm_dtype_name: str, ti: int = 1024,
                        interpret: bool = False, t: int = 1024):
    """Epilogue-fused a[row0:row0+mrows, ko:ko+m] -= l21seg @ u12, in place
    on the full (nrows, ncmat) matrix (rectangular since round 5: the
    deferred-exchange driver's working matrix carries appended overflow
    rows, nrows = n + OV)."""
    w = jnp.dtype(dtype_name)
    gd = jnp.dtype(gemm_dtype_name)
    assert mrows % ti == 0 and row0 % ti == 0 and m % t == 0 and ko % t == 0, (
        mrows, row0, m, ko, ti, t)
    hi = jax.lax.Precision.HIGHEST if gd == jnp.float32 else None
    kernel = functools.partial(_trailing_sub_kernel, hi=hi)
    kbi = row0 // ti
    kbj = ko // t
    return pl.pallas_call(
        kernel,
        grid=(mrows // ti, m // t),
        in_specs=[
            pl.BlockSpec((ti, kk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),            # L21 row tile
            pl.BlockSpec((kk, t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),            # U12 col tile
            pl.BlockSpec((ti, t), lambda i, j: (kbi + i, kbj + j),
                         memory_space=pltpu.VMEM),            # a22 tile
        ],
        out_specs=pl.BlockSpec((ti, t), lambda i, j: (kbi + i, kbj + j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, ncmat), w),
        input_output_aliases={2: 0},  # the full matrix, in place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                2 * 2 * ti * t * max(w.itemsize, 2)
                + 2 * (ti + t) * kk * gd.itemsize + (32 << 20)
            ),
        ),
        interpret=interpret,
    )


_TRAILING_TI = 4096


def _trailing_segments(ko: int, m: int, ti: int):
    """Split rows [ko, ko+m) into (row0, mrows, ti_seg) segments: a
    ti-aligned core plus <=3-tile ti=1024 edge strips."""
    s0 = min(-(-ko // ti) * ti, ko + m)          # first aligned row >= ko
    e0 = s0 + (ko + m - s0) // ti * ti           # end of the aligned core
    if e0 <= s0:                                  # no core: one edge call
        return [(ko, m, 1024)]
    return [(r0, mr, tseg) for (r0, mr, tseg) in (
        (ko, s0 - ko, 1024), (s0, e0 - s0, ti), (e0, ko + m - e0, 1024),
    ) if mr > 0]


def trailing_gemm_sub(a, l21, u12, ko, interpret=False, _ti=None, ncols=None):
    """In-place trailing update on the FULL matrix: a[ko:ko+m, ko:ko+ncols]
    -= l21 @ u12 (fp32 accumulation), with the subtract fused into the GEMM
    epilogue.  ``ncols`` defaults to ``m`` (the classic square trailing
    update); the three-level driver passes a narrower ``ncols`` for its
    deferred within-superblock updates.  XLA materializes the product
    before the subtract — a full extra HBM round-trip of the trailing
    matrix per block column; this kernel writes each output tile once,
    aliased in place.  ``ko`` (static), ``ncols``, and the trailing row
    count must be multiples of 1024.

    The L21 row tile is cached across a whole row strip (its index map
    ignores j), so U12's total re-fetch traffic scales as 1/ti.  Row tiles
    must evenly tile their region AND start block-aligned, so the rows
    [ko, n) are split into a 4096-aligned core plus <=3-tile edge strips at
    ti=1024 — without the split, every block column whose trailing size is
    an odd multiple of 1024 ran entirely at ti=1024 (4x the U12 traffic;
    ~90 ms of pure HBM time across an n=65536 factorization)."""
    nrows, ncmat = a.shape
    m, kk = l21.shape
    if ncols is None:
        ncols = m
    assert u12.shape == (kk, ncols), (u12.shape, kk, ncols)
    ko = int(ko)
    w_item = jnp.dtype(a.dtype).itemsize
    gd_item = jnp.dtype(l21.dtype).itemsize

    def _max_ti(t):
        ti = _ti or _TRAILING_TI
        while ti > 1024 and (
            2 * 2 * ti * t * max(w_item, 2) + 2 * (ti + t) * kk * gd_item
            > (72 << 20)
        ):
            ti //= 2
        return ti

    # U12 re-fetch traffic is (m/ti) * kk * ncols * itemsize — t-independent
    # — so prefer the (ti, t) with the largest ti; at equal ti the wider
    # column tile (fewer grid steps).  The t=512 candidate exists only for
    # wide-kk (superblock far) updates, where fp32 working precision can't
    # reach ti=2048 at t=1024; the chip-proven kk<=1024 configs keep t=1024.
    tcands = (1024, 512) if kk > 1024 else (1024,)
    ti, t = max(
        ((_max_ti(tc), tc) for tc in tcands if ncols % tc == 0),
        key=lambda p: (p[0], p[1]),
    )
    for r0, mr, tseg in _trailing_segments(ko, m, ti):
        fn = _build_trailing_sub(
            nrows, ncmat, ko, r0, mr, ncols, kk, a.dtype.name,
            l21.dtype.name, tseg, interpret, t,
        )
        a = fn(l21[r0 - ko : r0 - ko + mr], u12, a)
    return a


def _l21_trim_kernel(
    meta_ref, slab_ref, pos_ref, uinv_ref, out_ref, l21_ref,
    *, r: int, rb: int,
):
    """L21 pass of the split streaming update (round 3): grid over row
    blocks of the PANEL columns only.  Computes L21 = A[:, panel] U11^{-1}
    masked to rows below the diagonal, writes it back in place, and emits
    the masked L21 as a dense (m, r) side buffer for the wide-column update
    pass.  Frozen rows carry L21 == 0, so the update pass needs no row mask
    at all (b - 0 round-trips bit-exactly through f32)."""
    f32 = jnp.float32
    w = slab_ref.dtype
    j0 = meta_ref[0]
    hi = jax.lax.Precision.HIGHEST if w == f32 else None
    b = slab_ref[:]                                          # (rb, r)
    posT = jnp.swapaxes(pos_ref[:], 0, 1)                    # (rb, 1)
    below = jnp.broadcast_to(posT, (rb, r)) >= j0 + r
    l21 = jnp.dot(b, uinv_ref[:], preferred_element_type=f32, precision=hi)
    l21 = jnp.where(below, l21, 0.0).astype(w)
    l21_ref[:] = l21
    out_ref[:] = jnp.where(below, l21, b)


@functools.lru_cache(maxsize=512)
def _build_l21_trim(m: int, bc: int, r: int, jj0: int, rb: int,
                    dtype_name: str, interpret: bool = False):
    w = jnp.dtype(dtype_name)
    assert m % rb == 0 and jj0 % r == 0, (m, r, jj0, rb)
    t0 = jj0 // r
    kernel = functools.partial(_l21_trim_kernel, r=r, rb=rb)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # meta (1,) = [j0]
            grid=(m // rb,),
            in_specs=[
                pl.BlockSpec((rb, r), lambda i, meta: (i, t0),
                             memory_space=pltpu.VMEM),       # panel block
                pl.BlockSpec((1, rb), lambda i, meta: (0, i),
                             memory_space=pltpu.VMEM),       # pos block
                pl.BlockSpec((r, r), lambda i, meta: (0, 0),
                             memory_space=pltpu.VMEM),       # uinv
            ],
            out_specs=(
                pl.BlockSpec((rb, r), lambda i, meta: (i, t0),
                             memory_space=pltpu.VMEM),       # slab (aliased)
                pl.BlockSpec((rb, r), lambda i, meta: (i, 0),
                             memory_space=pltpu.VMEM),       # L21 buffer
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, bc), w),
            jax.ShapeDtypeStruct((m, r), w),
        ),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                6 * rb * r * max(w.itemsize, 4) + (16 << 20)
            ),
        ),
        interpret=interpret,
    )


def _upd_wide_kernel(
    slab_ref, l21_ref, u12_ref, out_ref,
    *, cw: int, glo: int, gemm_bf16: bool,
):
    """Wide-column update pass: out = b - L21 @ U12 on lanes >= glo
    (the first lane at/right of the panel's right edge; lanes of this
    column range left of it — at most cw - r — pass through).  No row
    mask: frozen rows have L21 == 0 (see `_l21_trim_kernel`)."""
    f32 = jnp.float32
    w = slab_ref.dtype
    hi = jax.lax.Precision.HIGHEST if w == f32 else None
    b = slab_ref[:]                                          # (rb, cw)
    l21 = l21_ref[:]
    if gemm_bf16 and w != jnp.bfloat16:
        upd = jnp.dot(l21.astype(jnp.bfloat16), u12_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=f32)
    else:
        upd = jnp.dot(l21, u12_ref[:], preferred_element_type=f32,
                      precision=hi)
    j = pl.program_id(1)
    glane = j * cw + jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1)
    out_ref[:] = jnp.where(glane >= glo, (b.astype(f32) - upd).astype(w), b)


@functools.lru_cache(maxsize=512)
def _build_upd_wide(m: int, bc: int, r: int, jj0: int, rb: int, cw: int,
                    dtype_name: str, gemm_bf16: bool,
                    interpret: bool = False):
    w = jnp.dtype(dtype_name)
    cs0 = (jj0 + r) // cw * cw            # first column block touched
    assert m % rb == 0 and bc % cw == 0 and (bc - cs0) % cw == 0
    c0b = cs0 // cw
    ncol = (bc - cs0) // cw
    kernel = functools.partial(
        _upd_wide_kernel, cw=cw, glo=jj0 + r - cs0, gemm_bf16=gemm_bf16
    )
    return pl.pallas_call(
        kernel,
        grid=(m // rb, ncol),
        in_specs=[
            pl.BlockSpec((rb, cw), lambda i, j: (i, c0b + j),
                         memory_space=pltpu.VMEM),           # slab block
            pl.BlockSpec((rb, r), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # L21 (cached/i)
            pl.BlockSpec((r, cw), lambda i, j: (0, c0b + j),
                         memory_space=pltpu.VMEM),           # U12 col block
        ],
        out_specs=pl.BlockSpec((rb, cw), lambda i, j: (i, c0b + j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, bc), w),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                (4 * rb * cw + 2 * rb * r + 2 * r * cw) * max(w.itemsize, 4)
                + (16 << 20)
            ),
        ),
        interpret=interpret,
    )


def _apply_update_trim_kernel(
    meta_ref, slab_ref, pos_ref, rowblock_ref, uinv_ref, out_ref, l21_scr,
    *, r: int, rb: int, gemm_bf16: bool,
):
    """Column-trimmed streaming update: grid (row blocks, remaining column
    blocks of width r).  Column block 0 IS the panel: it computes
    L21 = A[:, panel] U11^{-1}, stores it (scratch persists across the
    sequential TPU grid), and writes it back; blocks j>0 subtract the
    rank-r update L21 @ U12_j.  Columns left of the panel are never
    touched (output aliased to input), so per-panel slab traffic is
    2*m*(bc-jj0) instead of 2*m*bc."""
    f32 = jnp.float32
    w = slab_ref.dtype
    j0 = meta_ref[0]
    j = pl.program_id(1)
    hi = jax.lax.Precision.HIGHEST if w == f32 else None
    b = slab_ref[:]                                          # (rb, r)
    posT = jnp.swapaxes(pos_ref[:], 0, 1)                    # (rb, 1)
    below = jnp.broadcast_to(posT, (rb, r)) >= j0 + r

    @pl.when(j == 0)
    def _():
        l21 = jnp.dot(b, uinv_ref[:], preferred_element_type=f32,
                      precision=hi)
        l21 = jnp.where(below, l21, 0.0).astype(w)
        l21_scr[:] = l21
        out_ref[:] = jnp.where(below, l21, b)

    @pl.when(j > 0)
    def _():
        l21 = l21_scr[:]
        if gemm_bf16 and w != jnp.bfloat16:
            upd = jnp.dot(l21.astype(jnp.bfloat16),
                          rowblock_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=f32)
        else:
            upd = jnp.dot(l21, rowblock_ref[:], preferred_element_type=f32,
                          precision=hi)
        out_ref[:] = jnp.where(below, (b.astype(f32) - upd).astype(w), b)


@functools.lru_cache(maxsize=512)
def _build_apply_update_trim(m: int, bc: int, r: int, jj0: int, rb: int,
                             dtype_name: str, gemm_bf16: bool,
                             interpret: bool = False):
    w = jnp.dtype(dtype_name)
    assert m % rb == 0 and bc % r == 0 and jj0 % r == 0, (m, bc, r, jj0, rb)
    t0 = jj0 // r
    nt_rem = bc // r - t0
    kernel = functools.partial(
        _apply_update_trim_kernel, r=r, rb=rb, gemm_bf16=gemm_bf16
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # meta (1,) = [j0]
            grid=(m // rb, nt_rem),
            in_specs=[
                pl.BlockSpec((rb, r), lambda i, j, meta: (i, t0 + j),
                             memory_space=pltpu.VMEM),       # slab block
                pl.BlockSpec((1, rb), lambda i, j, meta: (0, i),
                             memory_space=pltpu.VMEM),       # pos block
                pl.BlockSpec((r, r), lambda i, j, meta: (0, t0 + j),
                             memory_space=pltpu.VMEM),       # U12 col block
                pl.BlockSpec((r, r), lambda i, j, meta: (0, 0),
                             memory_space=pltpu.VMEM),       # uinv
            ],
            out_specs=pl.BlockSpec((rb, r), lambda i, j, meta: (i, t0 + j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((rb, r), w)],         # L21 carry
        ),
        out_shape=jax.ShapeDtypeStruct((m, bc), w),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(8 * rb * r * max(w.itemsize, 4) + (16 << 20)),
        ),
        interpret=interpret,
    )


def panel_apply_update_trim(slab, pos, rowblock, uinv, j0, jj0, rb=512,
                            gemm_bf16=False, interpret=False):
    """Static-``jj0`` variant of :func:`panel_apply_update` (the driver's
    unrolled panel loop supplies compile-time offsets): touches only the
    columns at/right of the panel.

    Round 3: split into an L21 pass (panel columns, grid m/rb) and a
    wide-column update pass ((rb, cw=512) blocks) — the round-2 uniform
    (rb, r=128) grid ran ~41k grid steps per n=65536 factorization and was
    step-overhead-bound, not HBM-bound (B stage 160 ms vs a ~94 ms slab
    r+w floor).  Storing L21 row-masked (zeros on frozen rows) makes the
    update a bit-exact no-op there, so the update pass carries no ``pos``
    block at all.  ``rb`` is kept as a compatibility floor; the split
    passes pick their own tiles.

    ``MPF_SPLITB`` (trace-time A/B knob) selects between the split form and
    the round-2 uniform single-pass kernel.  Default is by working dtype,
    from the end-of-round-3 chip A/Bs (STATUS.md ledger): fp32 slabs take
    the single-pass kernel (n=32768 MPF_BF16: 493.5 vs 503.4 ms), bf16
    slabs keep the split form (part of the n=65536 ALL_BF16 1910->1522 ms
    batch; fp32's extra bytes/row halve the grid-step overhead the split
    form exists to amortize)."""
    m, bc = slab.shape
    r = rowblock.shape[0]
    meta = jnp.asarray(j0, jnp.int32).reshape(1)
    default = "1" if slab.dtype == jnp.bfloat16 else "0"
    if os.environ.get("MPF_SPLITB", default) == "0":
        fn = _build_apply_update_trim(
            m, bc, r, int(jj0), rb, slab.dtype.name, bool(gemm_bf16),
            interpret,
        )
        return fn(meta, slab, pos.reshape(1, m), rowblock, uinv)
    rbw = next(c for c in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8)
               if m % c == 0)
    cw = next((c for c in (512, 256, 128, 64, 32, 16, 8) if bc % c == 0), bc)
    slab, l21 = _build_l21_trim(
        m, bc, r, int(jj0), rbw, slab.dtype.name, interpret
    )(meta, slab, pos.reshape(1, m), uinv)
    if bc - (int(jj0) + r) > 0:
        slab = _build_upd_wide(
            m, bc, r, int(jj0), rbw, cw, slab.dtype.name, bool(gemm_bf16),
            interpret,
        )(slab, l21, rowblock)
    return slab


def panel_apply_update(slab, pos, rowblock, uinv, j0, jj0, rb=512,
                       gemm_bf16=False, interpret=False):
    """One in-place streaming pass over the (m, bc) slab: for every row at
    virtual position >= j0+r compute L21 = A[:, panel] U11^{-1}, write it
    into the panel columns, and subtract the rank-r update L21 @ U12 from
    the columns right of the panel.  Rows at positions < j0+r (already
    factored, or this panel's pivot rows whose finished values live in
    ``rowblock``) pass through untouched.

    Fuses the reference's per-panel LASWP + TRSM + GEMM slab traffic
    (`MPF.cu:162,215-239`) into one read+write of the slab.
    """
    m, bc = slab.shape
    r = rowblock.shape[0]
    meta = jnp.stack([jnp.asarray(j0, jnp.int32), jnp.asarray(jj0, jnp.int32)])
    fn = _build_apply_update(m, bc, r, rb, slab.dtype.name, bool(gemm_bf16),
                             interpret)
    return fn(meta, slab, pos.reshape(1, m), rowblock, uinv)
