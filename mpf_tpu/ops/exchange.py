"""Combined one-sweep row exchange (round 3).

The bounded physical exchange after each fused block column (LAPACK LASWP
semantics composed into one row map, `MPF.cu:42-59` + `MPF.cu:145-162` in
the reference) was two kernels in round 2/early round 3:

  1. :func:`mpf_tpu.ops.panel_fused.rows_gather` — window-DMA reads of the
     bc pivot-source rows into a dense ``pivrows`` buffer, and
  2. :func:`mpf_tpu.ops.panel_fused.rows_scatter_from_band` — an RMW sweep
     over the granule windows holding the displaced band rows' destinations.

Because the composed map is a permutation whose swap chains bottom out in
the band, the OUT-of-band gather-source positions are exactly the
out-of-band scatter destinations: every out-of-band window was therefore
read TWICE (once by the gather, once by the scatter RMW).  On pivot-heavy
inputs (the reference's uniform corpus, `matrix_generator.cpp:66`) nearly
every band row moves to a distinct window, so the double read is the
dominant exchange cost.

This kernel does both in one visit per window:

  * **Phase 1** streams the band tiles sequentially once, extracting (a)
    the in-band pivot-source rows straight into the ``pivrows`` output and
    (b) the displaced band rows into a ``staged`` side buffer ordered by
    the phase-2 window schedule (so phase 2 can stream it in aligned
    batches — single arbitrary-row HBM reads are not a thing on TPU).
  * **Phase 2** walks the out-of-band windows in ascending order (each
    visited exactly once — the schedule is sorted, unlike the in-band-order
    scatter which could revisit): reads the window, extracts any pivot
    source rows in it (before overlaying — a position can be both source
    and destination), overlays the destination rows from the staged
    stream, and writes the window back iff it was dirtied.

The caller finishes the exchange by dynamic-update-slicing ``pivrows``
over the band (in-band destinations always carry the same values the
gather delivers, so the slab-wide DUS is correct — same argument as
`rows_scatter_from_band`).

Scheduling (argsorts over 2·bc int32 scalars — microseconds) happens in
XLA; the kernel consumes flat scalar-prefetch entry lists with the
inactive suffix trimmed by dynamic loop bounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpf_tpu.ops.panel_fused import _granule


def xsel_mode() -> str:
    """``MPF_XSEL``: row-extraction strategy inside the exchange kernels
    (read at BUILD time by the wrappers and threaded into the lru-cached
    builders as a static key — never inside a cached kernel).

    ``masked`` — sublane-masked sum: ~3 VPU passes over the (g, w)
    block per extracted row (compare + select + sublane tree-reduce).  The
    round-3 shipped form; at n=65536 uniform this VPU work is the measured
    exchange bound (~3 us x ~4k rows x 64 block columns ~= the 603 ms
    exchange, tools/tpu_xsel_micro.py).

    ``roll`` — uniform sublane rotate (`pltpu.roll`) bringing the wanted
    row to sublane 0, then a static one-row slice: ~1 pass.  Bit-identical
    (a rotate moves values, never rounds).  Default ``masked`` until the
    round-4 chip A/B lands."""
    import os

    return os.environ.get("MPF_XSEL", "masked")


def _row_take(block, rmod, grows, xsel: str):
    """(1, w) fp32 extraction of traced sublane row ``rmod`` from a (g, w)
    block value; see :func:`xsel_mode`."""
    if xsel == "roll":
        g = block.shape[0]
        return pltpu.roll(block, (g - rmod) % g, 0)[0:1].astype(jnp.float32)
    return jnp.sum(
        jnp.where(grows == rmod, block.astype(jnp.float32), 0.0),
        axis=0, keepdims=True,
    )


def _rows_exchange_kernel(
    *refs,
    nr: int, g: int, w: int, xsel: str = "masked", p3: bool = False,
    btg: int = 0, rings: int = 8, ahead: int = 3,
):
    (r1_ref, pay1_ref, t1_ref, nxt1_ref, nxt1b_ref,
     row2_ref, pay2_ref, t2_ref) = refs[:8]
    nxw_refs = refs[8 : 8 + ahead]
    (kmeta_ref, a_in_ref, a_ref, piv_ref, stg_ref,
     btile, wbuf, vbuf, stile, pend, wps, sems) = refs[8 + ahead :]
    """See module docstring.  Scalar-prefetch layout:

    phase 1 (``n1 = kmeta[1]`` active entries, sorted by band row):
      r1[e]     band-relative row to extract (0..nr-1)
      t1[e]     0 = pivot source  -> pivrows[pay1[e]]
                1 = displaced row -> staged[pay1[e]]  (phase-2 stream slot)
      nxt1[e]   NEXT distinct band tile after e's (or -1) — read prefetch
      nxt1b[e]  the tile after that (2-deep chain)
    phase 2 (``n2 = kmeta[2]`` active entries, sorted by (window, type)):
      row2[e]   global row; t2[e] 0 = source extract, 1 = dest overlay;
      pay2[e]   pivrows row for sources (unused for dests);
      nxw1..3   the next 1..3 distinct windows after e's (or -1)

    Round 5: the window ring is ``rings`` slots with an ``ahead``-deep
    read-ahead chain (default 8/3, ported from the chip-validated
    `ops/gemmx.py` sweep; the slot of window ordinal W is always W%rings
    so chain reads and reuse waits agree).  The round-3 form (4-slot ring,
    read-ahead 1) left the pivot-heavy sweep round-trip bound: the
    measured 64k uniform exchange moved its granule windows at ~380 GB/s
    effective vs ~700 sustainable — each 2-4 MB window read's issue
    latency was only one select-phase deep.  The pair layout (``p3``)
    shrinks windows 8x (256 KB at the 64k width), so its sweep is
    latency-bound and builds with a 16/6 ring.

    Scratch: ``btile`` (4, g, w) band tiles; ``wbuf`` (8, g, w) window
    ring (read-ahead + write-behind); ``vbuf`` (4, 1, w) outgoing
    single-row ring; ``stile`` (2, 8, 1, w) staged batches (ping-pong);
    ``pend`` SMEM (4, 2) = (kind, pos) pending write per vbuf slot;
    ``wps`` SMEM (8, 2) = (pending?, window) per wbuf slot.  Sems: 0-3
    vbuf, 4-11 window reads, 12-19 window writes, 20-23 band tiles, 24-25
    staged batches.

    ``p3`` (round 5, pair layout): ``a_ref`` is the natively-3D
    (n/2, 2, w) bf16 working matrix — dynamic indices land on the untiled
    leading (pair) dim, so the DMA granule is g=2 ROWS instead of the 2D
    layout's 16 (`tools/tpu_granule_r5.py`: 2-row window RMW at 688 GB/s).
    Windows are single pairs read as ``a_ref.at[gr]`` (2, w); band tiles
    are ``btg``-row pair blocks collapsed to 2D in VMEM (value reshape —
    `tools/tpu_3d_micro.py`).  All arithmetic, schedules, and staging are
    IDENTICAL to the 2D kernel (g=2), so the two are bit-exact.
    """
    f32 = jnp.float32
    btg = btg or g
    kb = kmeta_ref[0]
    n1 = kmeta_ref[1]
    n2 = kmeta_ref[2]
    nd = kmeta_ref[3]  # active (out-of-band) dest count = staged rows used
    ci = slice(None)
    grows = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    growsb = jax.lax.broadcasted_iota(jnp.int32, (btg, 1), 0)
    srows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)

    # ---- single-row write ring (shared by both phases) -------------------
    def row_write_start(slot, kind, pos):
        @pl.when(kind == 0)
        def _():
            pltpu.make_async_copy(
                vbuf.at[slot], piv_ref.at[pos], sems.at[slot]
            ).start()

        @pl.when(kind == 1)
        def _():
            pltpu.make_async_copy(
                vbuf.at[slot], stg_ref.at[pos], sems.at[slot]
            ).start()

    def row_write_wait(slot):
        kind = pend[slot, 0]
        pos = pend[slot, 1]

        @pl.when(kind == 0)
        def _():
            pltpu.make_async_copy(
                vbuf.at[slot], piv_ref.at[pos], sems.at[slot]
            ).wait()

        @pl.when(kind == 1)
        def _():
            pltpu.make_async_copy(
                vbuf.at[slot], stg_ref.at[pos], sems.at[slot]
            ).wait()

    def emit_row(wcnt, val, kind, pos):
        """Stage a (1, w) row and start its HBM write; returns wcnt + 1."""
        slot = wcnt % 4

        @pl.when(wcnt >= 4)
        def _():
            row_write_wait(slot)

        vbuf[slot] = val.astype(vbuf.dtype)
        row_write_start(slot, kind, pos)
        pend[slot, 0] = kind
        pend[slot, 1] = pos
        return wcnt + 1

    def drain_ring(wcnt):
        for s in range(4):
            @pl.when(s < wcnt)
            def _():
                row_write_wait(s)

    # ---- phase 1: band stream (4-slot tile ring, 2-deep read-ahead) ------
    def btile_read(t, slot):
        if p3:
            bp = btg // 2
            return pltpu.make_async_copy(
                a_ref.at[pl.ds(pl.multiple_of(kb // 2 + t * bp, bp), bp),
                         ci, ci],
                btile.at[slot], sems.at[10 + 2 * rings + slot],
            )
        return pltpu.make_async_copy(
            a_ref.at[pl.ds(pl.multiple_of(kb + t * g, g), g), ci],
            btile.at[slot], sems.at[10 + 2 * rings + slot],
        )

    def p1_body(e, carry):
        last_tile, tord, wcnt = carry
        rowp = r1_ref[e]
        tile = rowp // btg
        tswitch = tile != last_tile
        tord = tord + tswitch.astype(jnp.int32)
        ts = tord % 4

        @pl.when(tswitch)
        def _():
            @pl.when(tord == 0)
            def _():  # prime: this tile and its successor
                btile_read(tile, ts).start()
                nt0 = nxt1_ref[e]

                @pl.when(nt0 >= 0)
                def _():
                    btile_read(nt0, (tord + 1) % 4).start()

            btile_read(tile, ts).wait()
            nt = nxt1b_ref[e]

            @pl.when(nt >= 0)
            def _():  # keep two tiles of read-ahead
                btile_read(nt, (tord + 2) % 4).start()

        bt = btile[ts].reshape(btg, w) if p3 else btile[ts]
        val = _row_take(bt, rowp % btg, growsb, xsel)
        wcnt = emit_row(wcnt, val, t1_ref[e], pay1_ref[e])
        return tile, tord, wcnt

    _, _, wcnt = jax.lax.fori_loop(
        0, n1, p1_body, (jnp.int32(-1), jnp.int32(-1), jnp.int32(0))
    )
    drain_ring(wcnt)  # phase 2 streams ``staged`` — all writes must land

    # ---- phase 2: out-of-band window sweep (rings-slot ring, ahead-deep
    # read-ahead + write-behind) -------------------------------------------
    def win_read(gr, slot):
        src = a_ref.at[gr] if p3 else a_ref.at[
            pl.ds(pl.multiple_of(gr * g, g), g), ci]
        return pltpu.make_async_copy(src, wbuf.at[slot], sems.at[4 + slot])

    def win_write(gr, slot):
        dst = a_ref.at[gr] if p3 else a_ref.at[
            pl.ds(pl.multiple_of(gr * g, g), g), ci]
        return pltpu.make_async_copy(wbuf.at[slot], dst,
                                     sems.at[4 + rings + slot])

    def wps_wait(slot):
        """Await the pending window write recorded on ``slot`` (if any)."""
        @pl.when(wps[slot, 0] == 1)
        def _():
            win_write(wps[slot, 1], slot).wait()
            wps[slot, 0] = 0

    def stile_read(t, slot):
        return pltpu.make_async_copy(
            stg_ref.at[pl.ds(pl.multiple_of(t * 8, 8), 8)], stile.at[slot],
            sems.at[8 + 2 * rings + slot],
        )

    for s in range(rings):
        wps[s, 0] = 0

    def p2_body(e, carry):
        last_gr, word, dirty, scnt, wcnt = carry
        grow = row2_ref[e]
        typ = t2_ref[e]
        gr = grow // g
        switch = (gr != last_gr) | (word < 0)
        word = word + switch.astype(jnp.int32)  # ordinal; slot word%rings
        cur = word % rings

        @pl.when(switch)
        def _():
            wps_wait(cur)  # slot reuse: ordinal word-rings' write must land

            @pl.when(word == 0)
            def _():  # prime the read-ahead chain (this + ahead-1 windows)
                win_read(gr, cur).start()
                for d in range(1, ahead):
                    nw0 = nxw_refs[d - 1][e]

                    @pl.when(nw0 >= 0)
                    def _():
                        sl = (word + d) % rings
                        wps_wait(sl)
                        win_read(nw0, sl).start()

            win_read(gr, cur).wait()  # prefetched ``ahead`` switches ago

            prev = (word + rings - 1) % rings

            @pl.when((word > 0) & (dirty == 1))
            def _():  # close the previous window (write-behind)
                wps_wait(prev)  # its slot's OLDER write
                win_write(last_gr, prev).start()
                wps[prev, 0] = 1
                wps[prev, 1] = last_gr

            nw = nxw_refs[ahead - 1][e]

            @pl.when(nw >= 0)
            def _():  # extend the read-ahead chain to depth ``ahead``
                nslot = (word + ahead) % rings
                wps_wait(nslot)  # that slot's write must land first
                win_read(nw, nslot).start()

        dirty = jnp.where(switch, jnp.int32(0), dirty)
        last_gr = jnp.where(switch, gr, last_gr)

        # source extract BEFORE any overlay (the sort guarantees all of a
        # window's sources precede its dests — a position can be both)
        @pl.when(typ == 0)
        def _():
            val = _row_take(wbuf[cur], grow % g, grows, xsel)
            slot = wcnt % 4

            @pl.when(wcnt >= 4)
            def _():
                row_write_wait(slot)

            vbuf[slot] = val.astype(vbuf.dtype)
            row_write_start(slot, jnp.int32(0), pay2_ref[e])
            pend[slot, 0] = 0
            pend[slot, 1] = pay2_ref[e]

        wcnt = wcnt + (typ == 0).astype(jnp.int32)

        @pl.when(typ == 1)
        def _():
            t8 = scnt // 8
            sl8 = t8 % 2

            @pl.when(scnt % 8 == 0)
            def _():  # staged batches double-buffered: batch t8+1's read is
                # in flight while t8's rows overlay
                @pl.when(scnt == 0)
                def _():
                    stile_read(0, 0).start()

                stile_read(t8, sl8).wait()

                # prefetch ONLY batches the sweep will actually consume:
                # batch t is awaited iff some dest reaches scnt == t*8,
                # i.e. iff t*8 < nd — gating on the static batch count
                # nbat8 leaked an un-awaited DMA (and a pending semaphore
                # increment) whenever nd < nr, which is every block column
                # on the diagonally-dominant HPL corpus
                @pl.when((t8 + 1) * 8 < nd)
                def _():
                    stile_read(t8 + 1, 1 - sl8).start()

            v = jnp.sum(
                jnp.where(srows8 == scnt % 8, stile[sl8].astype(f32), 0.0),
                axis=0,
            )  # (1, w)
            wbuf[cur] = jnp.where(
                grows == grow % g, v.astype(wbuf.dtype), wbuf[cur]
            )

        dirty = jnp.where(typ == 1, jnp.int32(1), dirty)
        scnt = scnt + (typ == 1).astype(jnp.int32)
        return last_gr, word, dirty, scnt, wcnt

    last_gr, word, dirty, scnt, wcnt2 = jax.lax.fori_loop(
        0, n2, p2_body,
        (jnp.int32(-1), jnp.int32(-1), jnp.int32(0), jnp.int32(0),
         jnp.int32(0)),
    )

    @pl.when((word >= 0) & (dirty == 1))
    def _():  # close the final window
        cur = word % rings
        wps_wait(cur)
        win_write(last_gr, cur).start()
        wps[cur, 0] = 1
        wps[cur, 1] = last_gr

    for s in range(rings):
        wps_wait(s)
    drain_ring(wcnt2)


@functools.lru_cache(maxsize=64)
def _build_rows_exchange(n: int, wfull: int, nr: int,
                         dtype_name: str, interpret: bool = False,
                         xsel: str = "masked", nrp: int | None = None,
                         p3: bool = False, rings: int = 8, ahead: int = 3):
    """``nrp``: row count of the pivrows output (defaults to ``nr``).  The
    flush of the deferred-exchange driver runs this kernel with NO source
    entries (`flush_overflow`), so its pivrows output is never written —
    ``nrp=8`` keeps the dead allocation off the HBM budget (an OV-row fp32
    buffer would be ~2 GB at the 64k north star).

    ``p3``: pair-layout (n/2, 2, wfull) working matrix — 2-row DMA granule
    (see `_rows_exchange_kernel`)."""
    dt = jnp.dtype(dtype_name)
    g = 2 if p3 else _granule(dt)
    btg = 16 if p3 else g
    w = wfull
    nrp = nr if nrp is None else nrp
    nr8 = -(-nr // 8) * 8
    # Single-ROW staging buffers are always fp32: a (1, w) bf16 ref is
    # sublane-padded to 2 under Mosaic's (2, 128) bf16 tiling, and slicing
    # one row of it is rejected ("slice shape along dimension 1 must be
    # aligned to tiling (2)" — the round-3 n=65536 ALL_BF16 compiled-debut
    # crash).  fp32 (1, w) row DMAs are chip-proven (the n=32768 MPF_BF16
    # default path); bf16 values round-trip bf16 -> f32 -> bf16 exactly, so
    # the kernel stays bit-identical.  Window/band tiles (g rows, aligned)
    # keep the slab dtype.
    sdt = jnp.dtype(jnp.float32)
    kernel = functools.partial(_rows_exchange_kernel, nr=nr, g=g, w=w,
                               xsel=xsel, p3=p3, btg=btg, rings=rings,
                               ahead=ahead)
    ashape = (n // 2, 2, wfull) if p3 else (n, wfull)
    btile_shape = (4, btg // 2, 2, w) if p3 else (4, g, w)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # r1, pay1, t1, nxt1, nxt1b, row2, pay2, t2, nxw1..ahead, kmeta
            num_scalar_prefetch=9 + ahead,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # a
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),          # a (aliased)
                pl.BlockSpec(memory_space=pl.ANY),          # pivrows
                pl.BlockSpec(memory_space=pl.ANY),          # staged
            ),
            scratch_shapes=[
                pltpu.VMEM(btile_shape, dt),    # band tiles (4-slot ring)
                pltpu.VMEM((rings, g, w), dt),  # window ring
                pltpu.VMEM((4, 1, w), sdt),     # outgoing row ring
                pltpu.VMEM((2, 8, 1, w), sdt),  # staged batches (ping-pong)
                pltpu.SMEM((4, 2), jnp.int32),  # pending (kind, pos)/vbuf slot
                pltpu.SMEM((rings, 2), jnp.int32),  # (flag, win)/wbuf slot
                pltpu.SemaphoreType.DMA((14 + 2 * rings,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(ashape, dt),
            jax.ShapeDtypeStruct((nrp, 1, w), sdt),
            jax.ShapeDtypeStruct((nr8, 1, w), sdt),
        ),
        input_output_aliases={9 + ahead: 0},  # a, after the scalar prefetch
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(
                (rings * g + 4 * btg) * w * dt.itemsize
                + 20 * w * sdt.itemsize + 8 * w * 4 + (24 << 20),
                120 << 20,
            )),
            has_side_effects=True,
        ),
        interpret=interpret,
    )


def _next_chain(wid, depth: int):
    """Per entry, the values of the next 1..depth distinct ``wid`` segments
    (-1 past the end).  ``wid`` must be segment-grouped (sorted) with
    negative sentinels marking the inactive suffix."""
    m = wid.shape[0]
    first = jnp.concatenate([jnp.ones((1,), bool), wid[1:] != wid[:-1]])
    sid = jnp.cumsum(first.astype(jnp.int32)) - 1
    swid = jnp.full((m + depth,), jnp.int32(-1)).at[sid].set(wid)
    outs = []
    for d in range(1, depth + 1):
        nx = swid[jnp.minimum(sid + d, m + depth - 1)]
        outs.append(jnp.where(nx < 0, jnp.int32(-1), nx))
    return outs


def build_exchange_schedules(n, k, glist, dests, g,
                             tile_depth: int = 1, win_depth: int = 1,
                             sources: bool = True, btg: int | None = None):
    """Schedules for the combined one-sweep exchange (shared by
    :func:`rows_exchange` and the fused GEMM+exchange kernel in
    `ops/gemmx.py`, which asks for deeper tile/window read-ahead chains).

    Returns ``(kmeta, r1s, pay1, t1, tile_chain, row2, pay2, t2,
    win_chain)`` with ``tile_chain``/``win_chain`` lists of length
    ``tile_depth``/``win_depth`` (the next 1..depth distinct band tiles /
    windows per entry).  Layout documented on `_rows_exchange_kernel`.

    ``sources=False`` (the deferred-exchange flush): the glist half is
    fully inactive — no pivot-source extraction in either phase; only the
    displaced-row staging + destination overlays run.  ``dests`` entries
    >= ``n`` (the dead-slot sentinel) are dropped.

    ``btg``: band-tile row count for the phase-1 tile prefetch chain
    (defaults to ``g``; the pair-layout kernel streams 16-row band tiles
    over its 2-row window granule)."""
    btg = g if btg is None else btg
    nr = int(glist.shape[0])
    k = jnp.asarray(k, jnp.int32)
    glist = glist.astype(jnp.int32)
    dests = dests.astype(jnp.int32)
    j = jnp.arange(nr, dtype=jnp.int32)

    inband_s = (glist >= k) & (glist < k + nr)
    src1 = inband_s if sources else jnp.zeros((nr,), bool)   # phase-1 srcs
    src2 = (~inband_s) if sources else jnp.zeros((nr,), bool)  # phase-2 srcs
    act_d = ((dests < k) | (dests >= k + nr)) & (dests < n)

    # phase-2 schedule: out-of-band entries sorted by (window, type),
    # sources first within a window (a position can be source AND dest)
    big = jnp.int32(2 * n + 2)
    key = jnp.concatenate([
        jnp.where(src2, (glist // g) * 2, big),
        jnp.where(act_d, (dests // g) * 2 + 1, big),
    ])
    o2 = jnp.argsort(key, stable=True)
    row2 = jnp.concatenate([glist, dests])[o2]
    t2 = (o2 >= nr).astype(jnp.int32)
    pay2 = jnp.concatenate([j, j])[o2]
    n2 = (src2.sum() + act_d.sum()).astype(jnp.int32)

    # staged stream slot of each active dest = its rank among phase-2 dest
    # entries; map it back onto the band row for the phase-1 extract
    e2 = jnp.arange(2 * nr, dtype=jnp.int32)
    drank = jnp.cumsum(t2).astype(jnp.int32) - 1
    di = jnp.where((t2 == 1) & (e2 < n2), pay2, nr)
    slot_by_i = (
        jnp.zeros((nr + 1,), jnp.int32).at[di].set(drank, mode="drop")[:nr]
    )

    # phase-1 schedule: band rows ascending (sequential tile stream)
    big1 = jnp.int32(nr + 1)
    r1 = jnp.concatenate([
        jnp.where(src1, glist - k, big1),
        jnp.where(act_d, j, big1),
    ])
    o1 = jnp.argsort(r1, stable=True)
    r1s = r1[o1]
    t1 = jnp.concatenate(
        [jnp.zeros((nr,), jnp.int32), jnp.ones((nr,), jnp.int32)]
    )[o1]
    pay1 = jnp.concatenate([j, slot_by_i])[o1]
    n1 = (src1.sum() + act_d.sum()).astype(jnp.int32)

    # read-prefetch chains: the next 1..depth distinct tiles/windows
    tile1 = jnp.where(e2 < n1, r1s // btg, jnp.int32(-2))
    tile_chain = _next_chain(tile1, tile_depth)
    wid2 = jnp.where(e2 < n2, row2 // g, jnp.int32(-2))
    win_chain = _next_chain(wid2, win_depth)

    kmeta = jnp.stack([k, n1, n2, act_d.sum()]).astype(jnp.int32)
    return kmeta, r1s, pay1, t1, tile_chain, row2, pay2, t2, win_chain


def rows_exchange(a, k, glist, dests, interpret=False):
    """One-sweep bounded row exchange.  Returns ``(a', pivrows)`` where

      * ``pivrows[j] = a[glist[j], :]`` (values of the ORIGINAL ``a``) —
        the caller writes it over the band ``a'[k:k+nr, :]``, and
      * ``a'[dests[i], :] = a[k + i, :]`` for every i whose destination
        lies outside the band [k, k+nr) (in-band destinations are covered
        by the band write; swap chains bottom out in the band, so they
        carry identical values).

    ``k`` (traced) must be granule-aligned.  Equivalent to
    ``rows_gather`` + ``rows_scatter_from_band`` but reads each
    out-of-band granule window ONCE instead of twice — on pivot-heavy
    (uniform-corpus) inputs the windows are nearly all distinct and the
    double read was the dominant exchange cost.

    (The round-3/4 lazy-left-swap variant — a column-suffix exchange plus a
    deferred per-segment repermutation — was deleted after losing its chip
    A/Bs; see STATUS.md round 4 and git history for the implementation.)
    """
    n, wfull = a.shape
    w = wfull
    g = _granule(a.dtype)
    nr = int(glist.shape[0])
    kmeta, r1s, pay1, t1, (nxt1, nxt1b), row2, pay2, t2, nxw123 = (
        build_exchange_schedules(n, k, glist, dests, g,
                                 tile_depth=2, win_depth=3)
    )
    a2, piv3, _ = _build_rows_exchange(
        n, wfull, nr, a.dtype.name, interpret, xsel_mode()
    )(r1s, pay1, t1, nxt1, nxt1b, row2, pay2, t2, *nxw123, kmeta, a)
    # pivrows staging is fp32 (see _build_rows_exchange); exact for bf16
    return a2, piv3.reshape(nr, w).astype(a.dtype)


def rows_exchange3(a3, k, glist, dests, interpret=False):
    """Pair-layout variant of :func:`rows_exchange` (round 5): ``a3`` is the
    natively-3D (n/2, 2, n) bf16 working matrix, row i living at
    ``a3[i // 2, i % 2]``.  The DMA window granule drops 16 -> 2 rows — the
    measured bound of the pivot-heavy 64k exchange was granule-window
    traffic (16 rows streamed r+w per 1-2 moved rows; STATUS round-4), an
    8x cut.  Schedules, staging, and arithmetic are identical to the 2D
    kernel, so the exchanged values are bit-exact.  Returns
    ``(a3', piv3)`` with ``piv3`` the RAW (nr, 1, w) fp32 pivot-row staging
    buffer — the pair-layout band write (`ops/pair3d.band_write_rows`)
    consumes it directly, avoiding an XLA (nr, w) relayout."""
    np_, two, wfull = a3.shape
    assert two == 2, a3.shape
    n = 2 * np_
    nr = int(glist.shape[0])
    # 16-slot / 6-deep window ring: pair windows are 8x smaller than the 2D
    # kernel's, so the sweep is issue-latency bound, not bytes bound
    kmeta, r1s, pay1, t1, (nxt1, nxt1b), row2, pay2, t2, nxw = (
        build_exchange_schedules(n, k, glist, dests, 2,
                                 tile_depth=2, win_depth=6, btg=16)
    )
    a2, piv3, _ = _build_rows_exchange(
        n, wfull, nr, a3.dtype.name, interpret, xsel_mode(), p3=True,
        rings=16, ahead=6,
    )(r1s, pay1, t1, nxt1, nxt1b, row2, pay2, t2, *nxw, kmeta, a3)
    return a2, piv3


def flush_overflow(a, novstart: int, dests, interpret=False):
    """Deferred-exchange flush (round 5): ``a[dests[i], :] =
    a[novstart + i, :]`` for every live slot i (``dests[i] < novstart``;
    dead slots carry the 2**31-1 sentinel and are dropped).

    Runs the combined-exchange kernel with the overflow strip
    [novstart, novstart + OV) in the band role and NO pivot sources
    (``build_exchange_schedules(sources=False)``): phase 1 streams the
    overflow tiles sequentially, staging each live row at its
    destination-window rank; phase 2 sweeps the destination windows in
    ascending order, overlaying from the staged stream — each touched
    window is visited ONCE for the whole S-block-column group's deferred
    rows, which is the entire point of the deferral (the granule window
    moves 16 rows however many of them carry moves; batching S columns
    multiplies moves-per-visit by ~S).  ``dests`` must be pairwise
    distinct among live slots (each position has exactly one holder)."""
    n_ext, wfull = a.shape
    g = _granule(a.dtype)
    nov = int(dests.shape[0])
    glist = novstart + jnp.arange(nov, dtype=jnp.int32)  # inert (sources off)
    kmeta, r1s, pay1, t1, (nxt1, nxt1b), row2, pay2, t2, nxw123 = (
        build_exchange_schedules(n_ext, novstart, glist, dests, g,
                                 tile_depth=2, win_depth=3, sources=False)
    )
    a2, _, _ = _build_rows_exchange(
        n_ext, wfull, nov, a.dtype.name, interpret, xsel_mode(), nrp=8
    )(r1s, pay1, t1, nxt1, nxt1b, row2, pay2, t2, *nxw123, kmeta, a)
    return a2


def _copy_rows_kernel(meta_ref, a_in_ref, a_ref, sem, *, nrows: int, g: int):
    """One HBM->HBM block copy: a[dst : dst+nrows) = a[src : src+nrows)
    (non-overlapping, both granule-aligned)."""
    src = pl.multiple_of(meta_ref[0], g)
    dst = pl.multiple_of(meta_ref[1], g)
    cp = pltpu.make_async_copy(
        a_in_ref.at[pl.ds(src, nrows), :], a_ref.at[pl.ds(dst, nrows), :],
        sem,
    )
    cp.start()
    cp.wait()


@functools.lru_cache(maxsize=32)
def _build_copy_rows(n: int, w: int, nrows: int, dtype_name: str,
                     interpret: bool = False):
    dt = jnp.dtype(dtype_name)
    kernel = functools.partial(_copy_rows_kernel, nrows=nrows, g=_granule(dt))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # meta (2,) = [src, dst]
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((n, w), dt),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def copy_rows_block(a, src, dst, nrows: int, interpret=False):
    """In-place contiguous row-block copy a[dst:dst+nrows) = a[src:src+nrows)
    (one HBM->HBM DMA; the deferred-exchange driver's band -> overflow
    append).  ``src``/``dst`` traced, granule-aligned, non-overlapping."""
    n, w = a.shape
    meta = jnp.stack([jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32)])
    return _build_copy_rows(n, w, nrows, a.dtype.name, interpret)(meta, a)
