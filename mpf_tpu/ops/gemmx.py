"""Manual-DMA trailing GEMM with fused row-exchange side work (round 4).

``gemm_trailing`` computes, in place on the full (n, n) working matrix,

    a[r0:r0+m, c0:c0+w] -= l21 @ u12        (fp32 MXU accumulation)

like :func:`mpf_tpu.ops.panel_fused.trailing_gemm_sub` (the reference's
cublasDgemm, `MPF.cu:230-239`), but with the tile pipeline hand-rolled
(grid=(), ``fori`` over tiles, manual async copies) instead of Pallas
auto-blocking — so that OTHER HBM traffic can be threaded between the MXU
tiles.  Motivation (round-3 ablations): the trailing GEMM is MXU-bound
(within 2% of the 194 TF/s floor at n=65536 bf16) leaving roughly half the
HBM bandwidth idle, while the physical row exchange after each block column
is pure HBM/latency traffic (603 ms of the 1931 ms n=65536 uniform-corpus
run).  Threading the exchange's window DMAs through the GEMM's tile loop
makes them ride the idle bandwidth instead of serializing after it.

GEMM tile schedule: row strips of ``ti`` = 2048 (1024 when m is an odd
multiple of 1024) with the L21 strip cached across the row (two slots),
t=1024 column tiles with a22 + u12 in 4-slot rings — reads issued two steps
ahead, writes lagging two steps.  U12 re-fetch traffic is (m/ti)*kk*w bytes;
at ti=2048 that is 2x the auto-kernel's 4096-row core, paid from idle
bandwidth, not wall-clock.

Fused exchange = the combined one-sweep kernel of `ops/exchange.py`
(LAPACK LASWP semantics in one composed row map, `MPF.cu:42-59`), driven
incrementally: a few schedule entries are consumed after each GEMM tile,
each entry gated on the completion (write-back landed) of the GEMM row
strip its granule window overlaps — entries below ``r0`` (already-factored
rows) are free immediately.  This is what lets the driver run block column
k+1's row exchange *inside* block column k's trailing GEMM (lookahead):
the exchange of rows in strip s only needs strip s's GEMM results, not the
whole update.  Windows use an 8-slot ring with a 3-deep read-ahead chain
(``nxw1..3`` schedule columns) so the scalar core never stalls on a window
read between MXU tiles.

MAINTENANCE CHECK (ADVICE r4): the exchange gating (``x_gate`` + the +5
write-wait margin, ring-slot reuse) is exercisable ONLY on real hardware —
interpret-mode DMAs complete synchronously, so the CI bit-exactness tests
cannot catch a gating regression (a wrong ``done`` offset produces silently
corrupt factors only on chip).  After ANY change to the tile schedule or
the gate arithmetic, re-run the chip validation harness
(``python tools/tpu_gemmx_r4.py val`` — n=4096 fp32+bf16 bit-exactness vs
the serial composition) before relying on results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpf_tpu.ops.panel_fused import _granule
from mpf_tpu.ops.exchange import (_row_take, build_exchange_schedules,
                                  xsel_mode)

_NWIN = 8   # exchange window ring slots (read-ahead 3 + write-behind)
_XAHEAD = 3  # window read-ahead depth


def _gemmx_kernel(
    meta_ref, r1_ref, pay1_ref, t1_ref, nxt1_ref, nxt1b_ref,
    row2_ref, pay2_ref, t2_ref, nxw1_ref, nxw2_ref, nxw3_ref,
    l_ref, u_ref, a_in_ref, a_ref, piv_ref, stg_ref,
    lbuf, ubuf, abuf, xwin, xband, xvbuf, xstile, pend, wps, sems, xsems,
    *, ti: int, t: int, kk: int, ni: int, nj: int, r0: int, c0: int,
    g: int, xw: int, nr: int, hi, fuse_x: bool, xsel: str = "masked",
):
    """meta (scalar prefetch): [kb, n1, n2, nd] — exchange band offset and
    active entry counts (schedule layout as in `exchange.rows_exchange`,
    plus the deeper next-window chains).  All-zero => no exchange work."""
    f32 = jnp.float32
    nsteps = ni * nj
    dt = a_ref.dtype
    # pair-major schedule (round 4): row strips processed in PAIRS sharing
    # one u12 tile pass — step s covers strip base + 2p + (sp % 2), column
    # tile (sp % 2nj) // 2 — halving the u12 re-fetch traffic (the dominant
    # non-output HBM term: (m/ti)·kk·w bytes at ti=2048).  Odd ni runs
    # strip 0 SOLO first (classic order), then pairs — every shape pairs.
    # Bit-identical results (same per-tile dots, different order).
    pair = ni >= 2
    solo = (ni % 2) if pair else 0
    base = solo * nj  # steps in the leading solo-strip region
    nls = 4 if pair else 2  # lbuf ring slots

    def sij(s):
        if not pair:
            return s // nj, s % nj
        if isinstance(s, int):
            if s < base:
                return 0, s
            sp = s - base
            return 2 * (sp // (2 * nj)) + sp % 2 + solo, (sp % (2 * nj)) // 2
        sp = s - base
        ip = 2 * (sp // (2 * nj)) + sp % 2 + solo
        jp = (sp % (2 * nj)) // 2
        if solo:
            return (jnp.where(s < base, 0, ip), jnp.where(s < base, s, jp))
        return ip, jp

    def uq(s):
        """u-tile ordinal of step s (consecutive tiles share a ring slot
        ordinal; a pair's two steps share ONE ordinal)."""
        if not pair:
            return s
        if isinstance(s, int):
            return s if s < base else base + (s - base) // 2
        q = base + (s - base) // 2
        return jnp.where(s < base, s, q) if solo else q

    def uneed(s):
        """Does step s start/await its own u-tile read (vs sharing its
        pair partner's)?"""
        if not pair:
            return True
        if isinstance(s, int):
            return s < base or (s - base) % 2 == 0
        return (s < base) | ((s - base) % 2 == 0)

    # ---------------- GEMM tile DMAs ----------------------------------------
    def l_read(i, slot):
        return pltpu.make_async_copy(
            l_ref.at[pl.ds(pl.multiple_of(i * ti, min(ti, 1024)), ti), :],
            lbuf.at[slot], sems.at[8 + slot],
        )

    def u_read(j, slot):
        return pltpu.make_async_copy(
            u_ref.at[:, pl.ds(pl.multiple_of(j * t, t), t)],
            ubuf.at[slot], sems.at[slot],
        )

    def a_tile(i, j):
        return a_ref.at[
            pl.ds(pl.multiple_of(r0 + i * ti, min(ti, 1024)), ti),
            pl.ds(pl.multiple_of(c0 + j * t, t), t),
        ]

    def a_read(i, j, slot):
        return pltpu.make_async_copy(a_tile(i, j), abuf.at[slot],
                                      sems.at[4 + slot])

    def a_write(i, j, slot):
        return pltpu.make_async_copy(abuf.at[slot], a_tile(i, j),
                                      sems.at[12 + slot])

    # ---------------- fused-exchange machinery (full row width) -------------
    if fuse_x:
        ci = pl.ds(0, xw)
        grows = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
        srows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)
        kb = meta_ref[0]
        n1 = meta_ref[1]
        n2 = meta_ref[2]
        nd = meta_ref[3]

        def row_write_start(slot, kind, pos):
            @pl.when(kind == 0)
            def _():
                pltpu.make_async_copy(
                    xvbuf.at[slot], piv_ref.at[pos], xsems.at[slot]
                ).start()

            @pl.when(kind == 1)
            def _():
                pltpu.make_async_copy(
                    xvbuf.at[slot], stg_ref.at[pos], xsems.at[slot]
                ).start()

        def row_write_wait(slot):
            kind = pend[slot, 0]
            pos = pend[slot, 1]

            @pl.when(kind == 0)
            def _():
                pltpu.make_async_copy(
                    xvbuf.at[slot], piv_ref.at[pos], xsems.at[slot]
                ).wait()

            @pl.when(kind == 1)
            def _():
                pltpu.make_async_copy(
                    xvbuf.at[slot], stg_ref.at[pos], xsems.at[slot]
                ).wait()

        def emit_row(wcnt, val, kind, pos):
            slot = wcnt % 4

            @pl.when(wcnt >= 4)
            def _():
                row_write_wait(slot)

            xvbuf[slot] = val.astype(xvbuf.dtype)
            row_write_start(slot, kind, pos)
            pend[slot, 0] = kind
            pend[slot, 1] = pos
            return wcnt + 1

        def btile_read(tt, slot):
            return pltpu.make_async_copy(
                a_ref.at[pl.ds(pl.multiple_of(kb + tt * g, g), g), ci],
                xband.at[slot], xsems.at[4 + 2 * _NWIN + slot],
            )

        def win_read(gr, slot):
            return pltpu.make_async_copy(
                a_ref.at[pl.ds(pl.multiple_of(gr * g, g), g), ci],
                xwin.at[slot], xsems.at[4 + slot],
            )

        def win_write(gr, slot):
            return pltpu.make_async_copy(
                xwin.at[slot],
                a_ref.at[pl.ds(pl.multiple_of(gr * g, g), g), ci],
                xsems.at[4 + _NWIN + slot],
            )

        def wps_wait(slot):
            @pl.when(wps[slot, 0] == 1)
            def _():
                win_write(wps[slot, 1], slot).wait()
                wps[slot, 0] = 0

        def stile_read(tt, slot):
            return pltpu.make_async_copy(
                stg_ref.at[pl.ds(pl.multiple_of(tt * 8, 8), 8)],
                xstile.at[slot], xsems.at[8 + 2 * _NWIN + slot],
            )

        # --- phase 1 (band stream): carry (last_tile, tord, wcnt) -----------
        def p1_body(e, carry):
            last_tile, tord, wcnt = carry
            rowp = r1_ref[e]
            tile = rowp // g
            tswitch = tile != last_tile
            tord = tord + tswitch.astype(jnp.int32)
            tsl = tord % 4

            @pl.when(tswitch)
            def _():
                @pl.when(tord == 0)
                def _():  # first tile: read it and its successor now
                    btile_read(tile, tsl).start()
                    nt0 = nxt1_ref[e]

                    @pl.when(nt0 >= 0)
                    def _():
                        btile_read(nt0, (tord + 1) % 4).start()

                btile_read(tile, tsl).wait()
                nt = nxt1b_ref[e]

                @pl.when(nt >= 0)
                def _():  # keep two tiles of read-ahead
                    btile_read(nt, (tord + 2) % 4).start()

            val = _row_take(xband[tsl], rowp % g, grows, xsel)
            wcnt = emit_row(wcnt, val, t1_ref[e], pay1_ref[e])
            return tile, tord, wcnt

        # --- phase 2 (window sweep): carry (last_gr, word, dirty, scnt,
        # wcnt) ---------------------------------------------------------------
        def p2_body(e, carry):
            last_gr, word, dirty, scnt, wcnt = carry
            grow = row2_ref[e]
            typ = t2_ref[e]
            gr = grow // g
            switch = (gr != last_gr) | (word < 0)
            word = word + switch.astype(jnp.int32)
            cur = word % _NWIN

            @pl.when(switch)
            def _():
                wps_wait(cur)  # ordinal word-_NWIN's write must have landed

                @pl.when(word == 0)
                def _():  # prime the read-ahead chain
                    win_read(gr, cur).start()
                    for d, nxd in ((1, nxw1_ref), (2, nxw2_ref)):
                        nw0 = nxd[e]

                        @pl.when(nw0 >= 0)
                        def _():
                            sl = (word + d) % _NWIN
                            wps_wait(sl)
                            win_read(nw0, sl).start()

                win_read(gr, cur).wait()
                prev = (word + _NWIN - 1) % _NWIN

                @pl.when((word > 0) & (dirty == 1))
                def _():  # close the previous window (write-behind)
                    wps_wait(prev)
                    win_write(last_gr, prev).start()
                    wps[prev, 0] = 1
                    wps[prev, 1] = last_gr

                nw = nxw3_ref[e]

                @pl.when(nw >= 0)
                def _():  # extend the read-ahead chain to depth 3
                    nslot = (word + _XAHEAD) % _NWIN
                    wps_wait(nslot)
                    win_read(nw, nslot).start()

            dirty = jnp.where(switch, jnp.int32(0), dirty)
            last_gr = jnp.where(switch, gr, last_gr)

            @pl.when(typ == 0)
            def _():  # source extract (always before overlays in-window)
                val = _row_take(xwin[cur], grow % g, grows, xsel)
                slot = wcnt % 4

                @pl.when(wcnt >= 4)
                def _():
                    row_write_wait(slot)

                xvbuf[slot] = val.astype(xvbuf.dtype)
                row_write_start(slot, jnp.int32(0), pay2_ref[e])
                pend[slot, 0] = 0
                pend[slot, 1] = pay2_ref[e]

            wcnt = wcnt + (typ == 0).astype(jnp.int32)

            @pl.when(typ == 1)
            def _():  # dest overlay from the staged stream
                t8 = scnt // 8
                sl8 = t8 % 2

                @pl.when(scnt % 8 == 0)
                def _():
                    @pl.when(scnt == 0)
                    def _():
                        stile_read(0, 0).start()

                    stile_read(t8, sl8).wait()

                    @pl.when((t8 + 1) * 8 < nd)
                    def _():
                        stile_read(t8 + 1, 1 - sl8).start()

                v = jnp.sum(
                    jnp.where(srows8 == scnt % 8, xstile[sl8].astype(f32), 0.0),
                    axis=0,
                )
                xwin[cur] = jnp.where(
                    grows == grow % g, v.astype(xwin.dtype), xwin[cur]
                )

            dirty = jnp.where(typ == 1, jnp.int32(1), dirty)
            scnt = scnt + (typ == 1).astype(jnp.int32)
            return last_gr, word, dirty, scnt, wcnt

        def drain_p1_ring(t1c):
            for sl in range(4):
                @pl.when(sl < t1c)
                def _():
                    row_write_wait(sl)

        def x_gate(row, s):
            """True once the GEMM strip containing ``row`` is complete AND
            its tile writes have landed (writes lag two steps; entries run
            at the end of a step).  Rows above r0 are immediately free."""
            si = jnp.where(row >= r0, (row - r0) // ti, jnp.int32(-1))
            # done = (strip's last tile step) + 5: the in-loop wait of step
            # t's tile write runs at step t+2 ONLY when t <= nsteps-5 (the
            # wait lives in the `s + 2 < nsteps` prefetch block); entries
            # gated any earlier could read rows whose write-back DMA is
            # still in flight.  Strips finishing in the last 4 steps are
            # only flushed in the epilogue — their entries drain there.
            if pair:
                sq = si - solo  # pair-region strip index (solo strip is -1)
                done = (base + (sq // 2) * (2 * nj) + 2 * (nj - 1)
                        + (sq % 2) + 5)
                if solo:
                    done = jnp.where(si == 0, nj + 4, done)
            else:
                done = (si + 1) * nj + 4
            return s >= jnp.where(si < 0, jnp.int32(0), done)

        def p1_gate_row(e):
            """Furthest row entry ``e``'s processing may TOUCH — its own
            band tile plus the depth-2 tile read-ahead it can issue.  The
            gate must cover the prefetches, not just the current row, or
            the read-ahead streams pre-GEMM bytes from incomplete strips."""
            tmax = jnp.maximum(
                r1_ref[e] // g, jnp.maximum(nxt1_ref[e], nxt1b_ref[e])
            )
            return kb + tmax * g + (g - 1)

        def p2_gate_row(e):
            """Furthest row entry ``e`` may touch: its window plus the
            depth-3 window read-ahead chain."""
            wmax = jnp.maximum(
                jnp.maximum(row2_ref[e] // g, nxw1_ref[e]),
                jnp.maximum(nxw2_ref[e], nxw3_ref[e]),
            )
            return wmax * g + (g - 1)

        # per-step entry budget: enough to drain 2*nr entries over the steps
        # with slack; tiny for big GEMMs (the common case)
        quota = max(2, (2 * max(nr, 1)) // max(nsteps, 1) + 2)

    # ---------------- main loop ----------------------------------------------
    l_read(0, 0).start()
    if pair:
        l_read(1, 1).start()
        if solo and ni >= 3:
            l_read(2, 2).start()  # pair (1, 2) follows the solo strip
    for s0 in range(min(2, nsteps)):
        a_read(*sij(s0), s0 % 4).start()
        if uneed(s0):
            u_read(sij(s0)[1], uq(s0) % 4).start()

    def step(s, carry):
        (e1, t1a, t1b, t1c, drained, e2, c2a, c2b, c2c, c2d, c2e) = carry
        i, j = sij(s)
        slot = s % 4

        if pair:
            @pl.when((s >= base) & ((s - base) % (2 * nj) == 0))
            def _():  # pair start: i is the pair's first strip here
                l_read(i, i % 4).wait()
                l_read(i + 1, (i + 1) % 4).wait()

                @pl.when(i + 2 < ni)
                def _():  # strips beyond the solo one come in pairs
                    l_read(i + 2, (i + 2) % 4).start()
                    l_read(i + 3, (i + 3) % 4).start()
            if solo:
                @pl.when(s == 0)
                def _():
                    l_read(0, 0).wait()
        else:
            @pl.when(j == 0)
            def _():
                l_read(i, i % 2).wait()

                @pl.when(i + 1 < ni)
                def _():
                    l_read(i + 1, (i + 1) % 2).start()

        a_read(i, j, slot).wait()
        if pair:
            @pl.when(uneed(s))
            def _():  # the same u tile serves the pair's other strip
                u_read(j, uq(s) % 4).wait()
        else:
            u_read(j, uq(s) % 4).wait()
        upd = jax.lax.dot_general(
            lbuf[i % nls], ubuf[uq(s) % 4], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hi,
        )
        abuf[slot] = (abuf[slot].astype(f32) - upd).astype(dt)
        a_write(i, j, slot).start()

        @pl.when(s + 2 < nsteps)
        def _():
            s2 = s + 2
            slot2 = s2 % 4

            @pl.when(s >= 2)
            def _():
                a_write(*sij(s - 2), slot2).wait()

            a_read(*sij(s2), slot2).start()
            if pair:
                @pl.when(uneed(s2))
                def _():
                    u_read(sij(s2)[1], uq(s2) % 4).start()
            else:
                u_read(sij(s2)[1], uq(s2) % 4).start()

        if not fuse_x:
            return carry

        # ---- exchange pacing: advance each phase through its (gate-
        # monotone) schedule under the per-step budget --------------------
        def p1_step(_, c):
            t1a_, t1b_, t1c_, e1_ = c
            e = e1_
            ok = (e1_ < n1) & x_gate(p1_gate_row(jnp.minimum(e, 2 * nr - 1)), s)

            def run(cc):
                a_, b_, c_ = p1_body(e, (cc[0], cc[1], cc[2]))
                return a_, b_, c_, cc[3] + 1

            return jax.lax.cond(ok, run, lambda cc: cc,
                                (t1a_, t1b_, t1c_, e1_))

        t1a, t1b, t1c, e1 = jax.lax.fori_loop(
            0, quota, p1_step, (t1a, t1b, t1c, e1)
        )

        # phase 1 fully emitted => drain its row ring ONCE (phase 2 reads
        # the staged rows phase 1 wrote)
        @pl.when((e1 >= n1) & (drained == 0))
        def _():
            drain_p1_ring(t1c)

        drained = jnp.where(e1 >= n1, jnp.int32(1), drained)

        def p2_step(_, c):
            a_, b_, c_, d_, ee_, e2_ = c
            e = e2_
            ok = (
                (drained == 1) & (e2_ < n2)
                & x_gate(p2_gate_row(jnp.minimum(e, 2 * nr - 1)), s)
            )

            def run(cc):
                r = p2_body(e, (cc[0], cc[1], cc[2], cc[3], cc[4]))
                return r + (cc[5] + 1,)

            return jax.lax.cond(ok, run, lambda cc: cc,
                                (a_, b_, c_, d_, ee_, e2_))

        c2a, c2b, c2c, c2d, c2e, e2 = jax.lax.fori_loop(
            0, quota, p2_step, (c2a, c2b, c2c, c2d, c2e, e2)
        )
        return (e1, t1a, t1b, t1c, drained, e2, c2a, c2b, c2c, c2d, c2e)

    if fuse_x:
        for sl in range(_NWIN):
            wps[sl, 0] = 0
    carry0 = (
        jnp.int32(0), jnp.int32(-1), jnp.int32(-1), jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0), jnp.int32(-1), jnp.int32(-1), jnp.int32(0),
        jnp.int32(0), jnp.int32(0),
    )
    carry = jax.lax.fori_loop(0, nsteps, step, carry0)

    # epilogue: flush the last GEMM tile writes ...
    for back in range(min(4, nsteps)):
        s = nsteps - 1 - back
        a_write(*sij(s), s % 4).wait()

    if fuse_x:
        # ... then drain the remaining exchange entries (every gate is now
        # satisfied: all strips complete, all writes landed)
        (e1, t1a, t1b, t1c, drained, e2, c2a, c2b, c2c, c2d, c2e) = carry
        t1a, t1b, t1c = jax.lax.fori_loop(
            e1, n1, p1_body, (t1a, t1b, t1c)
        )

        @pl.when(drained == 0)
        def _():
            drain_p1_ring(t1c)

        last_gr, word, dirty, scnt, wcnt2 = jax.lax.fori_loop(
            e2, n2, p2_body, (c2a, c2b, c2c, c2d, c2e)
        )

        @pl.when((word >= 0) & (dirty == 1))
        def _():  # close the final window
            cur = word % _NWIN
            wps_wait(cur)
            win_write(last_gr, cur).start()
            wps[cur, 0] = 1
            wps[cur, 1] = last_gr

        for sl in range(_NWIN):
            wps_wait(sl)
        for sl in range(4):  # phase-2 row ring (phase 1's already drained)
            @pl.when(sl < wcnt2)
            def _():
                row_write_wait(sl)


def _auto_tiles(m: int, kk: int, gd) -> tuple[int, int]:
    """(ti, t) defaults: 2048-row strips (1024 for odd-1024 m, and for
    fp32 gd at kk >= 2048 where the VMEM rings would exceed the chip)."""
    ti = 2048 if m % 2048 == 0 else 1024
    if gd == jnp.dtype(jnp.float32) and kk >= 2048:
        ti = 1024
    return ti, 1024


@functools.lru_cache(maxsize=256)
def _build_gemmx(n: int, r0: int, c0: int, m: int, w: int, kk: int,
                 nr: int, dtype_name: str, gd_name: str,
                 interpret: bool = False, ti: int | None = None,
                 t: int | None = None, xsel: str = "masked"):
    dt = jnp.dtype(dtype_name)
    gd = jnp.dtype(gd_name)
    g = _granule(dt)
    ti0, t0 = _auto_tiles(m, kk, gd)
    ti = ti or ti0
    t = t or t0
    assert (m % ti == 0 and w % t == 0 and r0 % g == 0 and c0 % t == 0
            and r0 % min(ti, 1024) == 0), (n, r0, c0, m, w, ti)
    ni, nj = m // ti, w // t
    fuse_x = nr > 0
    xw = n if fuse_x else 128
    nr8 = -(-max(nr, 8) // 8) * 8
    sdt = jnp.dtype(jnp.float32)  # single-row staging is always fp32
    hi = jax.lax.Precision.HIGHEST if gd == jnp.float32 else None
    kernel = functools.partial(
        _gemmx_kernel, ti=ti, t=t, kk=kk, ni=ni, nj=nj, r0=r0, c0=c0,
        g=g, xw=xw, nr=nr, hi=hi, fuse_x=fuse_x, xsel=xsel,
    )
    vmem_scratch = [
        # lbuf: 4 slots (a full strip PAIR + the next pair's prefetch) in
        # pair-major mode (ni >= 2, matching the kernel's gate), 2 otherwise
        pltpu.VMEM((4 if ni >= 2 else 2, ti, kk), gd),
        pltpu.VMEM((4, kk, t), gd),           # ubuf
        pltpu.VMEM((4, ti, t), dt),           # abuf
        pltpu.VMEM((_NWIN, g, xw), dt),       # exchange window ring
        pltpu.VMEM((4, g, xw), dt),           # band tile ring
        pltpu.VMEM((4, 1, xw), sdt),          # outgoing row ring
        pltpu.VMEM((2, 8, 1, xw), sdt),       # staged batches
    ]
    # budget derived from the SAME shape list passed to pallas_call, so the
    # two cannot diverge (ADVICE r4 item 3: a hand-maintained formula had
    # drifted from the actual slot counts), plus the f32 dot/subtract
    # temporaries and slack for Mosaic's scoped-stack accounting
    import math as _math

    vmem = sum(
        _math.prod(s.shape) * jnp.dtype(s.dtype).itemsize
        for s in vmem_scratch
    ) + 2 * ti * t * 4 + (24 << 20)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # kmeta, r1, pay1, t1, nxt1, nxt1b, row2, pay2, t2, nxw1..3
            num_scalar_prefetch=12,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # l21 (m, kk)
                pl.BlockSpec(memory_space=pl.ANY),   # u12 (kk, w)
                pl.BlockSpec(memory_space=pl.ANY),   # a (n, n)
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),   # a (aliased)
                pl.BlockSpec(memory_space=pl.ANY),   # pivrows
                pl.BlockSpec(memory_space=pl.ANY),   # staged
            ),
            scratch_shapes=vmem_scratch + [
                pltpu.SMEM((4, 2), jnp.int32),        # pend (kind,pos)/vbuf
                pltpu.SMEM((_NWIN, 2), jnp.int32),    # wps (flag,win)/slot
                # GEMM sems: 0-3 u ring, 4-7 a reads, 8-11 l ring (4 slots
                # in pair-major mode), 12-15 a writes
                pltpu.SemaphoreType.DMA((16,)),
                # exchange sems: 0-3 row ring, 4-11 window reads, 12-19
                # window writes, 20-23 band tiles, 24-25 staged batches
                pltpu.SemaphoreType.DMA((10 + 2 * _NWIN,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, n), dt),
            jax.ShapeDtypeStruct((nr8, 1, xw), sdt),
            jax.ShapeDtypeStruct((nr8, 1, xw), sdt),
        ),
        input_output_aliases={14: 0},  # a, after 12 prefetch + l + u
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem, 126 << 20)),
            has_side_effects=True,
        ),
        interpret=interpret,
    )


def gemm_trailing(a, l21, u12, r0, c0, xargs=None,
                  interpret=False, ti=None, t=None):
    """In-place ``a[r0:r0+m, c0:c0+w] -= l21 @ u12`` with fp32 MXU
    accumulation (manual tile pipeline; see module docstring).  ``r0``/
    ``c0`` static, multiples of 1024.

    ``xargs = (k, glist, dests)`` fuses the combined one-sweep row
    exchange into the tile loop (entries gated on GEMM strip completion):
    returns ``(a', pivrows)`` with ``pivrows[j] = a_post_gemm[glist[j], :]``
    and band rows scattered to out-of-band ``dests`` — the caller finishes
    by writing ``pivrows`` over the band (exchange.rows_exchange contract).
    Without ``xargs`` returns ``a'``.
    """
    n = a.shape[0]
    m, kk = l21.shape
    kk2, w = u12.shape
    assert kk2 == kk, (u12.shape, kk)
    g = _granule(a.dtype)
    if xargs is None:
        nr = 0
        dummy = jnp.zeros((1,), jnp.int32)
        sched = (jnp.zeros((4,), jnp.int32),) + (dummy,) * 11
    else:
        k, glist, dests = xargs
        nr = int(glist.shape[0])
        km, r1s, pay1, t1, tc, row2, pay2, t2, wc = (
            build_exchange_schedules(n, k, glist, dests, g,
                                     tile_depth=2, win_depth=_XAHEAD)
        )
        sched = (km, r1s, pay1, t1, *tc, row2, pay2, t2, *wc)
    fn = _build_gemmx(n, int(r0), int(c0), m, w, kk, nr,
                      a.dtype.name, l21.dtype.name, interpret, ti, t,
                      xsel_mode())
    a2, piv3, _ = fn(*sched, l21, u12, a)
    if xargs is None:
        return a2
    return a2, piv3[:nr].reshape(nr, n).astype(a.dtype)
