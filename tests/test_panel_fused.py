"""Round-2 fused panel pipeline: strip-blocked pivot kernel, rowblock
assembly, streaming update, and the fused driver path — interpret mode on
CPU (SURVEY.md section 4 test strategy: Pallas interpret + golden CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

import mpf_tpu.config as cfg
import mpf_tpu.models.mpf as M
from mpf_tpu.ops.getf2 import panel_pivots_perm
from mpf_tpu.ops.panel_strip import strip_panel_pivots
from mpf_tpu.ops.panel_fused import (
    rowblock_assemble,
    panel_apply_update,
    panel_apply_update_trim,
)
from mpf_tpu.precision import MPF_BF16, ALL_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization

pytestmark = pytest.mark.slow  # interpret-mode Pallas throughout


def _dyadic(rng, m, r):
    """Entries whose elimination stays exact in fp32 — makes the deferred
    MXU updates bit-identical to the sequential reference."""
    a = (rng.integers(-4, 5, (m, r)) * 2.0 ** rng.integers(-2, 3, (m, r))).astype(
        np.float32
    )
    a[a == 0] = 1.0
    return a


def test_strip_pivots_exact_match_vs_reference():
    rng = np.random.default_rng(1)
    for off in (0, 8, 40):
        a = _dyadic(rng, 128, 16)
        pos0 = jnp.arange(128, dtype=jnp.int32)
        piv, pos, glist = strip_panel_pivots(
            jnp.asarray(a), off, pos0, panel_dtype=jnp.float32,
            interpret=True,
        )
        piv_ref, perm_ref = panel_pivots_perm(jnp.asarray(a), row_offset=off)
        np.testing.assert_array_equal(np.asarray(piv), np.asarray(piv_ref))
        # pos is the inverse of the reference's composed row map
        inv = np.empty(128, np.int64)
        inv[np.asarray(perm_ref)] = np.arange(128)
        np.testing.assert_array_equal(np.asarray(pos), inv)
        np.testing.assert_array_equal(
            np.asarray(glist), np.asarray(perm_ref)[off : off + 16]
        )


def test_strip_pivots_packed_path_matches_reference():
    """m % 1024 == 0 engages the (8, m/8) packed search chain — must be
    bit-identical to the reference kernel (and hence the flat path)."""
    rng = np.random.default_rng(6)
    m, r, off = 1024, 16, 24
    a = _dyadic(rng, m, r)
    pos0 = jnp.arange(m, dtype=jnp.int32)
    piv, pos, glist = strip_panel_pivots(
        jnp.asarray(a), off, pos0, panel_dtype=jnp.float32,
        interpret=True,
    )
    piv_ref, perm_ref = panel_pivots_perm(jnp.asarray(a), row_offset=off)
    np.testing.assert_array_equal(np.asarray(piv), np.asarray(piv_ref))
    np.testing.assert_array_equal(
        np.asarray(glist), np.asarray(perm_ref)[off : off + r]
    )
    inv = np.empty(m, np.int64)
    inv[np.asarray(perm_ref)] = np.arange(m)
    np.testing.assert_array_equal(np.asarray(pos), inv)


def test_strip_pivots_quant16_tie_coarsening():
    """quant16 (default for bf16 panels) selects pivots at bf16 |value|
    granularity: candidates equal in the top 15 bits of |fp32| tie-break to
    the LOWEST current position; the exact two-reduce chain picks the true
    max.  Forced onto an fp32 panel here so the sub-bf16 gap survives the
    panel load."""
    m, r = 128, 8
    rng = np.random.default_rng(7)
    a = (0.001 + rng.uniform(0, 1e-4, (m, r))).astype(np.float32)
    a[5, 0] = 1.0
    a[100, 0] = np.float32(1.0 + 2.0**-9)  # same bf16 bucket as 1.0
    pos0 = jnp.arange(m, dtype=jnp.int32)
    pivq, posq, _ = strip_panel_pivots(
        jnp.asarray(a), 0, pos0, panel_dtype=jnp.float32, interpret=True,
        _quant16=True)
    pivx, _, _ = strip_panel_pivots(
        jnp.asarray(a), 0, pos0, panel_dtype=jnp.float32, interpret=True,
        _quant16=False)
    assert int(pivq[0]) == 5      # coarsened tie -> lowest position
    assert int(pivx[0]) == 100    # exact chain -> true max
    assert np.array_equal(np.sort(np.asarray(posq)), np.arange(m))


def _quant16_mirror(a, off, r):
    """Numpy mirror of the quant16 single-strip semantics (r == 8): fp32
    rank-1 in-strip updates; pivot = max of top-15-bit-truncated |value|,
    ties to the lowest current position; divisor = the truncated, signed
    pivot value."""
    m = a.shape[0]
    st = a.astype(np.float32).copy()
    pos = np.arange(m)
    piv = np.zeros(r, np.int64)
    glist = np.zeros(r, np.int64)
    for j in range(r):
        d = off + j
        col = np.ascontiguousarray(st[:, j])
        bits = col.view(np.uint32)
        tb = bits & np.uint32(0x7FFF0000)  # truncated |value| bits
        active = pos >= d
        mx = tb[active].max()
        cands = np.nonzero(active & (tb == mx))[0]
        o = cands[np.argmin(pos[cands])]   # lowest current position wins
        piv[j] = pos[o]
        glist[j] = o
        pv = np.array([tb[o]], np.uint32).view(np.float32)[0]
        if (bits[o] >> 31) & 1:
            pv = -pv
        safe = np.float32(1.0) if tb[o] == 0 else pv
        disp = np.nonzero(pos == d)[0][0]
        pos[o], pos[disp] = d, pos[o]
        mult = np.where(pos > d, col / safe, 0.0).astype(np.float32)
        for k in range(j + 1, r):
            st[:, k] = st[:, k] - st[o, k] * mult
    return piv, pos, glist


def test_strip_pivots_quant16_matches_mirror():
    """Forced-quant16 interpret kernel vs the numpy semantic mirror: exact
    piv/pos/glist match on random fp32 single-strip panels."""
    rng = np.random.default_rng(12)
    for off in (0, 8, 40):
        m, r = 64, 8
        a = rng.standard_normal((m, r)).astype(np.float32)
        pos0 = jnp.arange(m, dtype=jnp.int32)
        piv, pos, glist = strip_panel_pivots(
            jnp.asarray(a), off, pos0, panel_dtype=jnp.float32,
            interpret=True, _quant16=True)
        piv_m, pos_m, glist_m = _quant16_mirror(a, off, r)
        np.testing.assert_array_equal(np.asarray(piv), piv_m)
        np.testing.assert_array_equal(np.asarray(glist), glist_m)
        np.testing.assert_array_equal(np.asarray(pos), pos_m)


def test_strip_pivots_invariants_bf16():
    rng = np.random.default_rng(2)
    m, r, off = 256, 32, 16
    a = rng.standard_normal((m, r)).astype(np.float32)
    pos0 = jnp.arange(m, dtype=jnp.int32)
    piv, pos, glist = strip_panel_pivots(
        jnp.asarray(a), off, pos0, panel_dtype=jnp.bfloat16, interpret=True
    )
    piv, pos, glist = np.asarray(piv), np.asarray(pos), np.asarray(glist)
    assert np.array_equal(np.sort(pos), np.arange(m))  # pos is a permutation
    perm = np.empty(m, np.int64)
    perm[pos] = np.arange(m)  # invert: position -> original row
    assert (piv >= off).all() and (piv < m).all()
    np.testing.assert_array_equal(glist, perm[off : off + r])
    # frozen rows (initial position < off) never chosen
    assert np.array_equal(perm[:off], np.arange(off))


def test_rowblock_assemble_matches_manual():
    rng = np.random.default_rng(3)
    m, bc, r, jj0 = 256, 128, 8, 8
    slab = rng.standard_normal((m, bc)).astype(np.float32)
    glist = rng.permutation(m)[:r].astype(np.int32)
    rb, uinv, info = rowblock_assemble(
        jnp.asarray(slab), jnp.asarray(glist), jj0, interpret=True
    )
    rb, uinv = np.asarray(rb), np.asarray(uinv)
    staged = slab[glist]
    import scipy.linalg as sla

    diag = staged[:, jj0 : jj0 + r]
    lu = sla.lu(diag, permute_l=False)[1:]  # no pivoting: use own elimination
    # manual no-pivot LU
    d = diag.astype(np.float64).copy()
    for j in range(r):
        d[j + 1 :, j] /= d[j, j]
        d[j + 1 :, j + 1 :] -= np.outer(d[j + 1 :, j], d[j, j + 1 :])
    l = np.tril(d, -1) + np.eye(r)
    u = np.triu(d)
    np.testing.assert_allclose(rb[:, jj0 : jj0 + r], d, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(rb[:, :jj0], staged[:, :jj0], atol=0)
    u12 = np.linalg.solve(l, staged[:, jj0 + r :].astype(np.float64))
    np.testing.assert_allclose(rb[:, jj0 + r :], u12, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        uinv, np.linalg.inv(u), rtol=2e-3, atol=2e-3
    )
    assert int(info) == 0


def test_panel_apply_update_matches_manual():
    rng = np.random.default_rng(4)
    m, bc, r, j0, jj0 = 256, 128, 8, 16, 16
    slab = rng.standard_normal((m, bc)).astype(np.float32)
    pos = jnp.asarray(rng.permutation(m).astype(np.int32))
    rowblock = rng.standard_normal((r, bc)).astype(np.float32)
    uinv = np.triu(rng.standard_normal((r, r))).astype(np.float32)
    out = panel_apply_update(
        jnp.asarray(slab), pos, jnp.asarray(rowblock), jnp.asarray(uinv),
        j0, jj0, rb=128, interpret=True,
    )
    out = np.asarray(out)
    below = np.asarray(pos) >= j0 + r
    l21 = slab[:, jj0 : jj0 + r] @ uinv
    u12m = rowblock.copy()
    u12m[:, : jj0 + r] = 0.0
    expect = slab - np.where(below[:, None], l21 @ u12m, 0.0)
    expect[:, jj0 : jj0 + r] = np.where(
        below[:, None], l21, slab[:, jj0 : jj0 + r]
    )
    np.testing.assert_allclose(out, expect, rtol=2e-4, atol=2e-4)


def test_trailing_gemm_sub_matches_xla():
    """Epilogue-fused trailing update == a22 - l21 @ u12, untouched outside
    the trailing region, for fp32 and bf16 working dtypes."""
    from mpf_tpu.ops.panel_fused import trailing_gemm_sub

    rng = np.random.default_rng(9)
    n, ko, r = 3072, 1024, 64
    for dt, tol in ((np.float32, 2e-4), (jnp.bfloat16, 1e-1)):
        a = rng.standard_normal((n, n)).astype(np.float32)
        m = n - ko
        l21 = rng.standard_normal((m, r)).astype(np.float32)
        u12 = rng.standard_normal((r, m)).astype(np.float32)
        out = np.asarray(trailing_gemm_sub(
            jnp.asarray(a, dt), jnp.asarray(l21, dt), jnp.asarray(u12, dt),
            ko, interpret=True,
        ), np.float32)
        ad = np.asarray(jnp.asarray(a, dt), np.float32)
        exp = ad.copy()
        exp[ko:, ko:] = ad[ko:, ko:] - (
            np.asarray(jnp.asarray(l21, dt), np.float32)
            @ np.asarray(jnp.asarray(u12, dt), np.float32)
        )
        np.testing.assert_allclose(out, exp, rtol=tol, atol=tol * 8)
        np.testing.assert_array_equal(out[:ko, :], ad[:ko, :])
        np.testing.assert_array_equal(out[:, :ko], ad[:, :ko])


def test_rows_gather_interpret():
    """DMA row gather vs jnp.take, mixed window-sharing/random sources
    (the batch write-back is double-buffered — round 3)."""
    from mpf_tpu.ops.panel_fused import rows_gather

    rng = np.random.default_rng(21)
    n, w = 256, 256
    a = rng.standard_normal((n, w)).astype(np.float32)
    for nr, mode in ((8, "runs"), (32, "random"), (64, "mixed")):
        if mode == "runs":
            rows = np.arange(100, 100 + nr)
        elif mode == "random":
            rows = rng.permutation(n)[:nr]
        else:
            rows = np.concatenate([np.arange(40, 40 + nr // 2),
                                   rng.permutation(n)[: nr // 2]])
        out = rows_gather(jnp.asarray(a), jnp.asarray(rows, jnp.int32),
                          interpret=True)
        np.testing.assert_array_equal(np.asarray(out), a[rows])


def test_rows_scatter_inplace_interpret():
    """Granule-window RMW scatter vs .at[].set on unique destinations,
    including self-move skipping."""
    from mpf_tpu.ops.panel_fused import rows_scatter_inplace

    rng = np.random.default_rng(22)
    n, w, nr = 256, 256, 32
    a = rng.standard_normal((n, w)).astype(np.float32)
    dests = rng.permutation(n)[:nr]
    vals = rng.standard_normal((nr, w)).astype(np.float32)
    out = rows_scatter_inplace(
        jnp.asarray(a), jnp.asarray(dests, jnp.int32), jnp.asarray(vals),
        interpret=True)
    exp = a.copy()
    exp[dests] = vals
    np.testing.assert_array_equal(np.asarray(out), exp)
    # self-moves: value rows equal to current rows at those dests are no-ops
    self_src = np.asarray(dests, np.int32).copy()
    out2 = rows_scatter_inplace(
        jnp.asarray(exp), jnp.asarray(dests, jnp.int32), jnp.asarray(vals),
        self_src=jnp.asarray(self_src), interpret=True)
    np.testing.assert_array_equal(np.asarray(out2), exp)
    # window-revisit stress (dests unsorted since round 3): alternate
    # between two granule windows so every row re-reads a window with a
    # pending write
    dests_ab = np.empty(16, np.int64)
    dests_ab[0::2] = np.arange(8)        # window 0 rows 0..7
    dests_ab[1::2] = 64 + np.arange(8)   # window 8 rows 64..71
    vals_ab = rng.standard_normal((16, w)).astype(np.float32)
    out3 = rows_scatter_inplace(
        jnp.asarray(a), jnp.asarray(dests_ab, jnp.int32),
        jnp.asarray(vals_ab), interpret=True)
    exp3 = a.copy()
    exp3[dests_ab] = vals_ab
    np.testing.assert_array_equal(np.asarray(out3), exp3)


def test_rows_scatter_from_band_interpret():
    """Band-source scatter: out-of-band dests receive the band rows,
    in-band dests (incl. self-moves) are skipped, everything else is
    untouched — the driver's exchange semantics."""
    from mpf_tpu.ops.panel_fused import rows_scatter_from_band

    rng = np.random.default_rng(23)
    n, w, k, nr = 256, 128, 64, 32
    a = rng.standard_normal((n, w)).astype(np.float32)
    dests = np.empty(nr, np.int64)
    dests[:8] = k + np.arange(8)              # self-moves (in-band)
    dests[8:16] = k + 16 + np.arange(8)       # in-band non-self
    dests[16:] = np.concatenate([             # out-of-band, unsorted
        np.arange(160, 168), rng.permutation(np.arange(128, 152))[:8]])
    out = np.asarray(rows_scatter_from_band(
        jnp.asarray(a), k, jnp.asarray(dests, jnp.int32), interpret=True))
    exp = a.copy()
    for i in range(nr):
        if not (k <= dests[i] < k + nr):
            exp[dests[i]] = a[k + i]
    np.testing.assert_array_equal(out, exp)


def test_trailing_segments():
    """Row-range split: ti-aligned core + <=3-tile edge strips, exhaustive
    over every (ko, m) the n=65536 fused driver produces."""
    from mpf_tpu.ops.panel_fused import _trailing_segments

    for n in (65536, 32768, 33792, 9216):
        for ko in range(1024, n, 1024):
            m = n - ko
            segs = _trailing_segments(ko, m, 4096)
            # exact cover of [ko, n), in order
            at = ko
            for r0, mr, ti in segs:
                assert r0 == at and mr > 0 and r0 % ti == 0 and mr % ti == 0
                at = r0 + mr
            assert at == n
            # edge strips hold at most 3 tiles; at most one core segment
            cores = [s for s in segs if s[2] == 4096]
            assert len(cores) <= 1
            for r0, mr, ti in segs:
                if ti == 1024 and cores:
                    assert mr <= 3 * 1024
            # whenever >=2 aligned tiles fit, the core exists (the win)
            if m >= 2 * 4096 + 4096:
                assert cores, (ko, m)


def test_trailing_gemm_sub_segmented():
    """ko=1024 with _ti=2048 at n=5120 exercises all three segment kinds:
    leading edge strip, aligned core, trailing edge strip."""
    from mpf_tpu.ops.panel_fused import trailing_gemm_sub, _trailing_segments

    assert len(_trailing_segments(1024, 4096, 2048)) == 3
    rng = np.random.default_rng(11)
    n, ko, r = 5120, 1024, 64
    m = n - ko
    a = rng.standard_normal((n, n)).astype(np.float32)
    l21 = rng.standard_normal((m, r)).astype(np.float32)
    u12 = rng.standard_normal((r, m)).astype(np.float32)
    out = np.asarray(trailing_gemm_sub(
        jnp.asarray(a), jnp.asarray(l21), jnp.asarray(u12), ko,
        interpret=True, _ti=2048,
    ))
    exp = a.copy()
    exp[ko:, ko:] = a[ko:, ko:] - l21 @ u12
    np.testing.assert_allclose(out, exp, rtol=2e-4, atol=2e-3)
    np.testing.assert_array_equal(out[:ko, :], a[:ko, :])
    np.testing.assert_array_equal(out[:, :ko], a[:, :ko])


def test_panel_apply_update_trim_matches_full():
    """The column-trimmed variant must agree with the full-slab kernel on
    every column at/right of the panel, and leave left columns untouched."""
    rng = np.random.default_rng(5)
    m, bc, r = 256, 128, 8
    for j0, jj0 in ((16, 16), (0, 0), (40, 40), (120, 120)):
        slab = rng.standard_normal((m, bc)).astype(np.float32)
        pos = jnp.asarray(rng.permutation(m).astype(np.int32))
        rowblock = rng.standard_normal((r, bc)).astype(np.float32)
        uinv = np.triu(rng.standard_normal((r, r))).astype(np.float32)
        full = np.asarray(panel_apply_update(
            jnp.asarray(slab), pos, jnp.asarray(rowblock), jnp.asarray(uinv),
            j0, jj0, rb=128, interpret=True,
        ))
        trim = np.asarray(panel_apply_update_trim(
            jnp.asarray(slab), pos, jnp.asarray(rowblock), jnp.asarray(uinv),
            j0, jj0, rb=128, interpret=True,
        ))
        # fp32 roundoff only: XLA CPU orders the rank-8 FMA chains
        # differently for (rb, bc)- vs (rb, r)-wide outputs (~1 ulp)
        np.testing.assert_allclose(
            trim[:, jj0:], full[:, jj0:], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(trim[:, :jj0], slab[:, :jj0])


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_panel_apply_update_trim_split_multiblock(dtype):
    """The round-3 split (L21 pass + wide-column update pass) must match the
    full-slab kernel when the update pass spans MULTIPLE cw-wide column
    blocks (bc=1024 -> cw=512, ncol=2) and when the first block straddles
    the panel's right edge (glo > 0); frozen rows (pos < j0 + r) must pass
    through bit-exactly, update or no update."""
    rng = np.random.default_rng(9)
    m, bc, r = 128, 1024, 8
    for j0, jj0 in ((0, 0), (24, 24), (520, 520)):
        slab = rng.standard_normal((m, bc)).astype(dtype)
        pos = jnp.asarray(rng.permutation(m).astype(np.int32))
        rowblock = rng.standard_normal((r, bc)).astype(dtype)
        uinv = jnp.asarray(np.triu(rng.standard_normal((r, r))).astype(dtype))
        full = np.asarray(panel_apply_update(
            jnp.asarray(slab), pos, jnp.asarray(rowblock), uinv,
            j0, jj0, rb=128, interpret=True,
        ).astype(jnp.float32))
        trim = np.asarray(panel_apply_update_trim(
            jnp.asarray(slab), pos, jnp.asarray(rowblock), uinv,
            j0, jj0, rb=128, interpret=True,
        ).astype(jnp.float32))
        tol = 1e-5 if dtype == np.float32 else 3e-2
        np.testing.assert_allclose(
            trim[:, jj0:], full[:, jj0:], rtol=tol, atol=tol
        )
        np.testing.assert_array_equal(trim[:, :jj0],
                                      np.asarray(slab[:, :jj0], np.float32))
        frozen = np.asarray(pos) < j0 + r
        np.testing.assert_array_equal(
            trim[frozen][:, jj0 + r:],
            np.asarray(slab, np.float32)[frozen][:, jj0 + r:],
        )


@pytest.mark.parametrize(
    "policy,tol", [(MPF_BF16, 1e-3), (ALL_BF16, 5e-2)]
)
def test_fused_driver_oracle(policy, tol, monkeypatch):
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)  # exercise tail windows
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    n, r, block = 384, 8, 128
    a = matgen.hpl_ai_matrix(n, seed=1).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        res = jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(
                jnp.asarray(a, dtype=policy.working), r=r, policy=policy,
                block=block,
            ),
        )
    rep = check_factorization(a.astype(np.float64), res.lu, res.ipiv, nbe_tol=tol)
    assert rep.ok, rep
    # composed perm consistent with ipiv-applied sequential swaps
    perm = res.perm
    assert np.array_equal(np.sort(perm), np.arange(n))


def test_fused_driver_matches_jnp_path(monkeypatch):
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    n, r, block = 256, 8, 128
    a = matgen.hpl_ai_matrix(n, seed=0).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        res = jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(jnp.asarray(a), r=r, policy=MPF_BF16, block=block),
        )
    with cfg.force_jnp_kernels():
        res0 = jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(jnp.asarray(a), r=r, policy=MPF_BF16, block=block),
        )
    # identical pivots on this well-separated matrix; LU equal to roundoff
    np.testing.assert_array_equal(res.ipiv, res0.ipiv)
    np.testing.assert_array_equal(res.perm, res0.perm)
    d = np.abs(res.lu - res0.lu).max()
    assert d <= 1e-5 * np.abs(res0.lu).max(), d


def test_pad_wrapper_nonaligned_n(monkeypatch):
    """Non-aligned n stays on the fused path via identity-extension padding
    (VERDICT r2 missing #1; reference parity `MPF.cu:100-104`): the padded
    factorization sliced back must pass the oracle and leave ipiv/perm
    entirely within [0, n)."""
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(M, "_PAD_ALIGN", 256)
    monkeypatch.setattr(M, "_PAD_MIN_N", 256)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    n, r, block = 330, 8, 128  # pads to 512
    assert M._pad_target(n, r, MPF_BF16, True, None) == 512
    a = matgen.hpl_ai_matrix(n, seed=3).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        res = jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(jnp.asarray(a), r=r, policy=MPF_BF16,
                                   block=block),
        )
    assert res.lu.shape == (n, n)
    assert res.ipiv.shape == (n,)
    assert np.all((res.ipiv >= 1) & (res.ipiv <= n)), res.ipiv
    assert np.array_equal(np.sort(res.perm), np.arange(n))
    rep = check_factorization(a.astype(np.float64), res.lu, res.ipiv,
                              nbe_tol=1e-3)
    assert rep.ok, rep


def test_pad_target_gates(monkeypatch):
    """Aligned, small, and gate-failing sizes must not pad."""
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    assert M._pad_target(1000, 128, MPF_BF16, True, None) == 0   # < min
    assert M._pad_target(32768, 128, MPF_BF16, True, None) == 0  # aligned
    assert M._pad_target(33280, 128, MPF_BF16, True, None) == 0  # 512-aligned
    assert M._pad_target(4608, 128, MPF_BF16, True, None) == 0   # 512-aligned
    assert M._pad_target(32769, 128, MPF_BF16, True, None) == 33792
    assert M._pad_target(5000, 128, MPF_BF16, True, None) == 5120
    # explicit panel kernel or no-pivot: wrapper stays out of the way
    assert M._pad_target(32769, 128, MPF_BF16, False, None) == 0
    assert M._pad_target(32769, 128, MPF_BF16, True, panel_pivots_perm) == 0
    monkeypatch.setattr(cfg, "_USE_PALLAS", "0")
    assert M._pad_target(32769, 128, MPF_BF16, True, None) == 0


def test_trailing_gemm_sub_ncols_wide_kk():
    """Rectangular (ncols < m) updates and wide contraction dims (kk > 1024,
    the superblock far update, which selects the t=512 column tiling for
    fp32 working dtypes): == a[ko:, ko:ko+ncols] - l21 @ u12, untouched
    elsewhere."""
    from mpf_tpu.ops.panel_fused import trailing_gemm_sub

    rng = np.random.default_rng(11)
    n, ko = 4096, 2048
    m = n - ko
    for kk, ncols, dt, tol in (
        (2048, 1024, np.float32, 2e-3),   # wide-kk far update, narrow cols
        (2048, 2048, jnp.bfloat16, 2e-1), # wide-kk, bf16 working
        (64, 1024, np.float32, 2e-4),     # narrow mid update, classic kk
    ):
        a = rng.standard_normal((n, n)).astype(np.float32)
        l21 = rng.standard_normal((m, kk)).astype(np.float32) / np.sqrt(kk)
        u12 = rng.standard_normal((kk, ncols)).astype(np.float32)
        out = np.asarray(trailing_gemm_sub(
            jnp.asarray(a, dt), jnp.asarray(l21, dt), jnp.asarray(u12, dt),
            ko, interpret=True, ncols=ncols,
        ), np.float32)
        ad = np.asarray(jnp.asarray(a, dt), np.float32)
        exp = ad.copy()
        exp[ko:, ko:ko + ncols] = ad[ko:, ko:ko + ncols] - (
            np.asarray(jnp.asarray(l21, dt), np.float32)
            @ np.asarray(jnp.asarray(u12, dt), np.float32)
        )
        np.testing.assert_allclose(out, exp, rtol=tol, atol=tol * 8)
        np.testing.assert_array_equal(out[:ko, :], ad[:ko, :])
        np.testing.assert_array_equal(out[:, :ko], ad[:, :ko])
        np.testing.assert_array_equal(
            out[:, ko + ncols:], ad[:, ko + ncols:])


@pytest.mark.parametrize("pdt", [jnp.bfloat16, jnp.float32])
def test_strip_pivots_v2_bitexact(pdt, monkeypatch):
    """MPF_A1_V2 (S-major strip body + one-hot MXU winner-row extraction,
    round 4) must be BIT-identical to the v1 C-major body: identical
    pivots, position maps, and glist on a pivot-heavy panel."""
    from mpf_tpu.ops.panel_strip import strip_panel_pivots

    rng = np.random.default_rng(42)
    m, bc, r = 1024, 128, 32  # m % 1024 == 0 -> group-major kernel
    slab = jnp.asarray(rng.standard_normal((m, bc)), jnp.float32)
    pos0 = jnp.arange(m, dtype=jnp.int32)
    outs = {}
    for v2 in ("0", "1"):
        monkeypatch.setenv("MPF_A1_V2", v2)
        outs[v2] = jax.tree.map(
            np.asarray,
            strip_panel_pivots(slab, 0, pos0, panel_dtype=pdt, jj0=32, r=r,
                               interpret=True),
        )
    for a, b in zip(outs["0"], outs["1"]):
        np.testing.assert_array_equal(a, b)
    # and v2 vs the jnp reference semantics through the same entry used by
    # the exact-match test: pivots must be a valid permutation prefix
    piv = outs["1"][0]
    assert (piv >= 32).all() and len(set(piv.tolist())) == r


def test_strip_pivots_defer_full_bitexact(monkeypatch):
    """MPF_A1_DEFER=full (one full-panel masked rank-W update per strip,
    round 4) must be BIT-identical to the per-chunk tail loop: the update
    arithmetic is row-independent and frozen rows get an exact no-op."""
    from mpf_tpu.ops.panel_strip import strip_panel_pivots

    rng = np.random.default_rng(7)
    m, bc, r = 1024, 128, 64  # m % 1024 == 0 -> group-major kernel
    slab = jnp.asarray(rng.standard_normal((m, bc)), jnp.float32)
    pos0 = jnp.arange(m, dtype=jnp.int32)
    outs = {}
    for mode in ("chunk", "full"):
        monkeypatch.setenv("MPF_A1_DEFER", mode)
        outs[mode] = jax.tree.map(
            np.asarray,
            strip_panel_pivots(slab, 0, pos0, panel_dtype=jnp.bfloat16,
                               jj0=0, r=r, interpret=True),
        )
    for a, b in zip(outs["chunk"], outs["full"]):
        np.testing.assert_array_equal(a, b)
