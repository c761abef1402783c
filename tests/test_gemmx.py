"""Fused trailing-GEMM + row-exchange kernel (`ops/gemmx.py`, round 4).

The fused kernel must equal the composition of the plain manual-DMA GEMM
(same tile schedule) with the round-3 combined one-sweep exchange
(`ops/exchange.py:rows_exchange`) BIT-exactly: identical dots, identical
staging round trips — only the interleaving differs.  Reference semantics:
trailing update `MPF.cu:230-239` followed by LASWP `MPF.cu:42-59` of the
NEXT block column (one-deep lookahead).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpf_tpu.ops.exchange import rows_exchange
from mpf_tpu.ops.gemmx import gemm_trailing

pytestmark = pytest.mark.slow  # interpret-mode Pallas throughout


def _rand_band_perm(rng, n, k, bc):
    """(glist, dests) of a composed exchange map: sequential swaps
    band row i <-> row >= k+i (chains bottom in the band)."""
    perm = np.arange(k, n)
    for i in range(bc):
        j = rng.integers(i, n - k)
        perm[[i, j]] = perm[[j, i]]
    glist = perm[:bc].copy()
    inv = np.empty(n - k, dtype=np.int64)
    inv[perm - k] = np.arange(n - k)
    dests = inv[:bc] + k
    return jnp.asarray(glist, jnp.int32), jnp.asarray(dests, jnp.int32)


@pytest.mark.parametrize("dt,gd", [(jnp.float32, jnp.float32),
                                   (jnp.float32, jnp.bfloat16),
                                   (jnp.bfloat16, jnp.bfloat16)])
def test_plain_gemm_matches_jnp(rng, dt, gd):
    n, r0, c0, kk = 512, 128, 256, 128
    m, w = n - r0, n - c0
    a = jnp.asarray(rng.standard_normal((n, n)), dt)
    l21 = jnp.asarray(rng.standard_normal((m, kk)), gd)
    u12 = jnp.asarray(rng.standard_normal((kk, w)), gd)
    out = gemm_trailing(a, l21, u12, r0, c0, interpret=True, ti=128, t=128)
    upd = (a[r0:, c0:].astype(jnp.float32)
           - l21.astype(jnp.float32) @ u12.astype(jnp.float32)).astype(dt)
    ref = a.at[r0:, c0:].set(upd)
    err = np.abs(np.array(out, np.float32) - np.array(ref, np.float32))
    assert err[:r0, :].max() == 0 and err[:, :c0].max() == 0
    # per-element: fp32 products, per-tile kk-accumulation vs one big dot
    # (reorder ~1e-5 rel) + one final-dtype ULP
    scale = np.abs(np.array(ref, np.float32)).max()
    tol = scale * (2 ** -7 if dt == jnp.bfloat16 else 2e-6)
    assert err.max() <= tol, err.max()


@pytest.mark.parametrize("dt,gd,bc", [
    (jnp.float32, jnp.float32, 64),
    (jnp.bfloat16, jnp.bfloat16, 64),
    (jnp.float32, jnp.bfloat16, 32),
    (jnp.bfloat16, jnp.bfloat16, 48),
])
def test_fused_exchange_bitexact_vs_composition(rng, dt, gd, bc):
    n, kk = 512, 128
    k = 128
    r0, c0 = k, k + 128
    m, w = n - r0, n - c0
    a = jnp.asarray(rng.standard_normal((n, n)), dt)
    l21 = jnp.asarray(rng.standard_normal((m, kk)), gd)
    u12 = jnp.asarray(rng.standard_normal((kk, w)), gd)
    glist, dests = _rand_band_perm(rng, n, k, bc)

    ag = gemm_trailing(a, l21, u12, r0, c0, interpret=True, ti=128, t=128)
    ref_a, ref_piv = rows_exchange(ag, k, glist, dests, interpret=True)
    out_a, out_piv = gemm_trailing(
        a, l21, u12, r0, c0, xargs=(k, glist, dests),
        interpret=True, ti=128, t=128,
    )
    oa, ra = np.array(out_a), np.array(ref_a)
    ra[k:k + bc] = oa[k:k + bc]  # band covered by caller DUS
    assert (oa == ra).all()
    assert (np.array(out_piv) == np.array(ref_piv)).all()


def test_fused_identity_permutation(rng):
    """No rows move: phase 2 is empty (n2 == 0); output == plain GEMM with
    pivrows = the band itself."""
    n, kk, k, bc = 384, 128, 128, 32
    r0, c0 = k, k + 128
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    l21 = jnp.asarray(rng.standard_normal((n - r0, kk)), jnp.float32)
    u12 = jnp.asarray(rng.standard_normal((kk, n - c0)), jnp.float32)
    glist = jnp.arange(k, k + bc, dtype=jnp.int32)
    dests = jnp.arange(k, k + bc, dtype=jnp.int32)
    plain = gemm_trailing(a, l21, u12, r0, c0, interpret=True, ti=128, t=128)
    out_a, out_piv = gemm_trailing(
        a, l21, u12, r0, c0, xargs=(k, glist, dests),
        interpret=True, ti=128, t=128,
    )
    assert (np.array(out_a) == np.array(plain)).all()
    assert (np.array(out_piv) == np.array(plain)[k:k + bc]).all()


def test_fused_full_reversal(rng):
    """Every band row moves out and every pivot comes from out-of-band
    (maximum phase-2 activity, staged stream fully used)."""
    n, kk, k, bc = 512, 128, 128, 64
    r0, c0 = k, k + 128
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    l21 = jnp.asarray(rng.standard_normal((n - r0, kk)), jnp.float32)
    u12 = jnp.asarray(rng.standard_normal((kk, n - c0)), jnp.float32)
    glist = jnp.asarray(n - 1 - np.arange(bc), jnp.int32)   # from the bottom
    dests = jnp.asarray(n - 1 - np.arange(bc), jnp.int32)   # band goes there
    ag = gemm_trailing(a, l21, u12, r0, c0, interpret=True, ti=128, t=128)
    ref_a, ref_piv = rows_exchange(ag, k, glist, dests, interpret=True)
    out_a, out_piv = gemm_trailing(
        a, l21, u12, r0, c0, xargs=(k, glist, dests),
        interpret=True, ti=128, t=128,
    )
    oa, ra = np.array(out_a), np.array(ref_a)
    ra[k:k + bc] = oa[k:k + bc]
    assert (oa == ra).all()
    assert (np.array(out_piv) == np.array(ref_piv)).all()


@pytest.mark.parametrize("dt,c0,bc", [(jnp.float32, 256, 64),
                                      (jnp.bfloat16, 384, 48)])
def test_fused_exchange_pair_major(rng, dt, c0, bc):
    """Even strip count takes the pair-major schedule (round 4: strip PAIRS
    share one u12 tile pass) — must stay bit-exact vs the composition."""
    n, kk, k = 512, 128, 256
    r0 = k
    m, w = n - r0, n - c0  # m/ti = 2 strips -> pair path
    a = jnp.asarray(rng.standard_normal((n, n)), dt)
    l21 = jnp.asarray(rng.standard_normal((m, kk)), dt)
    u12 = jnp.asarray(rng.standard_normal((kk, w)), dt)
    glist, dests = _rand_band_perm(rng, n, k, bc)
    ag = gemm_trailing(a, l21, u12, r0, c0, interpret=True, ti=128, t=128)
    ref_a, ref_piv = rows_exchange(ag, k, glist, dests, interpret=True)
    out_a, out_piv = gemm_trailing(
        a, l21, u12, r0, c0, xargs=(k, glist, dests),
        interpret=True, ti=128, t=128,
    )
    oa, ra = np.array(out_a), np.array(ref_a)
    ra[k:k + bc] = oa[k:k + bc]
    assert (oa == ra).all()
    assert (np.array(out_piv) == np.array(ref_piv)).all()
