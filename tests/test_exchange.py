"""Combined one-sweep exchange kernel (`ops/exchange.py`) — interpret-mode
parity vs (a) the ground-truth permutation and (b) the round-2 two-kernel
composition [rows_gather -> rows_scatter_from_band -> band DUS]."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpf_tpu.ops.exchange import rows_exchange
from mpf_tpu.ops.panel_fused import rows_gather, rows_scatter_from_band


def _swap_scenario(rng, n, k, nr, mode):
    """Sequential partial-pivoting swaps -> (glist, dests, final row map).

    ``mode``: 'uniform' picks each pivot anywhere below the diagonal
    (pivot-heavy, reference corpus semantics); 'diag' keeps most pivots on
    the diagonal (HPL-AI-like); 'inband' confines pivots to the band."""
    rows = np.arange(n)
    for j in range(nr):
        if mode == "uniform":
            p = rng.integers(k + j, n)
        elif mode == "inband":
            p = rng.integers(k + j, k + nr)
        else:
            p = k + j if rng.random() < 0.7 else rng.integers(k + j, n)
        rows[k + j], rows[p] = rows[p], rows[k + j]
    glist = rows[k:k + nr].copy()  # original row landing at band pos j
    dests = np.empty(nr, np.int64)  # final position of original band row i
    inv = np.empty(n, np.int64)
    inv[rows] = np.arange(n)
    dests = inv[k:k + nr].copy()
    return glist, dests, rows


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
@pytest.mark.parametrize("mode", ["uniform", "diag", "inband"])
@pytest.mark.parametrize("k", [0, 16])
def test_rows_exchange_matches_permutation(dtype, mode, k):
    rng = np.random.default_rng(hash((mode, k)) % 2**32)
    n, w, nr = 64, 128, 16
    a = rng.standard_normal((n, w)).astype(dtype)
    glist, dests, rows = _swap_scenario(rng, n, k, nr, mode)

    a2, piv = rows_exchange(
        jnp.asarray(a), k, jnp.asarray(glist), jnp.asarray(dests),
        interpret=True,
    )
    got = np.asarray(
        jax.lax.dynamic_update_slice(a2, piv, (k, 0)).astype(jnp.float32)
    )
    exp = np.asarray(a, np.float32)[rows]
    np.testing.assert_array_equal(got, exp)

    # and vs the two-kernel composition
    pivrows = rows_gather(jnp.asarray(a), jnp.asarray(glist), interpret=True)
    a3 = rows_scatter_from_band(
        jnp.asarray(a), k, jnp.asarray(dests), interpret=True
    )
    a3 = np.asarray(
        jax.lax.dynamic_update_slice(a3, pivrows, (k, 0)).astype(jnp.float32)
    )
    np.testing.assert_array_equal(got, a3)


def test_rows_exchange_identity():
    """No movement at all: a' == a and pivrows == band."""
    rng = np.random.default_rng(3)
    n, w, nr, k = 64, 128, 16, 8
    a = rng.standard_normal((n, w)).astype(np.float32)
    glist = np.arange(k, k + nr)
    dests = np.arange(k, k + nr)
    a2, piv = rows_exchange(
        jnp.asarray(a), k, jnp.asarray(glist), jnp.asarray(dests),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a2), a)
    np.testing.assert_array_equal(np.asarray(piv), a[k:k + nr])


def test_rows_exchange_randomized_stress():
    """Many random swap scenarios, both dtypes, boundary band placements
    (k = 0, middle, n - nr: last-window edge)."""
    n, w, nr = 128, 128, 32
    for seed in range(10):
        rng = np.random.default_rng(100 + seed)
        dtype = np.float32 if seed % 2 == 0 else jnp.bfloat16
        k = [0, 32, n - nr][seed % 3]
        mode = ["uniform", "diag"][seed % 2]
        a = rng.standard_normal((n, w)).astype(dtype)
        glist, dests, rows = _swap_scenario(rng, n, k, nr, mode)
        a2, piv = rows_exchange(
            jnp.asarray(a), k, jnp.asarray(glist), jnp.asarray(dests),
            interpret=True,
        )
        got = np.asarray(
            jax.lax.dynamic_update_slice(a2, piv, (k, 0)).astype(jnp.float32)
        )
        np.testing.assert_array_equal(
            got, np.asarray(a, np.float32)[rows], err_msg=f"seed {seed}"
        )


def test_rows_exchange_larger_band():
    """nr > one granule run, bf16 (g=16), pivot-heavy, odd window overlap:
    positions that are simultaneously source and destination."""
    rng = np.random.default_rng(11)
    n, w, nr, k = 256, 256, 64, 64
    a = rng.standard_normal((n, w)).astype(jnp.bfloat16)
    glist, dests, rows = _swap_scenario(rng, n, k, nr, "uniform")
    a2, piv = rows_exchange(
        jnp.asarray(a), k, jnp.asarray(glist), jnp.asarray(dests),
        interpret=True,
    )
    got = np.asarray(
        jax.lax.dynamic_update_slice(a2, piv, (k, 0)).astype(jnp.float32)
    )
    exp = np.asarray(a, np.float32)[rows]
    np.testing.assert_array_equal(got, exp)

@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
@pytest.mark.parametrize("frac", [0.0, 0.3, 1.0])
def test_flush_overflow(dtype, frac):
    """Deferred-exchange flush: a[dests[i]] = a[nov + i] for live slots
    (dead slots carry the 2**31-1 sentinel), at 0 / partial / full slot
    occupancy."""
    from mpf_tpu.ops.exchange import flush_overflow

    rng = np.random.default_rng(hash((str(dtype), frac)) % 2**32)
    n, w, ov = 192, 128, 64
    sent = 2**31 - 1
    a = rng.standard_normal((n + ov, w)).astype(dtype)
    nlive = int(round(frac * ov))
    dd = rng.choice(n, size=nlive, replace=False)
    dests = np.full(ov, sent, np.int64)
    dests[rng.choice(ov, size=nlive, replace=False)] = dd
    out = np.asarray(
        flush_overflow(jnp.asarray(a), n, jnp.asarray(dests, jnp.int32),
                       interpret=True).astype(jnp.float32)
    )
    exp = np.asarray(a, np.float32).copy()
    for i in range(ov):
        if dests[i] != sent:
            exp[dests[i]] = np.asarray(a[n + i], np.float32)
    np.testing.assert_array_equal(out[:n], exp[:n])


def test_copy_rows_block():
    from mpf_tpu.ops.exchange import copy_rows_block

    rng = np.random.default_rng(21)
    a = rng.standard_normal((256, 128)).astype(jnp.bfloat16)
    out = np.asarray(
        copy_rows_block(jnp.asarray(a), 32, 192, 64, interpret=True
                        ).astype(jnp.float32)
    )
    exp = np.asarray(a, np.float32).copy()
    exp[192:256] = exp[32:96]
    np.testing.assert_array_equal(out, exp)


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_rows_exchange_xsel_roll_bitexact(dtype, monkeypatch):
    """MPF_XSEL=roll (uniform sublane rotate row extraction, round 4) must
    be BIT-identical to the masked-sum default — a rotate moves values,
    never rounds."""
    rng = np.random.default_rng(99)
    n, w, nr, k = 96, 128, 16, 16
    a = rng.standard_normal((n, w)).astype(dtype)
    glist, dests, rows = _swap_scenario(rng, n, k, nr, "uniform")
    outs = {}
    for xsel in ("masked", "roll"):
        monkeypatch.setenv("MPF_XSEL", xsel)
        a2, piv = rows_exchange(
            jnp.asarray(a), k, jnp.asarray(glist), jnp.asarray(dests),
            interpret=True,
        )
        outs[xsel] = np.asarray(
            jax.lax.dynamic_update_slice(a2, piv, (k, 0)).astype(jnp.float32)
        )
    np.testing.assert_array_equal(outs["roll"], outs["masked"])
    np.testing.assert_array_equal(outs["roll"], np.asarray(a, np.float32)[rows])
