"""Deferred-overflow exchange driver (round 5, `models/mpf.py:
_deferred_factorize`): grouped block columns append far-destination
displaced rows to a contiguous overflow region and flush them home in ONE
window sweep per group.  Must be BIT-identical to the classic eager driver
(pivots, composed perm, and factors — the deferral is pure data movement;
the strip kernel sees overflow rows at their virtual positions and dead
rows carry the search-excluded sentinel)."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas.tpu as pltpu
import pytest

import mpf_tpu.config as cfg
import mpf_tpu.models.mpf as M
from mpf_tpu.precision import MPF_BF16, ALL_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization

pytestmark = pytest.mark.slow  # interpret-mode Pallas throughout


def _run(a, monkeypatch, defer, policy=MPF_BF16, block=128, r=32):
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    monkeypatch.setenv("MPF_FORCE_KERNELS", "1")
    with pltpu.force_tpu_interpret_mode():
        return jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(
                jnp.asarray(a, np.float32), r=r, policy=policy, block=block,
                defer=defer,
            ),
        )


def _assert_same(d, e, bf16_working=False):
    """Pivots/perm/info must be EXACT.  Factors are bit-exact too, except
    under bf16 WORKING precision on the CPU test backend: XLA CPU's bf16
    GEMM rounds per-element results differently depending on the M
    dimension (verified: 1001/8192 elements differ between a 512-row and a
    256-row dot of IDENTICAL rows), and the deferred driver's taller
    (m + overflow) slabs pick different B-kernel row-block heights.  On
    chip the Mosaic MXU is shape-stable — the n=4096 defer-vs-eager chip
    validation is bit-exact on ipiv, perm, AND lu (both policies,
    tools/tpu_defer_r5.py val) — so the CPU tier bounds the artifact
    tightly instead: <=0.1% of elements, each within 2 bf16 ulp."""
    np.testing.assert_array_equal(d.ipiv, e.ipiv)
    np.testing.assert_array_equal(d.perm, e.perm)
    np.testing.assert_array_equal(d.info, e.info)
    lu_d = np.asarray(d.lu, np.float32)
    lu_e = np.asarray(e.lu, np.float32)
    if not bf16_working:
        np.testing.assert_array_equal(lu_d, lu_e)
        return
    bad = lu_d != lu_e
    assert bad.mean() <= 1e-3, f"{bad.sum()} factor elements differ"
    np.testing.assert_allclose(lu_d, lu_e, rtol=2 * 2.0**-7, atol=1e-30)


@pytest.mark.parametrize("policy", [MPF_BF16, ALL_BF16])
def test_defer_bitexact_vs_eager_uniform(policy, monkeypatch):
    """Pivot-heavy corpus: nearly every band row defers.  S=2 over 4 block
    columns -> two groups, real cross-column deferral + two flushes."""
    n = 512
    a = matgen.random_dense(n, seed=3).astype(np.float32)
    d = _run(a, monkeypatch, defer=2, policy=policy)
    e = _run(a, monkeypatch, defer=False, policy=policy)
    _assert_same(d, e, bf16_working=policy is ALL_BF16)
    rep = check_factorization(a.astype(np.float64), d.lu, d.ipiv,
                              nbe_tol=1e-2)
    assert rep.ok, str(rep)


def test_defer_bitexact_diag_dominant(monkeypatch):
    """Diagonally dominant input: pivots rarely move -> empty/near-empty
    overflow groups and flushes (the hpl-corpus shape)."""
    n = 512
    rng = np.random.default_rng(7)
    a = rng.standard_normal((n, n)).astype(np.float32) + np.eye(n) * n
    d = _run(a, monkeypatch, defer=2)
    e = _run(a, monkeypatch, defer=False)
    _assert_same(d, e)


def test_defer_group_covers_all_is_degenerate(monkeypatch):
    """S >= number of block columns: gend == n for the single group, so
    nothing ever defers — must still match exactly (fully eager inside the
    deferred loop)."""
    n = 384
    a = matgen.random_dense(n, seed=11).astype(np.float32)
    d = _run(a, monkeypatch, defer=4, policy=MPF_BF16)
    e = _run(a, monkeypatch, defer=False, policy=MPF_BF16)
    _assert_same(d, e)


def test_defer_pre_extended_input(monkeypatch):
    """Rectangular (n + S*block, n) input (pre-allocated overflow region,
    don't-care bottom rows): identical results to the square entry, and the
    zero-copy path the 64k bench uses (square + in-trace extension keeps
    matrix AND extension alive side by side at the HBM edge)."""
    n, block, S = 512, 128, 2
    a = matgen.random_dense(n, seed=13).astype(np.float32)
    a_ext = np.concatenate(
        [a, np.full((S * block, n), 7.25, np.float32)], axis=0
    )
    d = _run(a_ext, monkeypatch, defer=S, policy=MPF_BF16, block=block)
    e = _run(a, monkeypatch, defer=S, policy=MPF_BF16, block=block)
    _assert_same(d, e)
    assert d.lu.shape == (n, n)


def test_defer_s1_every_column_flushes(monkeypatch):
    """S=1: each column's far dests defer and flush immediately — the
    maximal-flush-count edge of the group logic."""
    n = 512
    a = matgen.random_dense(n, seed=5).astype(np.float32)
    d = _run(a, monkeypatch, defer=1, policy=ALL_BF16)
    e = _run(a, monkeypatch, defer=False, policy=ALL_BF16)
    _assert_same(d, e, bf16_working=True)
