"""One-deep lookahead driver (round 4, `models/mpf.py:_lookahead_factorize`):
the trailing update of block column k is split narrow/wide and the NEXT
block column's physical row exchange rides inside the wide trailing GEMM
(`ops/gemmx.py`).  Pivot decisions and the composed row map must be
IDENTICAL to the classic serial order (reference `MPF.cu:100-240`); LU
values may differ only by the fused kernel's per-tile fp32 accumulation
order, and the factorization must stay oracle-correct."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas.tpu as pltpu
import pytest

import mpf_tpu.config as cfg
import mpf_tpu.models.mpf as M
from mpf_tpu.precision import ALL_BF16, MPF_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization

pytestmark = pytest.mark.slow  # interpret-mode Pallas throughout


def _run(a, pol, r, block, monkeypatch, looka):
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    monkeypatch.setenv("MPF_FORCE_KERNELS", "1")
    monkeypatch.setenv("MPF_LOOKAHEAD", "1" if looka else "0")
    with pltpu.force_tpu_interpret_mode():
        return jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(
                jnp.asarray(a, dtype=pol.working), r=r, policy=pol,
                block=block,
            ),
        )


@pytest.mark.parametrize(
    "gen,pol,tol",
    [
        (matgen.random_dense, MPF_BF16, 1e-3),
        (matgen.hpl_ai_matrix, MPF_BF16, 1e-3),
        (matgen.random_dense, ALL_BF16, 5e-2),
    ],
)
def test_lookahead_matches_serial(gen, pol, tol, monkeypatch):
    n, r, block = 384, 32, 128
    a = gen(n, seed=3).astype(np.float32)
    la = _run(a, pol, r, block, monkeypatch, looka=True)
    eg = _run(a, pol, r, block, monkeypatch, looka=False)
    # pivot decisions are made on bit-identical panel values (the narrow
    # update is the same dot restricted to the next block column)
    np.testing.assert_array_equal(la.ipiv, eg.ipiv)
    np.testing.assert_array_equal(la.perm, eg.perm)
    lu_l = np.asarray(la.lu, np.float32)
    lu_e = np.asarray(eg.lu, np.float32)
    scale = np.abs(lu_e).max()
    assert np.abs(lu_l - lu_e).max() <= tol * scale
    rep = check_factorization(a.astype(np.float64), la.lu, la.ipiv,
                              nbe_tol=tol)
    assert rep.ok, str(rep)


def test_lookahead_gate_needs_two_block_columns(monkeypatch):
    """n < 2*block: the gate must fall back to the classic loop (results
    bit-identical to MPF_LOOKAHEAD=0)."""
    n, r, block = 256, 32, 256
    a = matgen.random_dense(n, seed=5).astype(np.float32)
    la = _run(a, MPF_BF16, r, block, monkeypatch, looka=True)
    eg = _run(a, MPF_BF16, r, block, monkeypatch, looka=False)
    np.testing.assert_array_equal(la.ipiv, eg.ipiv)
    np.testing.assert_array_equal(
        np.asarray(la.lu, np.float32), np.asarray(eg.lu, np.float32)
    )


def test_lookahead_with_pad_wrapper(monkeypatch):
    """Non-aligned n through the identity-extension wrapper, lookahead on:
    the padded factorization runs the pipelined loop and slices back."""
    n, r, block = 330, 32, 128
    monkeypatch.setattr(M, "_PAD_ALIGN", 128)
    monkeypatch.setattr(M, "_PAD_MIN_N", 256)
    a = matgen.random_dense(n, seed=7).astype(np.float32)
    la = _run(a, MPF_BF16, r, block, monkeypatch, looka=True)
    assert la.lu.shape == (n, n)
    rep = check_factorization(a.astype(np.float64), la.lu, la.ipiv,
                              nbe_tol=1e-3)
    assert rep.ok, str(rep)
