"""Lazy left swaps (round 4, driver level): the fused path's physical row
exchange covers only the column suffix right of the current width quantum;
skipped swaps over factored L columns are applied once per sealed column
segment at the end.  Results must be BIT-IDENTICAL to eager full-width
exchanges (only where/when rows physically move changes, never values)."""

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


def _run(a, pol, r, block, monkeypatch, lazy, qw):
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    monkeypatch.setenv("MPF_LAZY", "1" if lazy else "0")
    monkeypatch.setenv("MPF_QW", str(qw))
    with pltpu.force_tpu_interpret_mode():
        return jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(
                jnp.asarray(a, dtype=pol.working), r=r, policy=pol,
                block=block,
            ),
        )


@pytest.mark.parametrize(
    "matname,gen,pol,tol",
    [
        ("uniform", matgen.random_dense, MPF_BF16, 1e-3),
        ("hpl", matgen.hpl_ai_matrix, MPF_BF16, 1e-3),
        ("uniform", matgen.random_dense, ALL_BF16, 5e-2),
    ],
)
@pytest.mark.parametrize("qw", [128, 256])
def test_lazy_matches_eager_bitexact(matname, gen, pol, tol, qw, monkeypatch):
    n, r, block = 512, 8, 128
    a = gen(n, seed=2).astype(np.float32)
    lz = _run(a, pol, r, block, monkeypatch, lazy=True, qw=qw)
    eg = _run(a, pol, r, block, monkeypatch, lazy=False, qw=qw)
    np.testing.assert_array_equal(lz.ipiv, eg.ipiv)
    np.testing.assert_array_equal(lz.perm, eg.perm)
    np.testing.assert_array_equal(
        np.asarray(lz.lu, np.float32), np.asarray(eg.lu, np.float32)
    )
    rep = check_factorization(a.astype(np.float64), lz.lu, lz.ipiv,
                              nbe_tol=tol)
    assert rep.ok, str(rep)


def test_lazy_gate_requires_all_fused(monkeypatch):
    """A width quantum >= n (single segment) must disable lazy silently."""
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    monkeypatch.setenv("MPF_QW", "4096")  # >= n -> plain full-width path
    a = matgen.random_dense(256, seed=4).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        res = jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(
                jnp.asarray(a), r=8, policy=MPF_BF16, block=128
            ),
        )
    rep = check_factorization(a.astype(np.float64), res.lu, res.ipiv,
                              nbe_tol=1e-3)
    assert rep.ok, str(rep)


def test_lazy_with_pad_wrapper(monkeypatch):
    """Lazy left swaps inside the identity-extension pad path (non-aligned
    n): oracle-correct and bit-identical to the eager padded run."""
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(M, "_PAD_ALIGN", 256)
    monkeypatch.setattr(M, "_PAD_MIN_N", 256)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    monkeypatch.setenv("MPF_QW", "128")
    n, r, block = 330, 8, 128  # pads to 512
    a = matgen.random_dense(n, seed=7).astype(np.float32)

    def run(lazy):
        monkeypatch.setenv("MPF_LAZY", "1" if lazy else "0")
        with pltpu.force_tpu_interpret_mode():
            return jax.tree.map(
                np.asarray,
                M.mpf_factorize_traced(jnp.asarray(a), r=r, policy=MPF_BF16,
                                       block=block),
            )

    lz = run(True)
    eg = run(False)
    np.testing.assert_array_equal(lz.ipiv, eg.ipiv)
    np.testing.assert_array_equal(
        np.asarray(lz.lu, np.float32), np.asarray(eg.lu, np.float32)
    )
    rep = check_factorization(a.astype(np.float64), lz.lu, lz.ipiv,
                              nbe_tol=1e-3)
    assert rep.ok, str(rep)
