"""Pair-layout (natively-3D) driver parity vs the chip-proven 2D fused path
(round 5, `models/mpf._factorize_3d` + `ops/pair3d.py` + `rows_exchange3`).

The pair layout exists to cut the exchange's DMA window granule 16 -> 2
rows; every kernel is designed bit-exact vs its 2D counterpart (reshapes
and DMAs move bits, the dots run on identical values), so the whole driver
must reproduce the 2D factorization BITWISE in interpret mode."""

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

N = 384
BLOCK = 128
R = 32


def _patch(monkeypatch):
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    monkeypatch.setenv("MPF_FORCE_KERNELS", "1")


def _run(a, policy, pairs):
    av = jnp.asarray(a, jnp.float32)
    if pairs:
        av = av.reshape(N // 2, 2, N)
    with pltpu.force_tpu_interpret_mode():
        res = M.mpf_factorize_traced(av, r=R, policy=policy, block=BLOCK)
    out = jax.tree.map(np.asarray, res)
    lu = out.lu.reshape(N, N) if pairs else out.lu
    return out.ipiv, out.perm, lu, int(out.info)


@pytest.mark.parametrize("policy", [MPF_BF16, ALL_BF16],
                         ids=["mpf_bf16", "all_bf16"])
@pytest.mark.parametrize("corpus", ["uniform", "hpl"])
def test_pair3d_bitexact_vs_2d(monkeypatch, policy, corpus):
    _patch(monkeypatch)
    if policy is MPF_BF16:
        # fp32 working: the pair-layout U12 kernel has no Mosaic 3-pass
        # (HIGH) dot — parity holds with both paths pinned to HIGHEST
        monkeypatch.setenv("MPF_U12_PREC", "highest")
    if corpus == "uniform":
        a = matgen.random_dense(N, seed=5).astype(np.float32)
    else:
        a = matgen.hpl_ai_matrix(N, seed=5)
    ipiv2, perm2, lu2, info2 = _run(a, policy, pairs=False)
    ipiv3, perm3, lu3, info3 = _run(a, policy, pairs=True)
    np.testing.assert_array_equal(ipiv3, ipiv2)
    np.testing.assert_array_equal(perm3, perm2)
    np.testing.assert_array_equal(
        np.asarray(lu3, np.float32), np.asarray(lu2, np.float32)
    )
    assert info3 == info2
    rep = check_factorization(a.astype(np.float64), lu3, ipiv3, nbe_tol=1e-2)
    assert rep.ok, str(rep)


def test_pair_generators_match_2d():
    for gen in (matgen.hpl_ai_matrix_device, matgen.random_dense_device):
        a2 = np.asarray(gen(256, seed=3))
        a3 = np.asarray(gen(256, seed=3, pairs=True))
        np.testing.assert_array_equal(a3.reshape(256, 256), a2)


def test_pair3d_split_parts_bitexact(monkeypatch):
    """Multi-part driver (round 5 compile-helper wall): make_mpf's split
    wrapper — sequential jitted executables carrying state on-device —
    must be BITWISE identical to the single-executable 3D driver."""
    _patch(monkeypatch)
    a = matgen.random_dense(N, seed=7).astype(np.float32)
    ipiv1, perm1, lu1, info1 = _run(a, ALL_BF16, pairs=True)
    monkeypatch.setattr(M, "_PAIR3D_SPLIT_COLS", 1)  # every column its own jit
    assert len(M._pair3d_parts(N, R, ALL_BF16, BLOCK)) == N // BLOCK
    fac = M.make_mpf.__wrapped__(N, r=R, policy=ALL_BF16, block=BLOCK,
                                 donate=False)
    av = jnp.asarray(a, jnp.float32).reshape(N // 2, 2, N)
    with pltpu.force_tpu_interpret_mode():
        res = fac(av)
    out = jax.tree.map(np.asarray, res)
    np.testing.assert_array_equal(out.ipiv, ipiv1)
    np.testing.assert_array_equal(out.perm, perm1)
    np.testing.assert_array_equal(
        np.asarray(out.lu.reshape(N, N), np.float32), np.asarray(lu1))
    assert int(out.info) == info1


def test_pair3d_parts_ranges():
    # 64k/block=1024 -> two ranges split at the 32-column boundary
    parts = M._pair3d_parts(65536, 128, ALL_BF16, 1024)
    assert parts == [(0, 32768), (32768, None)]
    # small n -> single range, no wrapper
    assert M._pair3d_parts(4096, 128, ALL_BF16, 1024) == [(0, None)]
    # 32k bf16 (auto block 1024, 32 cols) stays single-executable
    assert M._pair3d_parts(32768, 128, ALL_BF16, None) == [(0, None)]


def test_pair3d_requires_fused_path(monkeypatch):
    _patch(monkeypatch)
    a = jnp.zeros((64, 2, 128), jnp.float32)
    with pytest.raises(ValueError, match="pair-layout"):
        with pltpu.force_tpu_interpret_mode():
            # r > block makes the fused gate fail
            M.mpf_factorize_traced(a, r=R, policy=MPF_BF16, block=BLOCK,
                                   pivot=False)


def test_pair3d_bad_shape(monkeypatch):
    _patch(monkeypatch)
    a = jnp.zeros((100, 2, 128), jnp.float32)
    with pytest.raises(ValueError, match="pair layout"):
        M.mpf_factorize_traced(a, r=R, policy=MPF_BF16, block=BLOCK)
