"""Distributed 2D block-cyclic LU on the 8-device virtual CPU mesh
(SURVEY.md section 4: multi-chip tests via host-platform device-count
emulation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpf_tpu import mpf_factorize, MPF_BF16, PURE_FP32
from mpf_tpu.parallel.mesh import make_mesh
from mpf_tpu.parallel.block_cyclic import to_block_cyclic, from_block_cyclic
from mpf_tpu.parallel.dist_lu import dist_factorize
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization


def test_block_cyclic_roundtrip():
    n, b, p, q = 48, 4, 2, 4
    a = jnp.asarray(np.arange(n * n, dtype=np.float32).reshape(n, n))
    t = to_block_cyclic(a, p, q, b)
    assert t.shape == (p, q, (n // b // p) * b, (n // b // q) * b)
    back = from_block_cyclic(t, n, b)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (1, 8), (2, 2)])
def test_dist_matches_single_chip_fp32(shape):
    ndev = shape[0] * shape[1]
    mesh = make_mesh(shape, devices=jax.devices()[:ndev])
    n, b = 64, 8
    a = matgen.random_dense(n, seed=11)
    res_d = dist_factorize(jnp.asarray(a), mesh, b=b, policy=PURE_FP32)
    res_s = mpf_factorize(jnp.asarray(a), r=b, policy=PURE_FP32)
    assert int(res_d.info) == 0
    np.testing.assert_array_equal(np.asarray(res_d.ipiv), np.asarray(res_s.ipiv))
    np.testing.assert_allclose(
        np.asarray(res_d.lu), np.asarray(res_s.lu), rtol=2e-4, atol=2e-4
    )


def test_dist_oracle_bf16():
    mesh = make_mesh((2, 4))
    n, b = 96, 8
    a = matgen.random_dense(n, seed=21)
    res = dist_factorize(jnp.asarray(a), mesh, b=b, policy=MPF_BF16)
    rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=5e-4)
    assert rep.ok, str(rep)


def test_dist_no_pivot():
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    n, b = 32, 4
    rng = np.random.default_rng(0)
    a = rng.random((n, n)).astype(np.float32) + n * np.eye(n, dtype=np.float32)
    res = dist_factorize(jnp.asarray(a), mesh, b=b, policy=PURE_FP32, pivot=False)
    np.testing.assert_array_equal(np.asarray(res.ipiv), np.arange(1, n + 1))
    rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=1e-5)
    assert rep.ok, str(rep)


@pytest.mark.slow
def test_dist_oracle_b128():
    """Production panel width (b=128, VERDICT round-2 item 4) on the
    8-device mesh."""
    mesh = make_mesh((2, 4))
    n, b = 1024, 128
    a = matgen.hpl_ai_matrix(n, seed=5)
    res = dist_factorize(jnp.asarray(a), mesh, b=b, policy=MPF_BF16)
    assert int(res.info) == 0
    rep = check_factorization(
        a.astype(np.float64), np.asarray(res.lu), np.asarray(res.ipiv),
        nbe_tol=1e-3,
    )
    assert rep.ok, str(rep)
    res_s = mpf_factorize(jnp.asarray(a), r=b, policy=MPF_BF16, block=b)
    np.testing.assert_array_equal(np.asarray(res.ipiv), np.asarray(res_s.ipiv))


@pytest.mark.slow
def test_dist_fused_matches_jnp_path(monkeypatch):
    """The fused replicated-panel dist path (round 2) must produce the same
    pivots/factors as the jnp dist path — interpret mode on the CPU mesh."""
    from jax.experimental.pallas import tpu as pltpu
    import mpf_tpu.config as cfg
    from mpf_tpu.parallel.dist_lu import make_dist_lu, _dist_fused_ok
    from mpf_tpu.parallel.block_cyclic import to_block_cyclic

    import mpf_tpu.models.mpf as M

    n, b, r = 256, 128, 8
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    a = matgen.hpl_ai_matrix(n, seed=13)
    tiles = to_block_cyclic(jnp.asarray(a), 2, 2, b)

    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)  # exercise tail windows
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    assert _dist_fused_ok(n, b, r, MPF_BF16, True)
    with pltpu.force_tpu_interpret_mode():
        t_f, ipiv_f, info_f, perm_f = jax.tree.map(
            np.asarray, make_dist_lu(n, b, mesh, MPF_BF16, r=r)(tiles)
        )
    monkeypatch.setattr(cfg, "_USE_PALLAS", "0")
    t_j, ipiv_j, info_j, perm_j = jax.tree.map(
        np.asarray, make_dist_lu(n, b, mesh, MPF_BF16, r=r)(tiles)
    )
    np.testing.assert_array_equal(ipiv_f, ipiv_j)
    np.testing.assert_array_equal(perm_f, perm_j)
    lu_f = from_block_cyclic(t_f, n, b)
    rep = check_factorization(
        a.astype(np.float64), np.asarray(lu_f), ipiv_f, nbe_tol=1e-3
    )
    assert rep.ok, str(rep)


def test_dist_bad_dims():
    mesh = make_mesh((2, 4))
    with pytest.raises(ValueError):
        dist_factorize(jnp.zeros((30, 30)), mesh, b=4)


@pytest.mark.slow
def test_dist_fused_superblock_matches_single_chip(monkeypatch):
    """Three-level blocking on the fused dist path: same update schedule as
    the superblocked single-chip driver (mid per block, one wide far GEMM
    per superblock), so pivots/perm match it exactly and the oracle holds.
    Interpret mode on a (2, 2) CPU mesh."""
    from jax.experimental.pallas import tpu as pltpu
    import mpf_tpu.config as cfg
    from mpf_tpu.parallel.dist_lu import make_dist_lu, _dist_fused_ok
    from mpf_tpu.parallel.block_cyclic import to_block_cyclic, from_block_cyclic

    import mpf_tpu.models.mpf as M

    n, b, r, S = 512, 128, 8, 256
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    a = matgen.random_dense(n, seed=17)  # pivot-heavy
    tiles = to_block_cyclic(jnp.asarray(a, jnp.float32), 2, 2, b)

    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    assert _dist_fused_ok(n, b, r, MPF_BF16, True)
    with pltpu.force_tpu_interpret_mode():
        t_f, ipiv_f, info_f, perm_f = jax.tree.map(
            np.asarray,
            make_dist_lu(n, b, mesh, MPF_BF16, r=r, super_block=S)(tiles),
        )
        res_s = jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(
                jnp.asarray(a, jnp.float32), r=r, policy=MPF_BF16, block=b,
                super_block=S,
            ),
        )
    lu_f = from_block_cyclic(t_f, n, b)
    rep = check_factorization(
        a.astype(np.float64), np.asarray(lu_f), ipiv_f, nbe_tol=1e-3
    )
    assert rep.ok, str(rep)
    np.testing.assert_array_equal(ipiv_f, res_s.ipiv)
    np.testing.assert_array_equal(perm_f, res_s.perm)


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (1, 8)])
def test_owner_panel_bitexact_vs_replicated(shape, monkeypatch):
    """Row-sharded (owner) panel work (round 4) must be BIT-identical to the
    replicated-panel path — pivots, factors, perm — on a pivot-heavy
    uniform matrix, across mesh shapes."""
    ndev = shape[0] * shape[1]
    mesh = make_mesh(shape, devices=jax.devices()[:ndev])
    n, b = 128, 8
    a = matgen.random_dense(n, seed=13)
    outs = {}
    for mode in ("owner", "replicated"):
        monkeypatch.setenv("MPF_DIST_PANEL", mode)
        outs[mode] = jax.tree.map(
            np.asarray,
            dist_factorize(jnp.asarray(a), mesh, b=b, policy=MPF_BF16),
        )
    o, rp = outs["owner"], outs["replicated"]
    np.testing.assert_array_equal(o.ipiv, rp.ipiv)
    np.testing.assert_array_equal(o.perm, rp.perm)
    np.testing.assert_array_equal(
        np.asarray(o.lu, np.float32), np.asarray(rp.lu, np.float32)
    )
    rep = check_factorization(a.astype(np.float64), o.lu, o.ipiv,
                              nbe_tol=1e-3)
    assert rep.ok, str(rep)


def test_owner_panel_matches_single_chip_fp32(monkeypatch):
    """Owner-panel dist path vs the single-chip driver, fp32: pivot-exact;
    LU values differ only by the dist trailing GEMM's accumulation shape
    (same tolerance as the replicated-path test)."""
    monkeypatch.setenv("MPF_DIST_PANEL", "owner")
    mesh = make_mesh((2, 4))
    n, b = 64, 8
    a = matgen.random_dense(n, seed=14).astype(np.float32)
    res_d = dist_factorize(jnp.asarray(a), mesh, b=b, policy=PURE_FP32)
    res_s = mpf_factorize(jnp.asarray(a), r=b, policy=PURE_FP32, block=b)
    np.testing.assert_array_equal(np.asarray(res_d.ipiv),
                                  np.asarray(res_s.ipiv))
    scale = np.abs(np.asarray(res_s.lu)).max()
    assert np.abs(np.asarray(res_d.lu) - np.asarray(res_s.lu)).max() <= (
        1e-5 * scale
    )


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(2, 2), (4, 2)])
def test_dist_fused_owner_bitexact_vs_replicated(shape, monkeypatch):
    """Owner-column panel for the FUSED dist path (round 5, VERDICT r4
    item 5): pivot selection runs on replicated thin panel slices and the
    B-stage on local rows, so pivots/perm must be BIT-identical to the
    replicated-panel fused path; factors too (fp32 working — the CPU
    backend's bf16 GEMM is shape-sensitive per element, see
    tests/test_defer.py)."""
    from jax.experimental.pallas import tpu as pltpu
    import mpf_tpu.config as cfg
    import mpf_tpu.models.mpf as M
    from mpf_tpu.parallel.dist_lu import make_dist_lu, _dist_fused_ok
    from mpf_tpu.precision import PURE_FP32

    ndev = shape[0] * shape[1]
    mesh = make_mesh(shape, devices=jax.devices()[:ndev])
    n, b, r = (256 if shape == (2, 2) else 512), 128, 8
    a = matgen.random_dense(n, seed=21).astype(np.float32)
    tiles = to_block_cyclic(jnp.asarray(a), shape[0], shape[1], b)
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    assert _dist_fused_ok(n, b, r, PURE_FP32, True)
    outs = {}
    for mode in ("owner", "replicated"):
        monkeypatch.setenv("MPF_DIST_FUSED_PANEL", mode)
        with pltpu.force_tpu_interpret_mode():
            outs[mode] = jax.tree.map(
                np.asarray, make_dist_lu(n, b, mesh, PURE_FP32, r=r)(tiles)
            )
    (t_o, ip_o, in_o, pm_o), (t_r, ip_r, in_r, pm_r) = (
        outs["owner"], outs["replicated"]
    )
    np.testing.assert_array_equal(ip_o, ip_r)
    np.testing.assert_array_equal(pm_o, pm_r)
    np.testing.assert_array_equal(in_o, in_r)
    np.testing.assert_array_equal(
        np.asarray(t_o, np.float32), np.asarray(t_r, np.float32)
    )
    lu_o = from_block_cyclic(t_o, n, b)
    rep = check_factorization(a.astype(np.float64), np.asarray(lu_o), ip_o,
                              nbe_tol=1e-3)
    assert rep.ok, str(rep)


@pytest.mark.slow
def test_dist_fused_owner_n1024(monkeypatch):
    """Fused dist path at non-toy size (VERDICT r4 item 6): n=1024, b=128
    on a (2, 2) CPU mesh, pivot-heavy uniform corpus — oracle clean and
    pivot/perm parity with the single-chip fused driver."""
    from jax.experimental.pallas import tpu as pltpu
    import mpf_tpu.config as cfg
    import mpf_tpu.models.mpf as M
    from mpf_tpu.parallel.dist_lu import make_dist_lu, _dist_fused_ok

    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    n, b, r = 1024, 128, 32
    a = matgen.random_dense(n, seed=4).astype(np.float32)
    tiles = to_block_cyclic(jnp.asarray(a), 2, 2, b)
    monkeypatch.setattr(M, "_PAD_QUANTUM", 256)
    monkeypatch.setattr(M, "_FUSED_RB", 256)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    assert _dist_fused_ok(n, b, r, MPF_BF16, True)
    with pltpu.force_tpu_interpret_mode():
        t_f, ipiv_f, info_f, perm_f = jax.tree.map(
            np.asarray, make_dist_lu(n, b, mesh, MPF_BF16, r=r)(tiles)
        )
        res_s = jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(jnp.asarray(a), r=r, policy=MPF_BF16,
                                   block=b, defer=False),
        )
    np.testing.assert_array_equal(ipiv_f, res_s.ipiv)
    np.testing.assert_array_equal(perm_f, res_s.perm)
    lu_f = from_block_cyclic(t_f, n, b)
    rep = check_factorization(a.astype(np.float64), np.asarray(lu_f), ipiv_f,
                              nbe_tol=1e-3)
    assert rep.ok, str(rep)
