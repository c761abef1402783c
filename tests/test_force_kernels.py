"""MPF_FORCE_KERNELS (round 4, ADVICE r3 item 3): drive the Pallas kernel
paths THROUGH the driver on the CPU backend (interpret mode), so the
composed on-TPU flow — combined one-sweep exchange + window RMW +
driver threading — is covered end-to-end in CI, not only by kernel unit
tests plus one-off chip runs."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas.tpu as pltpu
import pytest

import mpf_tpu.config as cfg
import mpf_tpu.models.mpf as M
from mpf_tpu.precision import MPF_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization

pytestmark = pytest.mark.slow  # interpret-mode Pallas throughout


def _run(a, monkeypatch, force):
    monkeypatch.setattr(M, "_PAD_QUANTUM", 128)
    monkeypatch.setattr(M, "_FUSED_RB", 128)
    monkeypatch.setattr(cfg, "_USE_PALLAS", "1")
    monkeypatch.setenv("MPF_FORCE_KERNELS", "1" if force else "0")
    with pltpu.force_tpu_interpret_mode():
        return jax.tree.map(
            np.asarray,
            M.mpf_factorize_traced(
                jnp.asarray(a, jnp.float32), r=32, policy=MPF_BF16,
                block=128,
            ),
        )


def test_driver_exchange_kernel_bitexact_vs_jnp_fallback(monkeypatch):
    """The driver-threaded combined exchange (kernels_on gate) must be
    BIT-identical to the jnp gather/scatter fallback it replaces, on a
    pivot-heavy input."""
    n = 384
    a = matgen.random_dense(n, seed=9).astype(np.float32)
    k = _run(a, monkeypatch, force=True)    # interpret Pallas kernels
    j = _run(a, monkeypatch, force=False)   # jnp fallback exchange
    np.testing.assert_array_equal(k.ipiv, j.ipiv)
    np.testing.assert_array_equal(k.perm, j.perm)
    np.testing.assert_array_equal(
        np.asarray(k.lu, np.float32), np.asarray(j.lu, np.float32)
    )
    rep = check_factorization(a.astype(np.float64), k.lu, k.ipiv,
                              nbe_tol=1e-3)
    assert rep.ok, str(rep)
