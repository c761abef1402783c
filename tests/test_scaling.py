"""Equilibration (geequ) and the equilibrated solve path.

Badly row/column-scaled matrices break bf16 pivot selection (the panel
values over/underflow bf16's resolution long before fp32's); power-of-two
equilibration restores them without introducing any rounding of its own.
"""

import numpy as np
import jax.numpy as jnp

import mpf_tpu
from mpf_tpu.ops.scaling import equilibrate, geequ


def _badly_scaled(rng, n, span=12):
    """Random well-conditioned core with rows/cols scaled across ~10^span."""
    core = rng.standard_normal((n, n)).astype(np.float32) + n * np.eye(
        n, dtype=np.float32
    )
    r = np.logspace(0, span / 2, n).astype(np.float32)
    c = np.logspace(-span / 2, 0, n).astype(np.float32)
    return core * r[:, None] * c[None, :]


def test_geequ_power_of_two_and_range(rng):
    a = _badly_scaled(rng, 40)
    r, c, rowcnd, colcnd, amax = geequ(jnp.asarray(a))
    r, c = np.asarray(r, np.float64), np.asarray(c, np.float64)
    # exact powers of two
    assert np.all(np.exp2(np.round(np.log2(r))) == r)
    assert np.all(np.exp2(np.round(np.log2(c))) == c)
    # scaled matrix has every row max within a factor-2 band of 1
    s = a * r[:, None] * c[None, :]
    rowmax = np.abs(s).max(axis=1)
    assert rowmax.max() / rowmax.min() < 8.0
    assert float(amax) == np.abs(a).max()
    # the original rows span ~6 decades => rowcnd is tiny
    assert float(rowcnd) < 1e-4


def test_geequ_zero_row_safe():
    a = np.zeros((8, 8), np.float32)
    a[2, 3] = 5.0
    r, c, _, _, _ = geequ(jnp.asarray(a))
    assert np.all(np.isfinite(np.asarray(r)))
    assert np.all(np.isfinite(np.asarray(c)))


def test_equilibrated_solve_recovers_bad_scaling(rng):
    n = 96
    a = _badly_scaled(rng, n)
    x_true = rng.standard_normal((n,)).astype(np.float32)
    b = (a.astype(np.float64) @ x_true).astype(np.float32)

    x, info = mpf_tpu.solve(
        jnp.asarray(a), jnp.asarray(b), r=8, equilibrate=True,
        auto_escalate=True,
    )
    assert info["backward_error"] < 1e-6
    # unscaling is exact, so the solution matches an fp64 solve closely
    x_ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    assert np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref) < 1e-3


def test_equilibrate_roundtrip_exact(rng):
    # power-of-two scaling must preserve mantissas bit-exactly
    a = rng.standard_normal((32, 32)).astype(np.float32) * 1e3
    s, r, c = equilibrate(jnp.asarray(a))
    back = np.asarray(s, np.float32) / np.asarray(r)[:, None] / np.asarray(c)[None, :]
    np.testing.assert_array_equal(back, a)


def test_equilibrated_solve_multi_rhs():
    """Row/column scales must broadcast along the ROW axis for (n, k) RHS
    blocks (advisor round-3 finding: 1-D rs/cs broadcast against the last
    axis scaled the wrong axis / crashed for k != n)."""
    import numpy as np
    import jax.numpy as jnp
    from mpf_tpu.models.refine import solve
    from mpf_tpu.utils import matgen

    n, k = 96, 3
    rng = np.random.default_rng(5)
    a = matgen.random_dense(n, seed=9).astype(np.float32)
    a[0] *= 2.0 ** 12  # badly row-scaled so equilibration matters
    b = rng.standard_normal((n, k)).astype(np.float32)
    x, info = solve(jnp.asarray(a), jnp.asarray(b), r=16, equilibrate=True)
    r = a.astype(np.float64) @ np.asarray(x, np.float64) - b
    be = np.abs(r).max() / (
        np.abs(a).sum(1).max() * np.abs(np.asarray(x)).max() + np.abs(b).max()
    )
    assert be < 1e-6, (be, info)
