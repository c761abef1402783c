"""LASWP sequential-swap semantics (`MPF.cu:42-59`): swapping through an
index vector + bounded gather must equal applying the swaps one by one."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpf_tpu.ops.pivoting import apply_row_swaps, apply_row_swaps_vector, swaps_to_row_map


def _apply_swaps_numpy(a, piv_global, k):
    a = a.copy()
    for j, p in enumerate(piv_global):
        a[[k + j, p], :] = a[[p, k + j], :]
    return a


@pytest.mark.parametrize("seed", range(5))
def test_sequential_swap_equivalence(seed):
    rng = np.random.default_rng(seed)
    n, k, r = 24, 8, 4
    a = rng.random((n, n)).astype(np.float32)
    # pivot rows >= k + j (partial-pivoting invariant), collisions allowed
    piv = np.array([k + j + rng.integers(0, n - k - j) for j in range(r)], dtype=np.int32)
    got = apply_row_swaps(jnp.asarray(a), jnp.asarray(piv), k, r)
    want = _apply_swaps_numpy(a, piv, k)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_colliding_pivots():
    """Sequential swaps != naive permutation when targets collide — the exact
    case SURVEY.md section 7 flags."""
    n = 6
    a = np.arange(n * n, dtype=np.float32).reshape(n, n)
    piv = np.array([3, 3, 3], dtype=np.int32)  # all three columns pivot to row 3
    got = apply_row_swaps(jnp.asarray(a), jnp.asarray(piv), 0, 3)
    want = _apply_swaps_numpy(a, piv, 0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_row_map_identity():
    piv = jnp.asarray(np.array([5, 6, 7], dtype=np.int32))
    rm = swaps_to_row_map(piv, 5, 3, 10)
    np.testing.assert_array_equal(np.asarray(rm), np.arange(5, 15))


def test_vector_swaps_match_matrix():
    rng = np.random.default_rng(0)
    n = 12
    b = rng.random((n, 2)).astype(np.float32)
    ipiv = np.array([rng.integers(i, n) + 1 for i in range(n)], dtype=np.int32)  # 1-based
    got = apply_row_swaps_vector(jnp.asarray(b), jnp.asarray(ipiv))
    want = b.copy()
    for i in range(n):
        p = ipiv[i] - 1
        want[[i, p]] = want[[p, i]]
    np.testing.assert_array_equal(np.asarray(got), want)
