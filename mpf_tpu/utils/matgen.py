"""Matrix corpus generation with the reference's exact semantics.

Replicates `matrix_generator.cpp` behaviorally (value distribution, PRNG
consumption order, size schedule) using the glibc-``rand()`` clone in
:mod:`mpf_tpu.utils.glibc_rand`, so Python- and C++-generated corpora are
bit-identical:

  * sizes start at 2 and grow ``*= step`` (exp) or ``+= step`` (lin)
    (`matrix_generator.cpp:55,74-78`)
  * per element: if ``sparsity > 0`` draw ``rand()/(RAND_MAX+1.0)`` first and
    emit 0.0 when it lands below ``sparsity`` (consuming only that one rand),
    otherwise consume a second rand for the value ``rand() % 100 / 10.0``
    (`matrix_generator.cpp:63-66`)
  * elements are emitted row by row (`matrix_generator.cpp:60-71`).

Also provides fast JAX-PRNG-based generators for benchmarks and tests
(uniform dense like the reference's distribution, plus controlled-condition
matrices for iterative-refinement sweeps, per BASELINE.json config 5).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np

from mpf_tpu.utils.glibc_rand import GlibcRand


def corpus_sizes(max_size: int, step: int = 2, mode: str = "exp") -> List[int]:
    """The reference's size schedule (`matrix_generator.cpp:55-78`)."""
    if mode not in ("exp", "lin"):
        raise ValueError(f"mode must be 'exp' or 'lin', got {mode!r}")
    if step <= 0 or (mode == "exp" and step < 2):
        # step=1 with 'exp' would loop forever (size *= 1 never grows); the
        # reference shares this flaw (`matrix_generator.cpp:55,74-78`) — we
        # reject it instead.
        raise ValueError(f"step must be >= 2 for mode='exp' (got {step})")
    sizes = []
    size = 2
    while size <= max_size:
        sizes.append(size)
        size = size * step if mode == "exp" else size + step
    return sizes


def generate_matrix(n: int, rng: GlibcRand, sparsity: float = 0.0) -> np.ndarray:
    """One (n, n) fp64 matrix with the reference's element semantics."""
    a = np.empty((n, n), dtype=np.float64)
    for i in range(n):
        for j in range(n):
            if sparsity > 0.0 and rng.uniform() < sparsity:
                a[i, j] = 0.0
            else:
                a[i, j] = rng.ref_value()
    return a


def generate_corpus(
    max_size: int, step: int = 2, mode: str = "exp", sparsity: float = 0.0, seed: int = 1
) -> List[np.ndarray]:
    """Full corpus, PRNG-consumption-order-identical to the reference
    generator run with the same arguments (unseeded C = ``seed=1``)."""
    if not (0.0 <= sparsity < 1.0):
        raise ValueError(f"sparsity must be in [0, 1), got {sparsity}")
    rng = GlibcRand(seed)
    return [generate_matrix(n, rng, sparsity) for n in corpus_sizes(max_size, step, mode)]


# ---------------------------------------------------------------------------
# Fast generators (not reference-parity; for benchmarks / large tests)
# ---------------------------------------------------------------------------


def random_dense(n: int, seed: int = 0, dtype=np.float32) -> np.ndarray:
    """Uniform [0, 9.9] dense matrix — the reference distribution's shape
    without the per-element PRNG cost.  Row-diagonally shifted the same way
    random matrices behave: uniform iid entries are almost surely
    well-conditioned enough for partial pivoting."""
    r = np.random.default_rng(seed)
    return (r.random((n, n)) * 9.9).astype(dtype)


def hpl_ai_matrix(n: int, seed: int = 0, dtype=np.float32) -> np.ndarray:
    """HPL-AI / HPL-MxP-style benchmark matrix: centered uniform off-diagonal
    entries plus a dominant diagonal shift, keeping kappa(A) small so that
    low-precision factors + iterative refinement converge (the matrix class
    the mixed-precision LU benchmarks are defined on; with the reference's
    positive-mean uniform corpus, kappa grows past 1/eps_bf16 around n~1000
    and plain Richardson IR on bf16-GEMM factors legitimately diverges)."""
    r = np.random.default_rng(seed)
    a = (r.random((n, n)) - 0.5).astype(dtype)
    idx = np.arange(n)
    a[idx, idx] += n / 4.0
    return a


def hpl_ai_matrix_device(n: int, seed: int = 0, ext_rows: int = 0,
                         pairs: bool = False, dtype=None):
    """Device-side HPL-AI-style matrix (same class as :func:`hpl_ai_matrix`
    but generated with the JAX PRNG directly on the accelerator — host->device
    transfer of an n^2 matrix runs at ~10 MB/s through this session's TPU
    tunnel, which makes host-side generation impractical past n~16k).

    ``ext_rows``: extra don't-care rows appended below (the deferred-
    exchange driver's pre-allocated overflow region, `models/mpf.py:
    defer_extension` — generating the (n + ov, n) buffer directly avoids
    materializing matrix AND extension side by side at the HBM edge).

    ``pairs=True``: emit the natively-3D (n/2, 2, n) pair layout consumed
    by the round-5 pair-layout driver (`models/mpf._factorize_3d`) —
    ELEMENTWISE IDENTICAL values (the JAX PRNG fills shapes of equal count
    in row-major order), generated directly in the 3D layout because an
    XLA 2D->3D reshape materializes a relayout copy.

    ``dtype``: output storage dtype.  Values are always COMPUTED in fp32
    and cast once at the end — bit-identical to the driver's own
    ``astype(policy.working)`` of an fp32 input.  Callers that hand the
    result to a separately-jitted factorizer (the multi-part pair driver,
    `time_fn(rejit=False)`) MUST pass the policy's working dtype: an fp32
    (n/2, 2, n) argument is 16 GB at n=65536 and cannot donation-alias the
    bf16 output, which is exactly the HBM OOM of
    tools/chip_logs_r5_p3t64d.log (inside one jit, XLA fuses the cast into
    the generator, which is why the 2D rejit=True legs never saw this)."""
    import jax
    import jax.numpy as jnp

    assert not (pairs and ext_rows), "pair layout excludes deferred overflow"

    @jax.jit
    def gen(key):
        shape = ((n + ext_rows) // 2, 2, n) if pairs else (n + ext_rows, n)
        a = jax.random.uniform(key, shape, jnp.float32) - 0.5
        if pairs:
            rows = (
                2 * jax.lax.broadcasted_iota(jnp.int32, (n // 2, 2, 1), 0)
                + jax.lax.broadcasted_iota(jnp.int32, (n // 2, 2, 1), 1)
            )
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        else:
            rows = jax.lax.broadcasted_iota(jnp.int32, (n + ext_rows, 1), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        out = jnp.where(rows == cols, a + n / 4.0, a)
        return out if dtype is None else out.astype(dtype)

    return gen(jax.random.PRNGKey(seed))


def random_dense_device(n: int, seed: int = 0, ext_rows: int = 0,
                        pairs: bool = False, dtype=None):
    """Device-side uniform [0, 9.9] matrix — the reference corpus's value
    distribution (`matrix_generator.cpp:66`) at benchmark sizes.  Unlike the
    diagonally-dominant HPL-AI class, pivots move on essentially EVERY
    column here, so this is the honest worst case for the physical row
    exchange (VERDICT r2 weak #3).  ``ext_rows``/``pairs``: see
    :func:`hpl_ai_matrix_device`."""
    import jax
    import jax.numpy as jnp

    assert not (pairs and ext_rows), "pair layout excludes deferred overflow"

    @jax.jit
    def gen(key):
        shape = ((n + ext_rows) // 2, 2, n) if pairs else (n + ext_rows, n)
        out = jax.random.uniform(key, shape, jnp.float32) * 9.9
        return out if dtype is None else out.astype(dtype)

    return gen(jax.random.PRNGKey(seed))


def random_conditioned(n: int, kappa: float, seed: int = 0, dtype=np.float32) -> np.ndarray:
    """Matrix with prescribed 2-norm condition number ``kappa`` via
    U * diag(logspace(0, -log10(kappa))) * V^T — for IR convergence sweeps
    (BASELINE.json config 5: kappa = 1e6)."""
    r = np.random.default_rng(seed)
    q1, _ = np.linalg.qr(r.standard_normal((n, n)))
    q2, _ = np.linalg.qr(r.standard_normal((n, n)))
    s = np.logspace(0, -np.log10(kappa), n)
    return (q1 * s @ q2.T).astype(dtype)
