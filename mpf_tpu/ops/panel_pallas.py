"""Fused Pallas TPU kernels for the panel factorizations.

TPU-native redesign of the reference's cooperative CUDA kernels:

  * :func:`hgetf2_panel` — the low-precision pre-pivoting panel LU
    (`HGETF2_kernel`, `hgetf2_kernel.cu:15-120`).  The reference runs 4
    grid-wide barriers per column (block argmax -> inter-block argmax ->
    row swap -> rank-1 update, `hgetf2_kernel.cu:25,65,84,101`); there is no
    grid barrier on TPU, so the whole panel lives in VMEM and the column
    loop runs inside ONE kernel invocation.

    Two TPU-specific twists:

    - **virtual pivoting**: rows are never physically swapped.  The kernel
      carries a position map instead (``perm``: position -> original row,
      ``pos``: original row -> position) and updates only the two scalar
      entries a swap would touch.  Pivot search masks on ``pos > d`` (rows
      not yet chosen), ties resolve to the lowest *current position* —
      bit-identical pivot sequences to the reference's swapped layout
      (strict-> scan, `hgetf2_kernel.cu:68-82`).
    - **discarded factors are never stored**: the reference writes fp16
      multipliers in place (`hgetf2_kernel.cu:103-115`) and throws the
      buffer away (`MPF.cu`; only `ipiv_panel` is read back).  Here the
      rank-1 update touches only columns right of the diagonal, so the hot
      loop is ONE masked column extraction + ONE masked FMA pass over the
      (m, r) panel per column.

  * :func:`getf2_npv_block` — the working-precision no-pivot block
    re-factorization (`dgetf2_native_npv`, `dgetf2_native_npv.cu:11-36`)
    on the r x r diagonal block, with zero-pivot ``info`` detection the
    reference lacks.

Both kernels are single-program (grid=()) with everything in VMEM; the
panel is updated in place through input/output aliasing so only one (m, r)
buffer is resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hgetf2_kernel(off_ref, panel_in_ref, panel_ref, piv_ref, perm_ref, *, r: int):
    """In-place pre-pivoting panel LU; ``panel_ref`` (the output ref) is
    aliased to ``panel_in_ref``'s buffer so only one (m, r) buffer is
    resident; the initial copy below is a no-op self-copy under aliasing but
    guarantees the output ref is initialized in all modes."""
    m = panel_ref.shape[0]
    panel_ref[:] = panel_in_ref[:]
    off = off_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)

    pivcols = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)

    def body(j, carry):
        perm, pos, piv = carry  # (m,1)x2 int32 maps + (r,1) pivot record
        d = off + j
        p = panel_ref[:]  # single (m, r) load per iteration
        # one masked extraction pass: signed column j in fp32
        colv = jnp.sum(
            jnp.where(cols == j, p, 0).astype(jnp.float32), axis=1, keepdims=True
        )  # (m, 1)
        cabs = jnp.where(pos >= d, jnp.abs(colv), jnp.float32(-1.0))
        mx = jnp.max(cabs)
        # winner: among maxima, the lowest current position (reference
        # tie-break). cp = that position; o = original row sitting there.
        cp = jnp.min(jnp.where((cabs == mx) & (pos >= d), pos, m))
        o = jnp.sum(jnp.where(pos == cp, rows, 0))
        piv = jnp.where(pivcols == j, cp, piv)  # unaligned stores are not
        # lowerable on TPU; record pivots in a carried vector instead
        # virtual swap: original row o moves to position d; the row at
        # position d moves to cp
        o2 = jnp.sum(jnp.where(pos == d, rows, 0))
        pos = jnp.where(rows == o, d, jnp.where(rows == o2, cp, pos))
        perm = jnp.where(rows == d, o, jnp.where(rows == cp, o2, perm))
        # rank-1 elimination on not-yet-pivoted rows, columns > j only —
        # arithmetic stays in the panel dtype (the reference eliminates
        # natively in fp16, `hgetf2_kernel.cu:103-115`)
        pivval = jnp.sum(jnp.where(rows == o, colv, 0.0))
        safe = jnp.where(pivval == 0, jnp.float32(1), pivval)
        mult = jnp.where(pos > d, colv / safe, 0.0).astype(p.dtype)  # (m, 1)
        # pivot row: aligned 16-row slab read + masked select (sublane loads
        # must be 8/16-aligned on TPU)
        slab_base = pl.multiple_of((o // 16) * 16, 16)
        slab = panel_ref[pl.ds(slab_base, 16), :]
        srows = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        urow = jnp.sum(
            jnp.where(srows == o - slab_base, slab.astype(jnp.float32), 0.0),
            axis=0,
            keepdims=True,
        ).astype(p.dtype)
        urow = jnp.where(cols > j, urow, jnp.zeros_like(urow))
        panel_ref[:] = p - mult * urow
        return perm, pos, piv

    perm, _, piv = jax.lax.fori_loop(0, r, body, (rows, rows, pivcols + off))
    perm_ref[:] = perm
    piv_ref[:] = piv


@functools.lru_cache(maxsize=64)
def _build_hgetf2(m: int, r: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(_hgetf2_kernel, r=r)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),  # trashed panel (aliased)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # piv (r, 1)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # perm (m, 1)
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, r), dtype),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
        ),
        input_output_aliases={1: 0},  # panel input -> trashed panel output
        compiler_params=pltpu.CompilerParams(
            # panel + int32 position maps + elementwise temporaries
            vmem_limit_bytes=int(2 * m * r * dtype.itemsize + (24 << 20)),
        ),
    )


def hgetf2_panel(panel: jax.Array, row_offset=0):
    """Pallas pre-pivoting panel LU.  Returns (piv, perm): ``piv`` (r,)
    0-based pivot positions (panel-array rows), ``perm`` (m,) the composed
    row map (A_new[i] = A_old[perm[i]]).  The low-precision factors are
    discarded (reference semantics, SURVEY.md section 0)."""
    m, r = panel.shape
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)
    _, piv, perm = _build_hgetf2(m, r, panel.dtype.name)(off, panel)
    return piv[:, 0], perm[:, 0]


def _npv_kernel(block_ref, out_ref, info_ref, *, r: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    info_ref[0, 0] = jnp.int32(0)
    out_ref[:] = block_ref[:]

    def body(j, _):
        b = out_ref[:]
        colv = jnp.sum(jnp.where(cols == j, b, 0), axis=1, keepdims=True)
        pivval = jnp.sum(jnp.where(rows == j, colv, 0.0))

        @pl.when((pivval == 0) & (info_ref[0, 0] == 0))
        def _():
            info_ref[0, 0] = j + 1

        safe = jnp.where(pivval == 0, jnp.ones_like(pivval), pivval)
        mult = jnp.where(rows > j, colv / safe, 0.0)
        urow = jnp.sum(jnp.where(rows == j, b, 0), axis=0, keepdims=True)
        urow_m = jnp.where(cols > j, urow, jnp.zeros_like(urow))
        upd = b - mult * urow_m
        out_ref[:] = jnp.where((cols == j) & (rows > j), mult, upd)
        return 0

    jax.lax.fori_loop(0, r, body, 0)


@functools.lru_cache(maxsize=64)
def _build_npv(r: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(_npv_kernel, r=r)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, r), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
    )


def getf2_npv_block(block: jax.Array):
    """Pallas no-pivot LU of the (r, r) diagonal block; returns (lu, info)
    with LAPACK-style 1-based ``info`` for the first zero pivot."""
    r = block.shape[0]
    lu, info = _build_npv(r, block.dtype.name)(block)
    return lu, info[0, 0]
