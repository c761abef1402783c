"""Fused Pallas TPU kernels for the panel factorizations.

TPU-native redesign of the reference's cooperative CUDA kernels:

  * :func:`hgetf2_panel` — the low-precision pre-pivoting panel LU
    (`HGETF2_kernel`, `hgetf2_kernel.cu:15-120`).  The reference runs 4
    grid-wide barriers per column (block argmax -> inter-block argmax ->
    row swap -> rank-1 update, `hgetf2_kernel.cu:25,65,84,101`); there is no
    grid barrier on TPU, so the whole panel lives in VMEM and the column
    loop runs inside ONE kernel invocation.

    TPU-specific design:

    - **transposed layout**: the panel is held as (r, m) in VMEM — panel
      columns are lane-major rows, so every per-column vector op (argmax
      search, position updates, multipliers) runs at full 128-lane VPU
      utilization.  In the natural (m, r) layout these are (m, 1) vectors
      using 1 of 128 lanes and dominate the kernel ~10x.
    - **virtual pivoting**: rows are never physically swapped.  The kernel
      carries position maps instead (``perm``: position -> original row,
      ``pos``: original row -> position); a swap updates two scalar entries.
      Pivot search masks on ``pos >= d``; ties resolve to the lowest
      *current position*, matching the reference's swapped-layout strict->
      scan (`hgetf2_kernel.cu:68-82`).
    - **discarded factors are never stored**: the reference writes fp16
      multipliers in place (`hgetf2_kernel.cu:103-115`) and throws the
      buffer away (only `ipiv_panel` is read back, `MPF.cu:145`).  The
      rank-1 update touches only columns right of the diagonal, so the hot
      loop is ~2 full-lane passes over the (r, m) panel per column.

  * :func:`getf2_npv_block` — the working-precision no-pivot block
    re-factorization (`dgetf2_native_npv`, `dgetf2_native_npv.cu:11-36`)
    on the r x r diagonal block, with zero-pivot ``info`` detection the
    reference lacks.

Constraints: ``r % 8 == 0`` (aligned sublane slab reads of the transposed
panel) and ``m % 128 == 0`` (lane tiling); the jnp reference kernels
(`mpf_tpu.ops.getf2`) cover all other shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hgetf2t_kernel(off_ref, pt_in_ref, pt_ref, piv_ref, perm_ref, *, r: int):
    """Pre-pivoting panel LU on the transposed (r, m) panel."""
    m = pt_ref.shape[1]
    pt_ref[:] = pt_in_ref[:]  # no-op self-copy under aliasing; initializes
    off = off_ref[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)   # global row ids
    rcols = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)   # panel col ids
    pivlanes = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)

    def body(j, carry):
        perm, pos, piv = carry  # (1, m), (1, m), (1, r) int32
        d = off + j
        # panel column j == row j of the transposed panel: aligned 8-row
        # slab read + masked select (one (8, m) pass)
        sb = pl.multiple_of((j // 8) * 8, 8)
        slab = pt_ref[pl.ds(sb, 8), :]
        srows = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        colv = jnp.sum(
            jnp.where(srows == j - sb, slab.astype(jnp.float32), 0.0),
            axis=0,
            keepdims=True,
        )  # (1, m) fp32, signed
        # pivot search over rows not yet chosen; lowest current position wins
        cabs = jnp.where(pos >= d, jnp.abs(colv), jnp.float32(-1.0))
        mx = jnp.max(cabs)
        cp = jnp.min(jnp.where((cabs == mx) & (pos >= d), pos, m))
        o = jnp.sum(jnp.where(pos == cp, lanes, 0))   # original row at cp
        o2 = jnp.sum(jnp.where(pos == d, lanes, 0))   # original row at d
        pos = jnp.where(lanes == o, d, jnp.where(lanes == o2, cp, pos))
        perm = jnp.where(lanes == d, o, jnp.where(lanes == cp, o2, perm))
        piv = jnp.where(pivlanes == j, cp, piv)
        # multipliers (fp32 compute, panel-dtype storage-free rank-1)
        pivval = jnp.sum(jnp.where(lanes == o, colv, 0.0))
        safe = jnp.where(pivval == 0, jnp.float32(1), pivval)
        mult = jnp.where(pos > d, colv / safe, 0.0).astype(pt_ref.dtype)  # (1, m)
        # pivot row of the original panel == lane o of the transposed panel:
        # one full-lane masked reduction over (r, m)
        p = pt_ref[:]
        ucol = jnp.sum(
            jnp.where(lanes == o, p, 0).astype(jnp.float32), axis=1, keepdims=True
        )  # (r, 1)
        ucol = jnp.where(rcols > j, ucol, 0.0).astype(pt_ref.dtype)
        pt_ref[:] = p - ucol * mult
        return perm, pos, piv

    perm, _, piv = jax.lax.fori_loop(
        0, r, body, (lanes, lanes, pivlanes + off)
    )
    perm_ref[:] = perm
    piv_ref[:] = piv


@functools.lru_cache(maxsize=64)
def _build_hgetf2t(m: int, r: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(_hgetf2t_kernel, r=r)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),  # trashed panel (aliased)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # piv (1, r)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # perm (1, m)
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, m), dtype),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
        ),
        input_output_aliases={1: 0},  # panel input -> trashed panel output
        compiler_params=pltpu.CompilerParams(
            # panel + fp32 temporaries + int32 maps
            vmem_limit_bytes=int(3 * m * r * dtype.itemsize + (16 << 20)),
        ),
    )


def hgetf2_panel(panel: jax.Array, row_offset=0):
    """Pallas pre-pivoting panel LU.  ``panel`` is (m, r) in the panel
    dtype; returns (piv, perm): ``piv`` (r,) 0-based pivot positions
    (panel-array rows), ``perm`` (m,) the composed row map
    (A_new[i] = A_old[perm[i]]).  The low-precision numeric factors are
    discarded (reference semantics, SURVEY.md section 0)."""
    m, r = panel.shape
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)
    pt = jnp.swapaxes(panel, 0, 1)  # (r, m): lane-major columns
    _, piv, perm = _build_hgetf2t(m, r, panel.dtype.name)(off, pt)
    return piv[0, :], perm[0, :]


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
