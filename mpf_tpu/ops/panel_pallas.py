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


def _hgetf2t_kernel(
    off_ref, panel_ref, prev_perm_ref, piv_ref, perm_ref, cperm_ref,
    srcs_ref, pt_ref, *, r: int
):
    """Pre-pivoting panel LU.  ``panel_ref`` is the natural (m, r) panel in
    working precision; the kernel casts to the low panel dtype and
    transposes into the (r, m) VMEM scratch ``pt_ref`` (both ops are ~free
    in-kernel; the XLA-level cast+transpose cost ~150 us per panel).

    ``prev_perm_ref`` (1, m) is the row map composed by earlier panels; this
    kernel applies its own swaps to it scalar-by-scalar and emits the fully
    composed map — the driver never performs an XLA gather to compose
    permutations (XLA 1D gathers cost ~0.7 ms per panel on this TPU)."""
    m = pt_ref.shape[1]
    pt_ref[:] = jnp.swapaxes(panel_ref[:].astype(pt_ref.dtype), 0, 1)
    off = off_ref[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)   # global row ids
    rcols = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)   # panel col ids
    pivlanes = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    gperm0 = prev_perm_ref[:]

    def body(j, carry):
        perm, pos, piv, gperm, srcd = carry  # (1,m)x2, (1,r), (1,m), (1,r)
        d = off + j
        # panel column j == row j of the transposed panel: aligned 8-row
        # slab read + masked select (one (8, m) pass).  ALL reduced values
        # stay (1, 1) arrays — vector->scalar extraction stalls the VPU
        # pipeline ~5us each, which dominated earlier kernel versions.
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
        mx = jnp.max(cabs, axis=1, keepdims=True)                    # (1, 1)
        cp = jnp.min(
            jnp.where((cabs == mx) & (pos >= d), pos, m), axis=1, keepdims=True
        )  # (1, 1) current position of the winner
        o = jnp.sum(jnp.where(pos == cp, lanes, 0), axis=1, keepdims=True)
        o2 = jnp.sum(jnp.where(pos == d, lanes, 0), axis=1, keepdims=True)
        pos = jnp.where(lanes == o, d, jnp.where(lanes == o2, cp, pos))
        perm = jnp.where(lanes == d, o, jnp.where(lanes == cp, o2, perm))
        piv = jnp.where(pivlanes == j, cp, piv)
        # the final row landing at position d is o (position d is never
        # swapped again) — record the LASWP gather source for dest rows
        srcd = jnp.where(pivlanes == j, o, srcd)
        # compose the same swap into the carried global row map
        g_d = jnp.sum(jnp.where(lanes == d, gperm, 0), axis=1, keepdims=True)
        g_cp = jnp.sum(jnp.where(lanes == cp, gperm, 0), axis=1, keepdims=True)
        gperm = jnp.where(lanes == d, g_cp, jnp.where(lanes == cp, g_d, gperm))
        # multipliers (fp32 compute, panel-dtype storage-free rank-1)
        pivval = jnp.sum(jnp.where(lanes == o, colv, 0.0), axis=1, keepdims=True)
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
        return perm, pos, piv, gperm, srcd

    perm, _, piv, gperm, srcd = jax.lax.fori_loop(
        0, r, body, (lanes, lanes, pivlanes + off, gperm0, pivlanes + off)
    )
    perm_ref[:] = perm
    piv_ref[:] = piv
    cperm_ref[:] = gperm

    # LASWP sources for the pivot-position rows: perm_final[piv[j]] (pivot
    # positions may be re-swapped by later columns, so resolve at the end)
    def src_body(j, srcp):
        pj = jnp.sum(jnp.where(pivlanes == j, piv, 0), axis=1, keepdims=True)
        sp = jnp.sum(jnp.where(lanes == pj, perm, 0), axis=1, keepdims=True)
        return jnp.where(pivlanes == j, sp, srcp)

    srcp = jax.lax.fori_loop(0, r, src_body, pivlanes + off)
    srcs_ref[:] = jnp.concatenate([srcd, srcp], axis=1)  # (1, 2r)


@functools.lru_cache(maxsize=64)
def _build_hgetf2t(m: int, r: int, in_dtype_name: str, panel_dtype_name: str):
    in_dtype = jnp.dtype(in_dtype_name)
    panel_dtype = jnp.dtype(panel_dtype_name)
    kernel = functools.partial(_hgetf2t_kernel, r=r)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # (m, r) working panel
                pl.BlockSpec(memory_space=pltpu.VMEM),  # prev composed perm
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),  # piv (1, r)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # panel-local perm (1, m)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # composed perm (1, m)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # LASWP sources (1, 2r)
            ),
            scratch_shapes=[
                pltpu.VMEM((r, m), panel_dtype),  # transposed low-prec panel
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, r), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, 2 * r), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            # input panel + transposed scratch + fp32 temporaries + int maps
            vmem_limit_bytes=int(
                m * r * (in_dtype.itemsize + 2 * panel_dtype.itemsize) + (24 << 20)
            ),
        ),
    )


def hgetf2_panel(panel: jax.Array, row_offset=0, prev_perm=None):
    """Pallas pre-pivoting panel LU.  ``panel`` is (m, r) in the panel
    dtype; returns (piv, perm[, composed]):

    * ``piv`` (r,): 0-based pivot positions (panel-array rows)
    * ``perm`` (m,): THIS panel's row map (A_new[i] = A_old[perm[i]])
    * when ``prev_perm`` (m,) is given, additionally returns the fully
      composed map prev ∘ this (swap composition runs inside the kernel —
      XLA 1D gathers are ~0.7 ms/panel on TPU, in-kernel composition is
      ~free).

    The low-precision numeric factors are discarded (reference semantics,
    SURVEY.md section 0)."""
    m, r = panel.shape
    piv, perm, cperm, _ = _hgetf2_full(panel, row_offset, prev_perm)
    if prev_perm is not None:
        return piv, perm, cperm
    return piv, perm


def hgetf2_panel_swaps(panel: jax.Array, row_offset, prev_perm, panel_dtype=None):
    """Like :func:`hgetf2_panel` but also returns the LASWP gather sources
    ``srcs`` (2r,) aligned with ``cand = concat([row_offset + arange(r),
    piv])`` — everything the bounded row exchange needs, with no XLA
    gathers at all.  ``panel`` may be the working-precision slice; the cast
    to ``panel_dtype`` (default: panel's own dtype) happens in-kernel."""
    return _hgetf2_full(panel, row_offset, prev_perm, panel_dtype)


def _hgetf2_full(panel, row_offset, prev_perm, panel_dtype=None):
    m, r = panel.shape
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)
    panel_dtype = jnp.dtype(panel_dtype or panel.dtype)
    if prev_perm is None:
        prev_perm = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    else:
        prev_perm = prev_perm.reshape(1, m)
    piv, perm, cperm, srcs = _build_hgetf2t(
        m, r, panel.dtype.name, panel_dtype.name
    )(off, panel, prev_perm)
    return piv[0, :], perm[0, :], cperm[0, :], srcs[0, :]


def _npv_inv_kernel(block_ref, out_ref, linv_ref, uinv_ref, info_ref, *, r: int):
    """No-pivot LU of the (r, r) block with FUSED triangular inverses.

    * L^{-1} accumulates Gauss-Jordan style during the elimination:
      L = E_0 E_1 ... with E_j = I + m_j e_j^T, so
      L^{-1} = prod_j (I - m_j e_j^T) applied left-to-right — one extra
      row-extract + rank-1 FMA per column, sharing the main loop.
    * U^{-1} by backward substitution in a second r-step loop.

    Replaces two XLA `triangular_solve` calls per panel (each a sequential
    128-step while-loop at full dispatch cost) with ~4 extra VPU passes over
    an (r, r) block per column — the TRSMs in the driver become plain MXU
    GEMMs against these inverses.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    eye = (rows == cols).astype(block_ref.dtype)
    out_ref[:] = block_ref[:]
    linv_ref[:] = eye
    zero11 = jnp.zeros((1, 1), jnp.int32)

    def body(j, info):
        # all reduced values stay (1, 1) — vector->scalar extraction stalls
        b = out_ref[:]
        colv = jnp.sum(jnp.where(cols == j, b, 0), axis=1, keepdims=True)
        pivval = jnp.sum(jnp.where(rows == j, colv, 0.0), axis=0, keepdims=True)
        info = jnp.where((pivval == 0) & (info == 0), j + 1, info)
        safe = jnp.where(pivval == 0, jnp.ones_like(pivval), pivval)
        mult = jnp.where(rows > j, colv / safe, 0.0)
        urow = jnp.sum(jnp.where(rows == j, b, 0), axis=0, keepdims=True)
        urow_m = jnp.where(cols > j, urow, jnp.zeros_like(urow))
        upd = b - mult * urow_m
        out_ref[:] = jnp.where((cols == j) & (rows > j), mult, upd)
        # linv <- (I - m_j e_j^T) linv : subtract mult * row j of linv
        li = linv_ref[:]
        lrow = jnp.sum(jnp.where(rows == j, li, 0), axis=0, keepdims=True)
        linv_ref[:] = li - mult * lrow
        return info

    info = jax.lax.fori_loop(0, r, body, zero11)
    info_ref[0, 0] = info[0, 0]

    # backward substitution for U^{-1}: for i = r-1..0,
    #   Y[i, :] = (e_i - sum_{k>i} U[i,k] Y[k, :]) / U[i,i]
    uinv_ref[:] = jnp.zeros_like(uinv_ref)

    def bback(t, _):
        i = r - 1 - t
        u = out_ref[:]
        y = uinv_ref[:]
        urow = jnp.sum(jnp.where(rows == i, u, 0), axis=0, keepdims=True)  # (1, r)
        uii = jnp.sum(jnp.where(cols == i, urow, 0.0), axis=1, keepdims=True)
        safe = jnp.where(uii == 0, jnp.ones_like(uii), uii)
        urow_m = jnp.where(cols > i, urow, jnp.zeros_like(urow))
        # acc[0, c] = sum_{k>i} U[i, k] * Y[k, c]  — one (1,r)x(r,r) matvec
        acc = jnp.dot(urow_m, y, preferred_element_type=jnp.float32)
        ei = (cols == i).astype(jnp.float32)
        yrow = ((ei - acc) / safe).astype(y.dtype)
        uinv_ref[:] = jnp.where(rows == i, yrow, y)
        return 0

    jax.lax.fori_loop(0, r, bback, 0)


def _laswp_kernel(cand_ref, src_ref, slab_in_ref, slab_ref, scratch, sems, *, nswap: int):
    """See laswp_apply.  ``scratch`` is an HBM staging buffer (an extra
    kernel output) so arbitrarily wide exchanges never pressure VMEM;
    HBM->HBM DMAs carry the rows."""
    """Row exchange via overlapped per-row DMAs (the reference's
    `LASWP_kernel`, `MPF.cu:42-59`, as a TPU DMA kernel).

    ``slab_ref`` (aliased to the input) stays in HBM; ``nswap`` rows are
    gathered into VMEM scratch (all DMAs in flight together), then scattered
    back to their destinations.  Gather completes fully before any scatter,
    so colliding sequential swaps read pre-swap data exactly like one
    composed row map.
    """

    nsem = 16  # rolling window of in-flight DMAs (semaphore space is small)

    def gather_dma(i):
        # both buffers are (rows, 1, w): dynamic row indices land on the
        # untiled leading dim (slices of the tiled trailing (row, lane) dims
        # must be 8-row-aligned; leading-dim indexing is unconstrained).
        # Reads go through the INPUT ref (same memory under aliasing;
        # well-defined in interpret mode too).
        return pltpu.make_async_copy(
            slab_in_ref.at[src_ref[i]],
            scratch.at[i],
            sems.at[i % nsem],
        )

    def scatter_dma(i):
        return pltpu.make_async_copy(
            scratch.at[i],
            slab_ref.at[cand_ref[i]],
            sems.at[i % nsem],
        )

    def _run_phase(dma):
        def body(i, _):
            @pl.when(i >= nsem)
            def _():
                dma(i - nsem).wait()

            dma(i).start()
            return 0

        jax.lax.fori_loop(0, nswap, body, 0)

        def drain(i, _):
            @pl.when(i >= max(nswap - nsem, 0))
            def _():
                dma(i).wait()

            return 0

        jax.lax.fori_loop(max(nswap - nsem, 0), nswap, drain, 0)

    _run_phase(gather_dma)   # all gathers complete before any scatter
    _run_phase(scatter_dma)


def _laswp_kernel_v(cand_ref, src_ref, slab_in_ref, slab_ref, stage_ref, sems, *, nswap: int):
    return _laswp_kernel(
        cand_ref, src_ref, slab_in_ref, slab_ref, stage_ref, sems, nswap=nswap
    )


@functools.lru_cache(maxsize=64)
def _build_laswp(n: int, w: int, nswap: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(_laswp_kernel_v, nswap=nswap)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # cand, src
            grid=(),
            # the slab must stay in HBM: DMA row slices of VMEM-resident
            # buffers are tiling-constrained (8-row alignment), HBM is not
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),  # staging buffer
            ),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((16,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1, w), dtype),
            jax.ShapeDtypeStruct((nswap, 1, w), dtype),
        ),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def laswp_apply(slab: jax.Array, cand: jax.Array, src: jax.Array):
    """Apply a bounded row exchange to ``slab``: slab[cand[i], :] =
    slab_old[src[i], :].  Duplicate cand entries must carry identical
    sources (the composed-row-map construction guarantees this)."""
    n, w = slab.shape
    out, _ = _build_laswp(n, w, int(cand.shape[0]), slab.dtype.name)(
        cand.astype(jnp.int32), src.astype(jnp.int32), slab.reshape(n, 1, w)
    )
    return out.reshape(n, w)


def _npv_kernel(block_ref, out_ref, info_ref, *, r: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    out_ref[:] = block_ref[:]

    def body(j, info):
        b = out_ref[:]
        colv = jnp.sum(jnp.where(cols == j, b, 0), axis=1, keepdims=True)
        pivval = jnp.sum(jnp.where(rows == j, colv, 0.0), axis=0, keepdims=True)
        info = jnp.where((pivval == 0) & (info == 0), j + 1, info)
        safe = jnp.where(pivval == 0, jnp.ones_like(pivval), pivval)
        mult = jnp.where(rows > j, colv / safe, 0.0)
        urow = jnp.sum(jnp.where(rows == j, b, 0), axis=0, keepdims=True)
        urow_m = jnp.where(cols > j, urow, jnp.zeros_like(urow))
        upd = b - mult * urow_m
        out_ref[:] = jnp.where((cols == j) & (rows > j), mult, upd)
        return info

    info = jax.lax.fori_loop(0, r, body, jnp.zeros((1, 1), jnp.int32))
    info_ref[0, 0] = info[0, 0]


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


@functools.lru_cache(maxsize=64)
def _build_npv_inv(r: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(_npv_inv_kernel, r=r)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, r), dtype),
            jax.ShapeDtypeStruct((r, r), dtype),
            jax.ShapeDtypeStruct((r, r), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
    )


def getf2_npv_inv_block(block: jax.Array):
    """Pallas no-pivot LU of the (r, r) diagonal block with fused triangular
    inverses; returns (lu, linv, uinv, info)."""
    r = block.shape[0]
    lu, linv, uinv, info = _build_npv_inv(r, block.dtype.name)(block)
    return lu, linv, uinv, info[0, 0]


def _tri_inv_kernel(l_in_ref, out_ref, *, r: int):
    """Unit-lower-triangular inverse by Gauss-Jordan accumulation (the
    multipliers of a unit-lower matrix ARE its subdiagonal columns)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    out_ref[:] = (rows == cols).astype(l_in_ref.dtype)

    def body(j, _):
        l = l_in_ref[:]
        colv = jnp.sum(jnp.where(cols == j, l, 0), axis=1, keepdims=True)
        mult = jnp.where(rows > j, colv, 0.0)
        li = out_ref[:]
        lrow = jnp.sum(jnp.where(rows == j, li, 0), axis=0, keepdims=True)
        out_ref[:] = li - mult * lrow
        return 0

    jax.lax.fori_loop(0, r, body, 0)


@functools.lru_cache(maxsize=64)
def _build_tri_inv(r: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(_tri_inv_kernel, r=r)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, r), dtype),
    )


def unit_lower_inv_pallas(l11: jax.Array):
    """Inverse of the unit-lower-triangular (r, r) block (strictly-lower
    entries of ``l11`` are the multipliers; diagonal is implicit 1)."""
    r = l11.shape[0]
    return _build_tri_inv(r, l11.dtype.name)(l11)
