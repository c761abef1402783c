"""Pair-layout (natively-3D) working-matrix kernels (round 5).

The 64k-uniform north star is bound by the physical row exchange: a 2D
bf16 (n, n) XLA buffer tiles 16 HBM rows per DMA granule, so every visited
exchange window streams 16 full rows (r+w) to move 1-2 — ~520 ms of pure
granule waste per factorization on the pivot-heavy corpus
(`matrix_generator.cpp:66` uniform inputs; STATUS round-4 byte model).
`tools/tpu_granule_r5.py` measured a natively-3D (n/2, 2, n) bf16 buffer
moving 2-row windows at HBM bandwidth (688 GB/s), and
`tools/tpu_3d_micro.py` gates the one Mosaic primitive everything here
rests on: LEADING-dim reshapes of 3D VMEM values ((c, 2, w) <-> (2c, w))
are layout no-ops.

XLA reshapes between the 2D and 3D layouts MATERIALIZE a relayout copy
(measured: +608 ms per call at n=32768 — `tools/tpu_refview_r5.py`), so
the pair layout runs END-TO-END: the driver (`models/mpf._factorize_3d`)
keeps the working matrix (n/2, 2, n) from generator input to the returned
factors, and these kernels bridge to the chip-proven 2D panel kernels by
reshaping in VMEM at stream bandwidth:

  * :func:`slab_extract` / :func:`slab_writeback` — the per-block-column
    (m, bc) slab stays 2D, so `ops/panel_strip.py`, `rowblock_assemble`,
    and the streaming update run UNCHANGED (bit-identical panel work);
  * :func:`band_write_rows` — streams the exchange kernel's fp32 pivot-row
    staging into the band rows of the 3D matrix, fusing the ``u_all``
    (diagonal/U12 rowblock) overlay that the 2D driver applies as a
    second dynamic_update_slice;
  * :func:`u12_transform` — in-place U12 := L11^{-1} A12 on the 3D matrix
    (the 2D path's `jnp.dot` + DUS would require two 128 MB relayouts per
    block column);
  * :func:`trailing_sub3` — the epilogue-fused trailing GEMM
    (`panel_fused.trailing_gemm_sub`) on 3D operands, same tile schedule.

All kernels are bit-exact vs their 2D counterparts given identical inputs
(reshapes and DMAs move bits; the dots run the same Mosaic ops on the same
values) — the driver-level parity tests assert it.  Row semantics match
the reference LASWP/TRSM/GEMM pipeline (`MPF.cu:42-59`, `MPF.cu:215-239`);
the layout is transparent to the factorization's math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _collapse(v):
    """(c, 2, w) -> (2c, w) leading-dim merge (VMEM layout no-op)."""
    c, two, w = v.shape
    return v.reshape(2 * c, w)


def _split(v):
    """(2c, w) -> (c, 2, w) leading-dim split (VMEM layout no-op)."""
    r, w = v.shape
    return v.reshape(r // 2, 2, w)


# --------------------------------------------------------------------------
# slab extract / writeback: 3D matrix <-> 2D block-column slab
# --------------------------------------------------------------------------

def _extract_kernel(a_ref, o_ref):
    o_ref[:] = _collapse(a_ref[:])


def _writeback_kernel(s_ref, a_in_ref, o_ref):
    o_ref[:] = _split(s_ref[:])


def _chunk_rows(m: int, k0: int) -> int:
    """Largest streaming chunk that tiles the slab rows AND starts
    block-aligned at ``k0`` (test-scale slabs are 128-quantized)."""
    return next(c for c in (2048, 1024, 512, 256, 128, 64, 32, 16, 8, 2)
                if m % c == 0 and k0 % c == 0)


@functools.lru_cache(maxsize=256)
def _build_extract(npair: int, ncols: int, m: int, bc: int, k0: int, k: int,
                   dtype_name: str, interpret: bool = False):
    dt = jnp.dtype(dtype_name)
    ch = _chunk_rows(m, k0)
    assert m % ch == 0 and k0 % ch == 0 and k % bc == 0, (m, ch, k0, k, bc)
    i0 = k0 // ch
    jb = k // bc
    return pl.pallas_call(
        _extract_kernel,
        grid=(m // ch,),
        in_specs=[pl.BlockSpec((ch // 2, 2, bc), lambda i: (i0 + i, 0, jb),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ch, bc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, bc), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(4 * ch * bc * dt.itemsize + (16 << 20)),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=256)
def _build_writeback(npair: int, ncols: int, m: int, bc: int, k0: int,
                     k: int, dtype_name: str, interpret: bool = False):
    dt = jnp.dtype(dtype_name)
    ch = _chunk_rows(m, k0)
    assert m % ch == 0 and k0 % ch == 0 and k % bc == 0, (m, ch, k0, k, bc)
    i0 = k0 // ch
    jb = k // bc
    return pl.pallas_call(
        _writeback_kernel,
        grid=(m // ch,),
        in_specs=[
            pl.BlockSpec((ch, bc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # slab
            pl.BlockSpec((ch // 2, 2, bc), lambda i: (i0 + i, 0, jb),
                         memory_space=pltpu.VMEM),            # a3 (aliased)
        ],
        out_specs=pl.BlockSpec((ch // 2, 2, bc), lambda i: (i0 + i, 0, jb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npair, 2, ncols), dt),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(6 * ch * bc * dt.itemsize + (16 << 20)),
        ),
        interpret=interpret,
    )


def slab_extract(a3, k0: int, k: int, m: int, bc: int, interpret=False):
    """(m, bc) 2D slab = a3 rows [k0, k0+m), columns [k, k+bc) — the
    pair-layout analogue of the 2D driver's ``a[k0:, k:k+bc]`` slice (one
    streamed copy either way; the reshape rides the VMEM hop)."""
    npair, _, ncols = a3.shape
    return _build_extract(npair, ncols, m, bc, int(k0), int(k),
                          a3.dtype.name, interpret)(a3)


def slab_writeback(a3, sub, k0: int, k: int, interpret=False):
    """a3[k0:k0+m, k:k+bc] = sub (2D (m, bc)), in place."""
    npair, _, ncols = a3.shape
    m, bc = sub.shape
    return _build_writeback(npair, ncols, m, bc, int(k0), int(k),
                            a3.dtype.name, interpret)(sub, a3)


# --------------------------------------------------------------------------
# band write: fp32 pivot-row staging -> band rows of the 3D matrix
# --------------------------------------------------------------------------

def _band_write_kernel(kmeta_ref, piv_ref, a_in_ref, a_ref,
                       rbuf, wbuf, rsem, wsem, *, nr: int, w: int):
    f32 = jnp.float32
    k = kmeta_ref[0]
    nbat = nr // 8

    def rd(b, slot):
        return pltpu.make_async_copy(
            piv_ref.at[pl.ds(pl.multiple_of(b * 8, 8), 8)], rbuf.at[slot],
            rsem.at[slot],
        )

    def wr(b, slot):
        return pltpu.make_async_copy(
            wbuf.at[slot], a_ref.at[pl.ds(k // 2 + b * 4, 4)], wsem.at[slot],
        )

    rd(0, 0).start()

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nbat)
        def _():
            rd(b + 1, 1 - slot).start()

        rd(b, slot).wait()

        @pl.when(b >= 2)
        def _():  # slot reuse: batch b-2's write must have landed
            wr(b - 2, slot).wait()

        v = rbuf[slot].reshape(8, w).astype(f32)
        wbuf[slot] = _split(v.astype(wbuf.dtype))
        wr(b, slot).start()
        return 0

    jax.lax.fori_loop(0, nbat, body, 0)
    for s in range(2):
        b = nbat - 2 + s
        if b >= 0:
            wr(b, b % 2).wait()


@functools.lru_cache(maxsize=64)
def _build_band_write(npair: int, ncols: int, nr: int, dtype_name: str,
                      interpret: bool = False):
    dt = jnp.dtype(dtype_name)
    assert nr % 8 == 0, nr
    f32 = jnp.float32
    kernel = functools.partial(_band_write_kernel, nr=nr, w=ncols)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # kmeta (1,) = [k]
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # piv3 (nr, 1, w) f32
                pl.BlockSpec(memory_space=pl.ANY),      # a3
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 8, 1, ncols), f32),      # read ring
                pltpu.VMEM((2, 4, 2, ncols), dt),       # write ring
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((npair, 2, ncols), dt),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                16 * ncols * 4 + 16 * ncols * dt.itemsize + (24 << 20)
            ),
            has_side_effects=True,
        ),
        interpret=interpret,
    )


def band_write_rows(a3, piv3, k, interpret=False):
    """a3[k + j] = piv3[j] for j in [0, nr) — the pair-layout analogue of
    the 2D driver's pivrows dynamic_update_slice (the caller overlays the
    finished ``u_all`` rowblock on columns [k, k+nr) afterwards, exactly
    like the 2D loop's second DUS).  ``piv3`` is the exchange kernel's
    (nr, 1, w) fp32 staging (bf16 values round-trip exactly); ``k`` may be
    traced (kernel instances are shape-keyed)."""
    npair, _, ncols = a3.shape
    nr = int(piv3.shape[0])
    kmeta = jnp.asarray(k, jnp.int32).reshape(1)
    return _build_band_write(npair, ncols, nr, a3.dtype.name, interpret)(
        kmeta, piv3, a3
    )


# --------------------------------------------------------------------------
# U12 transform: a3[ks:ks+kw, e:e+w] = linv @ a3[ks:ks+kw, e:e+w], in place
# --------------------------------------------------------------------------

def _u12_kernel(linv_ref, a_ref, o_ref, *, kw: int, t: int, prec):
    f32 = jnp.float32
    u = jnp.dot(linv_ref[:], _collapse(a_ref[:]).astype(linv_ref.dtype),
                preferred_element_type=f32, precision=prec)
    o_ref[:] = _split(u.astype(o_ref.dtype))


@functools.lru_cache(maxsize=256)
def _build_u12(npair: int, ncols: int, ks: int, kw: int, e: int, w: int,
               dtype_name: str, linv_dtype_name: str, prec_name: str,
               interpret: bool = False):
    dt = jnp.dtype(dtype_name)
    ldt = jnp.dtype(linv_dtype_name)
    t = next(c for c in (1024, 512, 256, 128, 64, 32, 16, 8)
             if w % c == 0 and e % c == 0)
    assert ks % kw == 0 and e % t == 0 and w % t == 0, (ks, kw, e, w, t)
    # Mosaic's dot lowering supports DEFAULT/HIGHEST only (no 3-pass HIGH
    # primitive — "Unsupported dot precision: HIGH"); fp32-working callers
    # that resolved HIGH (the round-5 `config.u12_precision` default) get
    # the 6-pass dot here.  Chip parity A/Bs vs the 2D path must pin
    # MPF_U12_PREC=highest so both sides run the same dot.
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
            "none": None}[prec_name]
    i0 = ks // kw
    j0 = e // t
    kernel = functools.partial(_u12_kernel, kw=kw, t=t, prec=prec)
    return pl.pallas_call(
        kernel,
        grid=(w // t,),
        in_specs=[
            pl.BlockSpec((kw, kw), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),            # linv
            pl.BlockSpec((kw // 2, 2, t), lambda j: (i0, 0, j0 + j),
                         memory_space=pltpu.VMEM),            # A12 tile
        ],
        out_specs=pl.BlockSpec((kw // 2, 2, t), lambda j: (i0, 0, j0 + j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npair, 2, ncols), dt),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                kw * kw * ldt.itemsize + 4 * kw * t * 4 + (32 << 20)
            ),
        ),
        interpret=interpret,
    )


def u12_transform(a3, linv, ks: int, e: int, w: int, prec, interpret=False):
    """In-place U12 solve on the pair-layout matrix: rows [ks, ks+kw),
    columns [e, e+w) become ``linv @ A12`` (the reference's cublasDtrsm,
    `MPF.cu:215-225`).  ``prec`` follows the 2D path's
    ``config.u12_precision`` resolution."""
    npair, _, ncols = a3.shape
    kw = int(linv.shape[0])
    pname = ("none" if prec is None
             else str(prec).split(".")[-1].lower())
    return _build_u12(npair, ncols, int(ks), kw, int(e), int(w),
                      a3.dtype.name, linv.dtype.name, pname, interpret)(
        linv, a3
    )


# --------------------------------------------------------------------------
# trailing GEMM: a3[ko:ko+m, ko:ko+ncols] -= l21 @ u12, epilogue-fused
# --------------------------------------------------------------------------

def _trailing_sub3_kernel(l_ref, u_ref, a_ref, out_ref, *, hi):
    f32 = jnp.float32
    acc = jnp.dot(_collapse(l_ref[:]), _collapse(u_ref[:]),
                  preferred_element_type=f32, precision=hi)
    out_ref[:] = (a_ref[:].astype(f32) - _split(acc)).astype(out_ref.dtype)


@functools.lru_cache(maxsize=512)
def _build_trailing_sub3(npair: int, ncols: int, ko: int, row0: int,
                         mrows: int, m: int, kk: int, dtype_name: str,
                         gemm_dtype_name: str, ti: int = 1024,
                         interpret: bool = False, t: int = 1024):
    """Pair-layout `panel_fused._build_trailing_sub`: same tile schedule,
    operands and the in-place output as (x/2, 2, y) blocks collapsed for
    the MXU dot (bit-identical values — the reshape is a layout no-op)."""
    w = jnp.dtype(dtype_name)
    gd = jnp.dtype(gemm_dtype_name)
    assert mrows % ti == 0 and row0 % ti == 0 and m % t == 0 and ko % t == 0, (
        mrows, row0, m, ko, ti, t)
    hi = jax.lax.Precision.HIGHEST if gd == jnp.float32 else None
    kernel = functools.partial(_trailing_sub3_kernel, hi=hi)
    kbi = row0 // ti
    kbj = ko // t
    return pl.pallas_call(
        kernel,
        grid=(mrows // ti, m // t),
        in_specs=[
            pl.BlockSpec((ti // 2, 2, kk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # L21 row tile
            pl.BlockSpec((kk // 2, 2, t), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),            # U12 col tile
            pl.BlockSpec((ti // 2, 2, t), lambda i, j: (kbi + i, 0, kbj + j),
                         memory_space=pltpu.VMEM),            # a22 tile
        ],
        out_specs=pl.BlockSpec((ti // 2, 2, t),
                               lambda i, j: (kbi + i, 0, kbj + j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npair, 2, ncols), w),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                2 * 2 * ti * t * max(w.itemsize, 2)
                + 2 * (ti + t) * kk * gd.itemsize + (32 << 20)
            ),
        ),
        interpret=interpret,
    )


def trailing_sub3(a3, l21_3, u12_3, ko, interpret=False, _ti=None,
                  ncols=None):
    """Pair-layout `panel_fused.trailing_gemm_sub`: in-place
    a3[ko:ko+m, ko:ko+ncols] -= l21 @ u12 with the subtract fused into the
    GEMM epilogue; identical segment/tile selection at benchmark shapes
    (4096-aligned core + 1024-tile edges), with a small-shape tier the 2D
    path doesn't need (it falls back to a jnp dot below 1024-multiples;
    the pair layout has no XLA fallback — a 2D<->3D reshape relayouts)."""
    from mpf_tpu.ops.panel_fused import _TRAILING_TI, _trailing_segments

    npair, _, ncmat = a3.shape
    mp, _, kk = l21_3.shape
    m = 2 * mp
    if ncols is None:
        ncols = m
    assert u12_3.shape == (kk // 2, 2, ncols), (u12_3.shape, kk, ncols)
    ko = int(ko)
    w_item = jnp.dtype(a3.dtype).itemsize
    gd_item = jnp.dtype(l21_3.dtype).itemsize
    # edge tier: largest tile that aligns both the region start and size
    edge = next(c for c in (1024, 512, 256, 128, 64, 32, 16, 8)
                if ko % c == 0 and m % c == 0)

    def _max_ti(t):
        # 44 MB operand budget (was 72): Mosaic's scoped-vmem need also
        # carries the f32 accumulator + f32 epilogue cast (~2*ti*t*4) on
        # top of the double-buffered operand tiles — ti=4096/t=1024/kk=1024
        # bf16 measured 101.79M against an 84M limit at the 64k driver
        # shapes (tools/tpu_p3bisect_r5.py sub3 leg); ti=2048 fits.
        ti = _ti or _TRAILING_TI
        while ti > edge and (
            2 * 2 * ti * t * max(w_item, 2) + 2 * (ti + t) * kk * gd_item
            > (44 << 20)
        ):
            ti //= 2
        return max(ti, edge)

    tcands = ((1024, 512) if kk > 1024
              else (1024, 512, 256, 128, 64, 32, 16, 8))
    ti, t = max(
        ((_max_ti(tc), tc) for tc in tcands
         if ncols % tc == 0 and ko % tc == 0),
        key=lambda p: (p[0], p[1]),
    )
    segs = (_trailing_segments(ko, m, ti) if edge == 1024 and ti >= 1024
            else [(ko, m, ti if m % ti == 0 else edge)])
    for r0, mr, tseg in segs:
        fn = _build_trailing_sub3(
            npair, ncmat, ko, r0, mr, ncols, kk, a3.dtype.name,
            l21_3.dtype.name, tseg, interpret, t,
        )
        a3 = fn(l21_3[(r0 - ko) // 2 : (r0 - ko + mr) // 2], u12_3, a3)
    return a3
