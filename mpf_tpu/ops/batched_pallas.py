"""Grid-parallel batched LU (Pallas TPU kernel, round 2).

[north-star addition — BASELINE.json config 5: 4096 x 256^2 batched LUs.
The reference is strictly single-matrix (`MPF.h:3`).]

TPU grids execute sequentially on one TensorCore, so per-matrix latency
cannot be amortized across grid steps — instead each program factors a
TILE of ``nb`` matrices **vectorized across the batch in the sublane
dimension**: every per-column VPU op runs on (nb, ., n) blocks, and the
cross-strip updates use the same deferred rank-8 formulation as the panel
strip kernel (`ops/panel_strip.py`), with the (8, 8) per-matrix products
expanded into unrolled broadcast-multiply sums (the MXU has no batched
small-matmul form; at these sizes the VPU is the right unit).

Virtual pivoting per matrix (rows never move in-kernel): ``pos``/``perm``
maps are carried per matrix; the physical row permutation is applied by
the caller as ONE batched XLA gather (`take_along_axis`), which XLA
lowers to an efficient per-row DMA copy.

Layout: matrices are transposed in-kernel to (nb, col, row) so per-column
work is lane-major (full 128-lane VPU width), mirroring the single-matrix
panel kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W = 8  # strip width


def _bmm8(a, b):
    """Batched (nb, 8, 8) @ (nb, 8, 8) via unrolled broadcast FMA."""
    acc = a[:, :, 0:1] * b[:, 0:1, :]
    for k in range(1, _W):
        acc = acc + a[:, :, k : k + 1] * b[:, k : k + 1, :]
    return acc


def _batched_lu_kernel(a_ref, lu_ref, piv_ref, perm_ref, info_ref, t_ref,
                       *, n: int, nb: int):
    f32 = jnp.float32

    # transpose each matrix: T[m, col, row]
    for m in range(nb):
        t_ref[m] = jnp.swapaxes(a_ref[m], 0, 1).astype(f32)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    wrows = jax.lax.broadcasted_iota(jnp.int32, (1, _W, 1), 1)
    wlanes8 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _W), 2)
    eye8 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, _W, _W), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (1, _W, _W), 2)
    ).astype(f32)

    pos = jnp.broadcast_to(lanes, (nb, 1, n))
    perm = pos
    piv = pos
    info = jnp.zeros((nb, 1, 1), jnp.int32)
    nstrips = n // _W

    for s in range(nstrips):
        s0 = s * _W
        st = t_ref[:, s0 : s0 + _W, :]                     # (nb, W, n)
        mbuf = jnp.zeros((nb, _W, n), f32)
        olist = jnp.zeros((nb, 1, _W), jnp.int32)

        def col_body(jc, carry, s0=s0):
            st, mbuf, olist, pos, perm, piv, info = carry
            d = s0 + jc
            colv = jnp.sum(jnp.where(wrows == jc, st, 0.0), axis=1,
                           keepdims=True)                   # (nb, 1, n)
            cabs = jnp.where(pos >= d, jnp.abs(colv), f32(-1.0))
            mx = jnp.max(cabs, axis=2, keepdims=True)       # (nb, 1, 1)
            cp = jnp.min(
                jnp.where((cabs == mx) & (pos >= d), pos, n),
                axis=2, keepdims=True,
            )                                               # (nb, 1, 1)
            o = jnp.sum(jnp.where(pos == cp, lanes, 0), axis=2, keepdims=True)
            o2 = jnp.sum(jnp.where(pos == d, lanes, 0), axis=2, keepdims=True)
            pos = jnp.where(lanes == o, d, jnp.where(lanes == o2, cp, pos))
            perm = jnp.where(lanes == d, o, jnp.where(lanes == cp, o2, perm))
            piv = jnp.where(lanes == d, cp, piv)
            olist = jnp.where(wlanes8 == jc, o, olist)
            pivval = jnp.sum(jnp.where(lanes == o, colv, 0.0), axis=2,
                             keepdims=True)                 # (nb, 1, 1)
            info = jnp.where((pivval == 0) & (info == 0), d + 1, info)
            safe = jnp.where(pivval == 0, f32(1), pivval)
            mult = jnp.where(pos > d, colv / safe, 0.0)     # (nb, 1, n)
            mbuf = jnp.where(wrows == jc, mult, mbuf)
            ucol = jnp.sum(jnp.where(lanes == o, st, 0.0), axis=2,
                           keepdims=True)                   # (nb, W, 1)
            ucol = jnp.where(wrows > jc, ucol, 0.0)
            st = st - ucol * mult                           # in-strip elim
            packed = jnp.where(pos > d, mult, colv)         # L below, U at/above
            st = jnp.where(wrows == jc, packed, st)
            return st, mbuf, olist, pos, perm, piv, info

        st, mbuf, olist, pos, perm, piv, info = jax.lax.fori_loop(
            0, _W, col_body, (st, mbuf, olist, pos, perm, piv, info)
        )
        t_ref[:, s0 : s0 + _W, :] = st

        if s + 1 < nstrips:
            # deferred rank-W update (panel_strip.py formulation, batched):
            # T_k -= (T_k S) (I + N)^{-1} M with N[j', j] = M[j', o_j]
            def sel8(src):
                cols = []
                for j in range(_W):
                    oj = olist[:, :, j : j + 1]             # (nb, 1, 1)
                    cols.append(
                        jnp.sum(jnp.where(lanes == oj, src, 0.0), axis=2,
                                keepdims=True)              # (nb, W, 1)
                    )
                return jnp.concatenate(cols, axis=2)        # (nb, W, W)

            nmat = sel8(mbuf)
            vinv = eye8 - nmat
            p = -nmat
            for _ in range(_W - 2):
                p = _bmm8(-nmat, p)
                vinv = vinv + p

            def upd_body(s2, _):
                so = pl.multiple_of(s2 * _W, _W)
                tk = t_ref[:, pl.ds(so, _W), :]
                u = _bmm8(sel8(tk), vinv)                   # (nb, W, W)
                upd = u[:, :, 0:1] * mbuf[:, 0:1, :]
                for j in range(1, _W):
                    upd = upd + u[:, :, j : j + 1] * mbuf[:, j : j + 1, :]
                t_ref[:, pl.ds(so, _W), :] = tk - upd
                return 0

            jax.lax.fori_loop(s + 1, nstrips, upd_body, 0)

    for m in range(nb):
        lu_ref[m] = jnp.swapaxes(t_ref[m], 0, 1).astype(lu_ref.dtype)
    piv_ref[:] = piv[:, 0, :]
    perm_ref[:] = perm[:, 0, :]
    info_ref[:] = info[:, 0, :]


@functools.lru_cache(maxsize=32)
def _build_batched_lu(nbt: int, n: int, nb: int, dtype_name: str,
                      interpret: bool = False):
    w = jnp.dtype(dtype_name)
    kernel = functools.partial(_batched_lu_kernel, n=n, nb=nb)
    return pl.pallas_call(
        kernel,
        grid=(nbt,),
        in_specs=[
            pl.BlockSpec((nb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nbt * nb, n, n), w),
            jax.ShapeDtypeStruct((nbt * nb, n), jnp.int32),
            jax.ShapeDtypeStruct((nbt * nb, n), jnp.int32),
            jax.ShapeDtypeStruct((nbt * nb, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nb, n, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(3 * nb * n * n * 4 + (32 << 20)),
        ),
        interpret=interpret,
    )


def batched_lu(a, nb_tile: int = 8, interpret: bool = False):
    """Partial-pivoted LU of a (B, n, n) fp32 stack.

    Returns ``(lu, ipiv, perm, info)``: packed factors in PHYSICAL (pivoted)
    row order, 1-based pivot positions (B, n) (LAPACK sequential-swap
    convention), the composed row maps (B, n), and per-matrix info.
    """
    bsz, n, n2 = a.shape
    assert n == n2 and n % _W == 0, a.shape
    nb = min(nb_tile, bsz)
    assert bsz % nb == 0, (bsz, nb)
    lu_v, piv, perm, info = _build_batched_lu(
        bsz // nb, n, nb, a.dtype.name, interpret
    )(a)
    # ONE batched physical row permutation (virtual -> pivoted order)
    lu = jnp.take_along_axis(lu_v, perm[:, :, None], axis=1)
    return lu, piv + 1, perm, info[:, 0]
