"""Round-5 micro: minimum HBM row-DMA granule for exchange-style window RMW.

The combined exchange (`ops/exchange.py`) moves 16-row (bf16) / 8-row (fp32)
granule windows to overlay 1-2 rows — the measured 64k-uniform bound
(~520 ms of granule-window traffic, STATUS round-4 open items).  But
`panel_pallas.laswp_apply` (chip-proven, fp32) DMAs SINGLE rows through a
3D (n, 1, w) view: dynamic indices land on the untiled leading dim, and the
tiled trailing dims stay whole.  The round-3 Mosaic rejection of bf16 row
slices said "must be aligned to tiling (2)" — suggesting a (n/2, 2, w) bf16
pair view gives granule 2, an 8x cut of the exchange's granule waste.

Legs (each: E window visits/launch, read-modify-write pipeline of depth D,
fingerprint timing with tunnel RTT subtracted, exact correctness check):

  g16       bf16 (n, w) 2D ref, 16-row windows           (current exchange)
  pair_dN   bf16 (n/2, 2, w) 3D ref, 2-row windows, depth N
  row32_dN  fp32 (n, 1, w) 3D ref, 1-row windows, depth N
  pgath_dN  bf16 pair view, read-only visits (A2-gather shape), depth N

Usage: python tools/tpu_granule_r5.py [W]
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 16384
W = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
E = 2048


def _rmw_kernel(ids_ref, a_in_ref, a_ref, rbuf, wbuf, rsem, wsem,
                *, e: int, d: int, g: int):
    """Visit e windows (ids sorted, distinct): read (g, w), add 1 to every
    element, write back.  Depth-d software pipeline: d reads + d writes in
    flight (separate read/write rings so a slot's write overlaps the next
    read into the other ring)."""

    def rd(i, slot):
        return pltpu.make_async_copy(a_ref.at[ids_ref[i]], rbuf.at[slot],
                                     rsem.at[slot])

    def wr(i, slot):
        return pltpu.make_async_copy(wbuf.at[slot], a_ref.at[ids_ref[i]],
                                     wsem.at[slot])

    for i in range(d):
        rd(i, i).start()

    def body(i, c):
        slot = i % d
        rd(i, slot).wait()
        v = rbuf[slot]

        @pl.when(i >= d)
        def _():
            wr(i - d, slot).wait()

        wbuf[slot] = (v.astype(jnp.float32) + 1.0).astype(wbuf.dtype)
        wr(i, slot).start()

        @pl.when(i + d < e)
        def _():
            rd(i + d, slot).start()

        return c

    jax.lax.fori_loop(0, e, body, jnp.int32(0))
    for slot in range(d):
        i = e - d + slot

        @pl.when((i >= 0) & (i >= e - d))
        def _():
            wr(jnp.maximum(i, 0), (jnp.maximum(i, 0)) % d).wait()


def _gath_kernel(ids_ref, a_in_ref, a_ref, o_ref, rbuf, acc, rsem, osem,
                 *, e: int, d: int, g: int):
    """Read-only visits: read (g, w) window, mask-extract row ids%g, sum."""
    grows = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    acc[...] = jnp.zeros_like(acc)

    def rd(i, slot):
        return pltpu.make_async_copy(a_ref.at[ids_ref[i]], rbuf.at[slot],
                                     rsem.at[slot])

    for i in range(d):
        rd(i, i).start()

    def body(i, c):
        slot = i % d
        rd(i, slot).wait()
        acc[...] += jnp.sum(
            jnp.where(grows == i % g, rbuf[slot].astype(jnp.float32), 0.0),
            axis=0, keepdims=True,
        )

        @pl.when(i + d < e)
        def _():
            rd(i + d, slot).start()

        return c

    jax.lax.fori_loop(0, e, body, jnp.int32(0))
    o_ref[...] = acc[...]


@functools.lru_cache(maxsize=None)
def build_rmw(nwin: int, g: int, w: int, dname: str, d: int):
    dt = jnp.dtype(dname)
    kern = functools.partial(_rmw_kernel, e=E, d=d, g=g)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((d, g, w), dt),
                pltpu.VMEM((d, g, w), dt),
                pltpu.SemaphoreType.DMA((d,)),
                pltpu.SemaphoreType.DMA((d,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nwin, g, w), dt),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(2 * d * g * w * dt.itemsize + (16 << 20)),
            has_side_effects=True,
        ),
    )


@functools.lru_cache(maxsize=None)
def build_gath(nwin: int, g: int, w: int, dname: str, d: int):
    dt = jnp.dtype(dname)
    kern = functools.partial(_gath_kernel, e=E, d=d, g=g)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((d, g, w), dt),
                pltpu.VMEM((1, w), jnp.float32),
                pltpu.SemaphoreType.DMA((d,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nwin, g, w), dt),
            jax.ShapeDtypeStruct((1, w), jnp.float32),
        ),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(d * g * w * dt.itemsize + (16 << 20)),
            has_side_effects=True,
        ),
    )


def main():
    rng = np.random.default_rng(0)
    null = jax.jit(lambda v: v + 1.0)
    for _ in range(3):
        float(null(jnp.float32(1)))
    t0 = time.perf_counter()
    for _ in range(4):
        float(null(jnp.float32(1)))
    rtt = (time.perf_counter() - t0) / 4
    print(f"rtt {rtt*1e3:.1f} ms; N={N} W={W} E={E}", flush=True)

    R = 8
    legs = [
        ("g16_d4", "rmw", jnp.bfloat16, 16, 4),
        ("pair_d4", "rmw", jnp.bfloat16, 2, 4),
        ("pair_d8", "rmw", jnp.bfloat16, 2, 8),
        ("pair_d16", "rmw", jnp.bfloat16, 2, 16),
        ("row32_d8", "rmw", jnp.float32, 1, 8),
        ("row32_d16", "rmw", jnp.float32, 1, 16),
        ("g16gath_d4", "gath", jnp.bfloat16, 16, 4),
        ("pgath_d8", "gath", jnp.bfloat16, 2, 8),
        ("pgath_d16", "gath", jnp.bfloat16, 2, 16),
    ]
    for name, kind, dt, g, d in legs:
        try:
            nwin = N // g
            ids_np = np.sort(rng.choice(nwin, size=E, replace=False))
            ids = jnp.asarray(ids_np, jnp.int32)
            bytes_vis = g * W * jnp.dtype(dt).itemsize * (2 if kind == "rmw"
                                                          else 1)
            if kind == "rmw":
                fn = build_rmw(nwin, g, W, jnp.dtype(dt).name, d)

                def rep(a3):
                    def body(i, a):
                        return fn(ids, a)
                    return jax.lax.fori_loop(0, R, body, a3)

                jrep = jax.jit(rep, donate_argnums=(0,))
                a = jnp.zeros((nwin, g, W), dt)
                out = jrep(a)
                # correctness: visited windows = +R, others 0
                chk = np.asarray(out[:, 0, 0], np.float32)
                exp = np.zeros(nwin, np.float32)
                exp[ids_np] = R
                ok = bool(np.array_equal(chk, exp))
                a = jnp.zeros((nwin, g, W), dt)
                dts = []
                for _ in range(3):
                    t1 = time.perf_counter()
                    a = jrep(a)
                    jax.block_until_ready(a)
                    dts.append(time.perf_counter() - t1)
                del a, out
            else:
                fn = build_gath(nwin, g, W, jnp.dtype(dt).name, d)

                def rep(a3):
                    def body(i, c):
                        a, s = c
                        a, o = fn(ids, a)
                        return a, s + o[0, 0]
                    return jax.lax.fori_loop(0, R, body,
                                             (a3, jnp.float32(0)))[1]

                jrep = jax.jit(rep)
                a = jnp.ones((nwin, g, W), dt)
                s = float(jrep(a))
                ok = abs(s - R * E) < 1e-3
                dts = []
                for _ in range(3):
                    t1 = time.perf_counter()
                    s = float(jrep(a))
                    dts.append(time.perf_counter() - t1)
                del a
            per = max(min(dts) - rtt, 0.0) / R / E
            gbs = bytes_vis / per / 1e9 if per > 0 else float("inf")
            print(f"{name:11s}: {per*1e9:9.1f} ns/visit  "
                  f"({bytes_vis/1024:.0f} KB -> {gbs:7.1f} GB/s)  ok={ok}",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            msg = " ".join(str(ex).split())[:260]
            print(f"{name:11s}: FAIL {type(ex).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
