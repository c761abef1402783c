"""Micro-benchmark: per-entry cost of extracting ONE row (dynamic sublane
index) from a (g, xw) VMEM window — the inner operation of the exchange
kernels (`ops/exchange.py`, `ops/gemmx.py`), executed once per moved row.

Round-3/4 profile: the n=65536 uniform-corpus exchange is 603 ms; the
hypothesis is ~3 VPU passes over (g, xw) per entry (mask + select + sublane
reduce) ~ 3 us/entry * ~4k entries/block column * 64 block columns.  Legs:

  masked   current: sum(where(iota == r, win, 0), axis=0)
  roll     pltpu.roll(win, -r, axis=0) then static row 0 slice
  dot      one-hot (1, g) @ win on the MXU
  dma      single-sublane VMEM->VMEM async copy win[r:r+1] -> out
  store    overlay direction: win = where(iota == r, v, win)
  dstore   overlay via single-sublane VMEM->VMEM DMA into win[r:r+1]

Each leg: E entries per kernel launch, R launches inside one jit (fingerprint
timing, tunnel RTT subtracted).  Usage: python tools/tpu_xsel_micro.py
"""

import os
import sys
import time
import functools

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 2048
XW = 32768
G = 16
DT = jnp.bfloat16


def _kernel(ids_ref, x_ref, o_ref, win, acc, osem, *, mode):
    g = G
    acc[...] = jnp.zeros_like(acc)
    pltpu.make_async_copy(x_ref, win, osem).start()
    pltpu.make_async_copy(x_ref, win, osem).wait()
    grows = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)

    def body(e, c):
        r = ids_ref[e]
        if mode == "masked":
            val = jnp.sum(
                jnp.where(grows == r, win[...].astype(jnp.float32), 0.0),
                axis=0, keepdims=True,
            )
            acc[...] += val
        elif mode == "roll":
            rolled = pltpu.roll(win[...], -r, 0)
            acc[...] += rolled[0:1].astype(jnp.float32)
        elif mode == "dot":
            oh = (grows.reshape(1, g) == r).astype(DT)
            val = jax.lax.dot_general(
                oh, win[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc[...] += val
        elif mode == "store":
            v = (acc[...] + jnp.float32(e)).astype(DT)
            win[...] = jnp.where(grows == r, v, win[...])
        return c

    jax.lax.fori_loop(0, E, body, jnp.int32(0))
    if mode == "store":
        acc[...] = win[...][0:1].astype(jnp.float32)
    o_ref[...] = acc[...]


def _kernel_dma(ids_ref, x_ref, o_ref, win, row, acc, osem, sems, *, mode):
    acc[...] = jnp.zeros_like(acc)
    row[...] = jnp.zeros_like(row)
    pltpu.make_async_copy(x_ref, win, osem).start()
    pltpu.make_async_copy(x_ref, win, osem).wait()

    def body(e, c):
        r = ids_ref[e]
        slot = e % 4
        if mode == "dma":
            cp = pltpu.make_async_copy(
                win.at[pl.ds(r, 1)], row.at[slot], sems.at[slot]
            )
        else:  # dstore
            cp = pltpu.make_async_copy(
                row.at[slot], win.at[pl.ds(r, 1)], sems.at[slot]
            )
        cp.start()
        cp.wait()
        return c

    jax.lax.fori_loop(0, E, body, jnp.int32(0))
    acc[...] = win[...][0:1].astype(jnp.float32) + row[0].astype(jnp.float32)
    o_ref[...] = acc[...]


@functools.lru_cache(maxsize=None)
def build(mode):
    if mode in ("dma", "dstore"):
        kern = functools.partial(_kernel_dma, mode=mode)
        scratch = [
            pltpu.VMEM((G, XW), DT),
            pltpu.VMEM((4, 1, XW), DT),
            pltpu.VMEM((1, XW), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((4,)),
        ]
    else:
        kern = functools.partial(_kernel, mode=mode)
        scratch = [
            pltpu.VMEM((G, XW), DT),
            pltpu.VMEM((1, XW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((1, XW), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, G, size=E), jnp.int32)
    x = jnp.asarray(rng.standard_normal((G, XW)), DT)
    null = jax.jit(lambda v: v + 1.0)
    for _ in range(3):
        float(null(jnp.float32(1)))
    t0 = time.perf_counter()
    for _ in range(4):
        float(null(jnp.float32(1)))
    rtt = (time.perf_counter() - t0) / 4
    print(f"rtt {rtt*1e3:.1f} ms; E={E} xw={XW} g={G} {jnp.dtype(DT).name}",
          flush=True)

    R = 50
    for mode in ("masked", "roll", "dot", "dma", "store", "dstore"):
        try:
            fn = build(mode)

            def rep(x):
                def body(i, s):
                    return s + fn(ids, x)[0, 0]
                return jax.lax.fori_loop(0, R, body, jnp.float32(0))

            g = jax.jit(rep)
            fp = float(g(x))  # compile+run
            dts = []
            for _ in range(3):
                t1 = time.perf_counter()
                fp = float(g(x))
                dts.append(time.perf_counter() - t1)
            dt = max(min(dts) - rtt, 0.0) / R / E
            print(f"{mode:7s}: {dt*1e9:9.1f} ns/entry (fp={fp:.3e})",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            msg = " ".join(str(ex).split())[:300]
            print(f"{mode:7s}: FAIL {type(ex).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
