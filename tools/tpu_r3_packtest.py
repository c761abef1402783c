"""Round-3 micro-test: can compiled Mosaic do (1, m) <-> (8, m/8) repacking
expressed as static lane slices + concat (instead of the rejected shape cast)?

Runs a synthetic per-column search chain at both layouts and times them on
the real chip, so we know the speedup BEFORE rewriting panel_strip.py.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_1m(v, ml):
    # (1, m) -> (8, ml) row-major split via static lane slices + sublane concat
    return jnp.concatenate([v[:, s * ml:(s + 1) * ml] for s in range(8)], axis=0)


def unpack_8(v3, ml):
    # (8, ml) -> (1, m) via sublane slices + lane concat
    return jnp.concatenate([v3[s:s + 1, :] for s in range(8)], axis=1)


def chain_kernel_packed(x_ref, o_ref, *, m, ncols):
    ml = m // 8
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    lanes3 = pack_1m(lanes, ml)
    pos = lanes3
    acc = jnp.zeros((1, 1), jnp.float32)

    def body(j, carry):
        pos, acc = carry
        colv = x_ref[0:1, :]  # (1, m) lane-major source, like st row extract
        colv3 = pack_1m(colv, ml)
        d = j
        cabs = jnp.where(pos >= d, jnp.abs(colv3 + acc), -1.0)
        mx = jnp.max(cabs, keepdims=True).reshape(1, 1)
        cp = jnp.min(jnp.where((cabs == mx) & (pos >= d), pos, m),
                     keepdims=True).reshape(1, 1)
        o1 = jnp.sum(jnp.where(pos == cp, lanes3, 0), keepdims=True).reshape(1, 1)
        pos = jnp.where(pos == d, cp, pos)
        pos = jnp.where(lanes3 == o1, d, pos)
        pivval = jnp.sum(jnp.where(lanes3 == o1, colv3, 0.0),
                         keepdims=True).reshape(1, 1)
        safe = jnp.where(pivval == 0, 1.0, pivval)
        mult3 = jnp.where(pos > d, colv3 / safe, 0.0)
        mult = unpack_8(mult3, ml)           # back to lane-major
        acc = acc + jnp.sum(mult[:, :128], keepdims=True).reshape(1, 1) * 1e-9
        return pos, acc

    pos, acc = jax.lax.fori_loop(0, ncols, body, (pos, acc))
    o_ref[:] = acc + jnp.sum(unpack_8(pos.astype(jnp.float32), ml),
                             keepdims=True).reshape(1, 1) * 0.0


def chain_kernel_flat(x_ref, o_ref, *, m, ncols):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    pos = lanes
    acc = jnp.zeros((1, 1), jnp.float32)

    def body(j, carry):
        pos, acc = carry
        colv = x_ref[0:1, :]
        d = j
        cabs = jnp.where(pos >= d, jnp.abs(colv + acc), -1.0)
        mx = jnp.max(cabs, keepdims=True).reshape(1, 1)
        cp = jnp.min(jnp.where((cabs == mx) & (pos >= d), pos, m),
                     keepdims=True).reshape(1, 1)
        o1 = jnp.sum(jnp.where(pos == cp, lanes, 0), keepdims=True).reshape(1, 1)
        pos = jnp.where(pos == d, cp, pos)
        pos = jnp.where(lanes == o1, d, pos)
        pivval = jnp.sum(jnp.where(lanes == o1, colv, 0.0),
                         keepdims=True).reshape(1, 1)
        safe = jnp.where(pivval == 0, 1.0, pivval)
        mult = jnp.where(pos > d, colv / safe, 0.0)
        acc = acc + jnp.sum(mult[:, :128], keepdims=True).reshape(1, 1) * 1e-9
        return pos, acc

    pos, acc = jax.lax.fori_loop(0, ncols, body, (pos, acc))
    o_ref[:] = acc + jnp.sum(pos.astype(jnp.float32), keepdims=True
                             ).reshape(1, 1) * 0.0


def build(kernel, m, ncols):
    return pl.pallas_call(
        functools.partial(kernel, m=m, ncols=ncols),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )


def main():
    m, ncols, iters = 32768, 128, 8
    x = jnp.asarray(np.random.randn(1, m), jnp.float32)
    for name, kern in [("flat", chain_kernel_flat), ("packed", chain_kernel_packed)]:
        try:
            fn = jax.jit(build(kern, m, ncols))
            t0 = time.time()
            r = fn(x)
            r.block_until_ready()
            print(f"{name}: compiled+first run ok in {time.time()-t0:.1f}s, val={float(r[0,0]):.6g}")
            # time via repeated calls; tunnel RTT ~28ms dominates single calls,
            # so run a loop of many calls and subtract
            t0 = time.time()
            for _ in range(iters):
                r = fn(x)
            float(r[0, 0])
            dt = (time.time() - t0) / iters
            print(f"{name}: {dt*1e3:.2f} ms/call ({ncols} cols at m={m})")
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
