"""Round-3 micro-test 4: pack variants that avoid the value lane-slice ->
sublane-store pattern (which hangs Mosaic).

  g: pack via memory roundtrip (store (1,m) once; 8 ref->ref row moves)
  h: full chain with g-pack + d-unpack, NCOLS columns (the real shape)
  i: pack via broadcast + pltpu.roll(stride per sublane) + lane slice
  j: chain with i-pack + d-unpack
  f: flat chain baseline
Usage: python tools/tpu_r3_packtest4.py [cases]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 32768
ML = M // 8
NCOLS = 128


def pack_mem(v, pkf_ref, upf_ref):
    upf_ref[:] = v
    for s in range(8):
        pkf_ref[s:s + 1, :] = upf_ref[0:1, s * ML:(s + 1) * ML]
    return pkf_ref[:]


def pack_roll(v):
    # REVERSED-row packing: row s holds v[(7-s)*ML + g] (so the per-sublane
    # roll stride stays positive: right-roll row s by (s+1)*ML).
    b = jnp.broadcast_to(v, (8, M))
    rolled = pltpu.roll(b, ML, 1, stride=ML, stride_axis=0)
    return rolled[:, :ML]


def unpack_d(v3, upf_ref):
    # reversed-row convention to match pack_roll
    for s in range(8):
        upf_ref[0:1, (7 - s) * ML:(8 - s) * ML] = v3[s:s + 1, :]
    return upf_ref[0:1, :]


def k_pack_mem(x_ref, o_ref, pkf_ref, upf_ref):
    v3 = pack_mem(x_ref[0:1, :], pkf_ref, upf_ref)
    o_ref[:] = jnp.sum(v3, keepdims=True).reshape(1, 1)


def k_pack_roll(x_ref, o_ref, pkf_ref, upf_ref):
    v3 = pack_roll(x_ref[0:1, :])
    o_ref[:] = jnp.sum(v3, keepdims=True).reshape(1, 1)


def make_chain(packer):
    def kernel(x_ref, o_ref, pkf_ref, upf_ref, *, ncols):
        srow = jax.lax.broadcasted_iota(jnp.int32, (8, ML), 0)
        if packer == "roll":
            srow = 7 - srow  # reversed-row packing convention
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, ML), 1) + srow * ML
        pos = lanes
        acc = jnp.zeros((1, 1), jnp.float32)

        def body(j, carry):
            pos, acc = carry
            colv = x_ref[0:1, :] + acc
            if packer == "mem":
                colv3 = pack_mem(colv, pkf_ref, upf_ref)
            else:
                colv3 = pack_roll(colv)
            d = j
            cabs = jnp.where(pos >= d, jnp.abs(colv3), -1.0)
            mx = jnp.max(cabs, keepdims=True).reshape(1, 1)
            cp = jnp.min(jnp.where((cabs == mx) & (pos >= d), pos, M),
                         keepdims=True).reshape(1, 1)
            o1 = jnp.sum(jnp.where(pos == cp, lanes, 0),
                         keepdims=True).reshape(1, 1)
            pos = jnp.where(pos == d, cp, pos)
            pos = jnp.where(lanes == o1, d, pos)
            pivval = jnp.sum(jnp.where(lanes == o1, colv3, 0.0),
                             keepdims=True).reshape(1, 1)
            safe = jnp.where(pivval == 0, 1.0, pivval)
            mult3 = jnp.where(pos > d, colv3 / safe, 0.0)
            mult = unpack_d(mult3, upf_ref)
            acc = acc + jnp.sum(mult[:, :128], keepdims=True
                                ).reshape(1, 1) * 1e-9
            return pos, acc

        pos, acc = jax.lax.fori_loop(0, ncols, body, (pos, acc))
        o_ref[:] = acc + jnp.sum(pos.astype(jnp.float32), keepdims=True
                                 ).reshape(1, 1) * 0.0
    return kernel


def k_chain_flat(x_ref, o_ref, pkf_ref, upf_ref, *, ncols):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    pos = lanes
    acc = jnp.zeros((1, 1), jnp.float32)

    def body(j, carry):
        pos, acc = carry
        colv = x_ref[0:1, :] + acc
        d = j
        cabs = jnp.where(pos >= d, jnp.abs(colv), -1.0)
        mx = jnp.max(cabs, keepdims=True).reshape(1, 1)
        cp = jnp.min(jnp.where((cabs == mx) & (pos >= d), pos, M),
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


def build(kernel, **kw):
    return pl.pallas_call(
        functools.partial(kernel, **kw) if kw else kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, ML), jnp.float32),
            pltpu.VMEM((1, M), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )


CASES = {
    "g": ("pack_mem", k_pack_mem, {}),
    "h": ("chain_mempack", make_chain("mem"), {"ncols": NCOLS}),
    "i": ("pack_roll", k_pack_roll, {}),
    "j": ("chain_rollpack", make_chain("roll"), {"ncols": NCOLS}),
    "f": ("chain_flat", k_chain_flat, {"ncols": NCOLS}),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "gihjf"
    x = jnp.asarray(np.random.randn(8, M), jnp.float32)
    for key in which:
        name, kern, kw = CASES[key]
        try:
            jfn = jax.jit(build(kern, **kw))
            t0 = time.time()
            r = jfn(x)
            v = float(r[0, 0])
            print(f"{name}: OK compile {time.time()-t0:.1f}s val={v:.4g}",
                  flush=True)
            t0 = time.time()
            for _ in range(16):
                r = jfn(x)
            float(r[0, 0])
            print(f"{name}: {(time.time()-t0)/16*1e3:.2f} ms/call", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)


if __name__ == "__main__":
    main()
