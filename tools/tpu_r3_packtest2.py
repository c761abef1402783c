"""Round-3 micro-test 2: which (1, m) <-> (8, m/8) repack mechanisms does
compiled Mosaic accept, and what do they cost?

Variants:
  a. pack via value lane-slices + concat axis=0
  b. unpack via value sublane-slices + concat axis=1
  c. pack via 8 stores into an (8, ml) scratch ref + one load
  d. unpack via 8 lane-offset stores into a (1, m) scratch ref + one load
  e. full synthetic chain with ref-roundtrip boundaries (c+d), timed
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 32768
ML = M // 8
NCOLS = 128


def k_pack_concat(x_ref, o_ref, pk_ref):
    v = x_ref[0:1, :]
    v3 = jnp.concatenate([v[:, s * ML:(s + 1) * ML] for s in range(8)], axis=0)
    o_ref[:] = jnp.sum(v3, keepdims=True).reshape(1, 1)


def k_unpack_concat(x_ref, o_ref, pk_ref):
    v3 = x_ref[0:8, 0:ML]
    v = jnp.concatenate([v3[s:s + 1, :] for s in range(8)], axis=1)
    o_ref[:] = jnp.sum(v, keepdims=True).reshape(1, 1)


def k_pack_ref(x_ref, o_ref, pk_ref):
    v = x_ref[0:1, :]
    for s in range(8):
        pk_ref[s:s + 1, 0:ML] = v[:, s * ML:(s + 1) * ML]
    v3 = pk_ref[0:8, 0:ML]
    o_ref[:] = jnp.sum(v3, keepdims=True).reshape(1, 1)


def k_unpack_ref(x_ref, o_ref, pk_ref):
    v3 = x_ref[0:8, 0:ML]
    for s in range(8):
        pk_ref[0:1, s * ML:(s + 1) * ML] = v3[s:s + 1, :]
    v = pk_ref[0:1, :]
    o_ref[:] = jnp.sum(v, keepdims=True).reshape(1, 1)


def k_chain_refpack(x_ref, o_ref, pk_ref, up_ref, *, ncols):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    for s in range(8):
        pk_ref[s:s + 1, 0:ML] = lanes[:, s * ML:(s + 1) * ML]
    lanes3 = pk_ref[0:8, 0:ML]
    pos = lanes3
    acc = jnp.zeros((1, 1), jnp.float32)

    def body(j, carry):
        pos, acc = carry
        colv = x_ref[0:1, :]
        for s in range(8):
            pk_ref[s:s + 1, 0:ML] = colv[:, s * ML:(s + 1) * ML].astype(jnp.int32)
        colv3 = pk_ref[0:8, 0:ML].astype(jnp.float32)
        d = j
        cabs = jnp.where(pos >= d, jnp.abs(colv3 + acc), -1.0)
        mx = jnp.max(cabs, keepdims=True).reshape(1, 1)
        cp = jnp.min(jnp.where((cabs == mx) & (pos >= d), pos, M),
                     keepdims=True).reshape(1, 1)
        o1 = jnp.sum(jnp.where(pos == cp, lanes3, 0), keepdims=True).reshape(1, 1)
        pos = jnp.where(pos == d, cp, pos)
        pos = jnp.where(lanes3 == o1, d, pos)
        pivval = jnp.sum(jnp.where(lanes3 == o1, colv3, 0.0),
                         keepdims=True).reshape(1, 1)
        safe = jnp.where(pivval == 0, 1.0, pivval)
        mult3 = jnp.where(pos > d, colv3 / safe, 0.0)
        for s in range(8):
            up_ref[0:1, s * ML:(s + 1) * ML] = mult3[s:s + 1, :]
        mult = up_ref[0:1, :]
        acc = acc + jnp.sum(mult[:, :128], keepdims=True).reshape(1, 1) * 1e-9
        return pos, acc

    pos, acc = jax.lax.fori_loop(0, ncols, body, (pos, acc))
    o_ref[:] = acc


def build(kernel, nscratch=1, **kw):
    scr = [pltpu.VMEM((8, M), jnp.int32)]
    if nscratch == 2:
        scr = [pltpu.VMEM((8, ML), jnp.int32), pltpu.VMEM((1, M), jnp.float32)]
    return pl.pallas_call(
        functools.partial(kernel, **kw) if kw else kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=scr,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )


def main():
    x = jnp.asarray(np.random.randn(8, M), jnp.float32)
    cases = [
        ("a_pack_concat", build(k_pack_concat)),
        ("b_unpack_concat", build(k_unpack_concat)),
        ("c_pack_ref", build(k_pack_ref)),
        ("d_unpack_ref", build(k_unpack_ref)),
        ("e_chain_refpack", build(k_chain_refpack, nscratch=2, ncols=NCOLS)),
    ]
    for name, fn in cases:
        try:
            jfn = jax.jit(fn)
            t0 = time.time()
            r = jfn(x)
            v = float(r[0, 0])
            print(f"{name}: OK compile {time.time()-t0:.1f}s val={v:.4g}")
            t0 = time.time()
            for _ in range(8):
                r = jfn(x)
            float(r[0, 0])
            print(f"{name}: {(time.time()-t0)/8*1e3:.2f} ms/call")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
