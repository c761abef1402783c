"""Round-3 micro-test: primitives for the s-major packed pivot kernel.

  a: concat(axis=0) of 8 aligned (8, ml) tiles -> (64, ml)
  b: colv3 = G_jc @ stc   ((8,64) const one-hot @ (64, ml) MXU extract)
  c: static row-slice writes of (8, ml) values into a (64, ml) scratch ref
  d: synthetic per-column loop: extract + packed chain + masked update on
     (64, ml), 8 columns per strip, NCOLS columns total -> timing vs the
     flat chain baseline from packtest4.

Usage: python tools/tpu_r3_smajor_test.py [abcd]
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


def k_concat(x_ref, o_ref, scr_ref):
    parts = [x_ref[8 * s:8 * s + 8, 0:ML] for s in range(8)]
    stc = jnp.concatenate(parts, axis=0)
    o_ref[:] = jnp.sum(stc, keepdims=True).reshape(1, 1)


def k_extract(x_ref, o_ref, scr_ref):
    stc = x_ref[0:64, 0:ML]
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    acc = jnp.zeros((1, 1), jnp.float32)

    def body(jc, acc):
        g = ((cols % 8 == jc) & (cols // 8 == rows)).astype(jnp.float32)
        colv3 = jax.lax.dot_general(g, stc, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        return acc + jnp.max(colv3, keepdims=True).reshape(1, 1)

    acc = jax.lax.fori_loop(0, 64, body, acc)
    o_ref[:] = acc


def k_slicewrite(x_ref, o_ref, scr_ref):
    v = x_ref[0:8, 0:ML]
    for j in range(8):
        scr_ref[8 * j:8 * j + 8, :] = v + jnp.float32(j)
    o_ref[:] = jnp.sum(scr_ref[:], keepdims=True).reshape(1, 1)


def k_colloop(x_ref, o_ref, scr_ref, *, ncols):
    """Per-column cost model of the s-major design: G_jc extract (MXU),
    packed chain on (8, ml), tile8 masked update on (64, ml)."""
    stc0 = x_ref[0:64, 0:ML]
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    cols64 = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (8, ML), 1) + \
        jax.lax.broadcasted_iota(jnp.int32, (8, ML), 0) * ML
    pos0 = lanes3
    q64 = (jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0) % 8 ==
           jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1) % 8
           ).astype(jnp.float32)  # Q for ucol_e expansion

    def strip(t, carry):
        stc, pos, acc = carry

        def col(jc, carry):
            stc, pos, acc = carry
            d = t * 8 + jc
            g = ((cols64 % 8 == jc) & (cols64 // 8 == rows8)
                 ).astype(jnp.float32)
            colv3 = jax.lax.dot_general(
                g, stc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cabs = jnp.where(pos >= d, jnp.abs(colv3), -1.0)
            mx = jnp.max(cabs, keepdims=True).reshape(1, 1)
            cp = jnp.min(jnp.where(cabs == mx, pos, M),
                         keepdims=True).reshape(1, 1)
            o1 = jnp.sum(jnp.where(pos == cp, lanes3, 0),
                         keepdims=True).reshape(1, 1)
            pos = jnp.where(pos == d, cp, pos)
            pos = jnp.where(lanes3 == o1, d, pos)
            pivval = jnp.sum(jnp.where(lanes3 == o1, colv3, 0.0),
                             keepdims=True).reshape(1, 1)
            safe = jnp.where(pivval == 0, 1.0, pivval)
            mult3 = jnp.where(pos > d, colv3 / safe, 0.0)
            # in-strip update: stc -= ucol_e * tile8(mult3)
            oh = (lanes3 == o1).astype(jnp.float32)
            oh8 = jnp.concatenate([oh] * 8, axis=0)          # (64, ml)
            prod = jnp.where(oh8 != 0, stc, 0.0)
            rs = jnp.sum(prod, axis=1, keepdims=True)        # (64, 1)
            ucol_e = jnp.dot(q64, rs, preferred_element_type=jnp.float32)
            m8 = jnp.concatenate([mult3] * 8, axis=0)        # (64, ml)
            stc = stc - ucol_e * m8
            acc = acc + mx * 1e-9
            return stc, pos, acc

        carry = (stc, pos, acc)
        for jc in range(8):
            carry = col(jc, carry)
        return carry

    stc, pos, acc = jax.lax.fori_loop(
        0, ncols // 8, strip, (stc0, pos0, jnp.zeros((1, 1), jnp.float32)))
    o_ref[:] = acc + jnp.sum(pos.astype(jnp.float32),
                             keepdims=True).reshape(1, 1) * 0.0


def build(kernel, **kw):
    return pl.pallas_call(
        functools.partial(kernel, **kw) if kw else kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((64, ML), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )


CASES = {
    "a": ("concat_tiles", k_concat, {}),
    "b": ("mxu_extract", k_extract, {}),
    "c": ("slice_writes", k_slicewrite, {}),
    "d": ("colloop_smajor", k_colloop, {"ncols": NCOLS}),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "abcd"
    x = jnp.asarray(np.random.randn(64, M), jnp.float32)
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
