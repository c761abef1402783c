"""Round-5 micro: feasibility gates for the natively-3D bf16 working layout.

The 64k uniform exchange is bound by 16-row bf16 DMA granule windows
(~520 ms of window traffic).  `tools/tpu_granule_r5.py` proved a natively-3D
(n/2, 2, n) bf16 buffer supports 2-row window RMW at HBM bandwidth (688 GB/s)
— an 8x granule-waste cut — but XLA reshapes between the 2D and 3D layouts
materialize slow relayout copies, so the layout must be 3D END-TO-END through
the factorization.  Every kernel adaptation reduces to one Mosaic question:
do LEADING-dim reshapes of 3D VMEM values compile and run at speed?

Legs:
  collapse   (c, 2, w) bf16 VMEM value -> reshape (2c, w) -> 2D out
  split      (2c, w) bf16 VMEM value -> reshape (c, 2, w) -> 3D out
  tchunk     strip-kernel load path: (ch/2, 2, r) -> reshape (ch, r) ->
             swapaxes -> (r, ch) out (the A1 transposed-panel chunk)
  gemm3d     trailing-GEMM tile: C3 (s/2, 2, w) -= reshape(A3)(s, k) @ B(k, w)
             via VMEM collapse + 2D MXU dot + split, vs the same dot with 2D
             refs (speed parity gate)
  gemm3dg    same via jax.lax.dot_general directly on the 3D value
             (contract dim 2 of (s/2, 2, k) with dim 0 of (k, w))

Usage: python tools/tpu_3d_micro.py [interpret]
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

INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "interpret"


def _copy_reshape_kernel(a_ref, o_ref, buf, obuf, sem, osem, *, mode, c, w):
    cp = pltpu.make_async_copy(a_ref, buf, sem)
    cp.start()
    cp.wait()
    v = buf[...]
    if mode == "collapse":
        o = v.reshape(2 * c, w)
    elif mode == "split":
        o = v.reshape(c, 2, w)
    else:  # tchunk: (c, 2, w) -> (w, 2c) transposed panel chunk
        o = jnp.swapaxes(v.reshape(2 * c, w), 0, 1)
    obuf[...] = o
    cpo = pltpu.make_async_copy(obuf, o_ref, osem)
    cpo.start()
    cpo.wait()


def build_copy_reshape(mode, c, w, dname):
    dt = jnp.dtype(dname)
    ishape = (2 * c, w) if mode == "split" else (c, 2, w)
    oshape = {"collapse": (2 * c, w), "split": (c, 2, w),
              "tchunk": (w, 2 * c)}[mode]
    kern = functools.partial(_copy_reshape_kernel, mode=mode, c=c, w=w)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(ishape, dt), pltpu.VMEM(oshape, dt),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct(oshape, dt),
        interpret=INTERPRET,
    )


def _gemm3d_kernel(a3_ref, b_ref, c3_ref, o_ref, abuf, bbuf, cbuf, obuf,
                   sems, *, s, k, w, form):
    for i, (src, dst) in enumerate(((a3_ref, abuf), (b_ref, bbuf),
                                    (c3_ref, cbuf))):
        cp = pltpu.make_async_copy(src, dst, sems.at[i])
        cp.start()
        cp.wait()
    b = bbuf[...]
    if form == "reshape":
        a2 = abuf[...].reshape(s, k)
        upd = jnp.dot(a2, b, preferred_element_type=jnp.float32)
        o = (cbuf[...].reshape(s, w).astype(jnp.float32) - upd).astype(
            obuf.dtype).reshape(s // 2, 2, w)
    else:  # dot_general on the 3D value
        a3 = abuf[...]
        upd = jax.lax.dot_general(
            a3, b, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (s/2, 2, w)
        o = (cbuf[...].astype(jnp.float32) - upd).astype(obuf.dtype)
    obuf[...] = o
    cp = pltpu.make_async_copy(obuf, o_ref, sems.at[3])
    cp.start()
    cp.wait()


def build_gemm3d(s, k, w, dname, form):
    dt = jnp.dtype(dname)
    kern = functools.partial(_gemm3d_kernel, s=s, k=k, w=w, form=form)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((s // 2, 2, k), dt), pltpu.VMEM((k, w), dt),
            pltpu.VMEM((s // 2, 2, w), dt), pltpu.VMEM((s // 2, 2, w), dt),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        out_shape=jax.ShapeDtypeStruct((s // 2, 2, w), dt),
        interpret=INTERPRET,
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
    print(f"rtt {rtt*1e3:.1f} ms interpret={INTERPRET}", flush=True)

    c, w = 1024, 512
    a2 = rng.standard_normal((2 * c, w)).astype(np.float32)
    for mode in ("collapse", "split", "tchunk"):
        for dname in ("bfloat16", "float32"):
            try:
                av = jnp.asarray(a2, jnp.dtype(dname))
                inp = av if mode == "split" else av.reshape(c, 2, w)
                out = np.asarray(build_copy_reshape(mode, c, w, dname)(inp))
                ref = np.asarray(av)
                if mode == "split":
                    ref = ref.reshape(c, 2, w)
                elif mode == "tchunk":
                    ref = ref.T
                ok = np.array_equal(out, ref)
                print(f"{mode:9s} {dname:9s}: ok={ok}", flush=True)
            except Exception as ex:  # noqa: BLE001
                msg = " ".join(str(ex).split())[:220]
                print(f"{mode:9s} {dname:9s}: FAIL {type(ex).__name__}: {msg}",
                      flush=True)

    s, k, w = 2048, 1024, 2048
    R = 32
    an = rng.standard_normal((s, k)).astype(np.float32)
    bn = rng.standard_normal((k, w)).astype(np.float32)
    cn = rng.standard_normal((s, w)).astype(np.float32)
    for form in ("reshape", "dotg"):
        for dname in ("bfloat16", "float32"):
            try:
                dt = jnp.dtype(dname)
                a3 = jnp.asarray(an, dt).reshape(s // 2, 2, k)
                b = jnp.asarray(bn, dt)
                c3 = jnp.asarray(cn, dt).reshape(s // 2, 2, w)
                fn = build_gemm3d(s, k, w, dname, form)

                def rep(c3v):
                    def body(i, cv):
                        return fn(a3, b, cv)
                    return jax.lax.fori_loop(0, R, body, c3v)

                jrep = jax.jit(rep)
                out = np.asarray(jrep(c3)).reshape(s, w)
                exp = np.asarray(
                    (jnp.asarray(cn, dt).astype(jnp.float32)
                     - R * jnp.dot(jnp.asarray(an, dt).astype(jnp.float32),
                                   jnp.asarray(bn, dt).astype(jnp.float32))
                     ).astype(dt)
                )
                # loose check: R sequential subtract-accumulations round
                err = float(np.max(np.abs(out.astype(np.float32)
                                          - exp.astype(np.float32))))
                scale = float(np.max(np.abs(exp.astype(np.float32)))) + 1e-9
                dts = []
                for _ in range(3):
                    t1 = time.perf_counter()
                    jax.block_until_ready(jrep(c3))
                    dts.append(time.perf_counter() - t1)
                per = max(min(dts) - rtt, 0.0) / R
                tf = 2 * s * k * w / per / 1e12 if per > 0 else float("inf")
                print(f"gemm3d/{form:7s} {dname:9s}: rel={err/scale:.2e} "
                      f"{per*1e6:8.1f} us/iter {tf:6.1f} TF/s", flush=True)
            except Exception as ex:  # noqa: BLE001
                msg = " ".join(str(ex).split())[:220]
                print(f"gemm3d/{form:7s} {dname:9s}: FAIL "
                      f"{type(ex).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
