"""Round-4 design probes (one tiny kernel each; run on chip before building
the fused GEMM+exchange machinery).

  smem      scalar-prefetch capacity: how large an int32 schedule array can a
            kernel take? (the round-3 fixup assumed ~2048/launch)
  hbm2smem  does an HBM->SMEM async copy work on this toolchain? (would let
            kernels stream unbounded schedules)
  rowdma    single-row (1, w) fp32 DMA issue throughput with a deep ring —
            the round-3 lazy fixup was bound by these
  overlap   MXU dots with concurrent bulk DMA traffic: how many free bytes
            ride under each matmul (the spare-HBM-bandwidth hypothesis the
            fused trailing-GEMM+exchange kernel rests on)

Usage: python tools/tpu_probe_r4.py CMD [CMD...]   (default: all)
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() != "tpu"


def _sync(x):
    return jax.block_until_ready(x)


# ---------------------------------------------------------------------------
def probe_smem(sizes=(2048, 8192, 32768, 65536, 262144)):
    """Scalar-prefetch int32 array of size ns: compile + run a kernel that
    reads a handful of entries (front, middle, back)."""
    for ns in sizes:
        def kern(sched_ref, x_ref, o_ref):
            a = sched_ref[0] + sched_ref[ns // 2] + sched_ref[ns - 1]
            o_ref[:] = x_ref[:] + a.astype(jnp.float32)

        try:
            fn = pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                interpret=INTERPRET,
            )
            sched = jnp.arange(ns, dtype=jnp.int32)
            x = jnp.zeros((8, 128), jnp.float32)
            out = _sync(jax.jit(fn)(sched, x))
            exp = 0 + ns // 2 + ns - 1
            ok = float(out[0, 0]) == float(exp)
            print(f"smem ns={ns}: OK val_ok={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = " ".join(str(e).split())[:200]
            print(f"smem ns={ns}: FAIL {type(e).__name__}: {msg}", flush=True)
            break


# ---------------------------------------------------------------------------
def probe_hbm2smem(ns=4096):
    """DMA an int32 schedule chunk from HBM (ANY) into SMEM scratch, then
    read scalars from it."""
    C = 512

    def kern(sched_ref, x_ref, o_ref, ssc, sem):
        pltpu.make_async_copy(sched_ref.at[pl.ds(C, C)], ssc, sem).start()
        pltpu.make_async_copy(sched_ref.at[pl.ds(C, C)], ssc, sem).wait()
        a = ssc[0] + ssc[C - 1]
        o_ref[:] = x_ref[:] + a.astype(jnp.float32)

    try:
        fn = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.SMEM((C,), jnp.int32),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=INTERPRET,
        )
        sched = jnp.arange(ns, dtype=jnp.int32)
        x = jnp.zeros((8, 128), jnp.float32)
        out = _sync(jax.jit(fn)(sched, x))
        exp = C + (2 * C - 1)
        print(f"hbm2smem: OK val_ok={float(out[0,0]) == float(exp)}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = " ".join(str(e).split())[:300]
        print(f"hbm2smem: FAIL {type(e).__name__}: {msg}", flush=True)


# ---------------------------------------------------------------------------
def probe_rowdma(n=32768, w=8192, nrows=8192, depths=(4, 16, 32), iters=3):
    """Pipelined single-row (1, w) fp32 HBM reads (strided, no coalescing),
    waits lagging ``depth`` behind the issues — measures the per-row DMA
    issue cost the round-3 lazy fixup was bound by."""
    stride = 97

    def kern(src_ref, o_ref, vbuf, sems, *, nrows, depth):
        def rd(i, s):
            return pltpu.make_async_copy(
                src_ref.at[(i * stride) % n], vbuf.at[s], sems.at[s]
            )

        def body(i, _):
            s = i % depth

            @pl.when(i >= depth)
            def _():
                rd(i - depth, s).wait()

            rd(i, s).start()
            return 0

        jax.lax.fori_loop(0, nrows, body, 0)
        for j in range(depth):
            i = nrows - 1 - j
            if i >= 0:
                rd(i, i % depth).wait()
        o_ref[:] = vbuf[0]

    for depth in depths:
        kernel = functools.partial(kern, nrows=nrows, depth=depth)
        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((depth, 1, w), jnp.float32),
                    pltpu.SemaphoreType.DMA((depth,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((1, w), jnp.float32),
            interpret=INTERPRET,
        )
        src = jnp.ones((n, 1, w), jnp.float32)
        f = jax.jit(fn)
        _sync(f(src))
        t0 = time.time()
        for _ in range(iters):
            out = _sync(f(src))
        dt = (time.time() - t0) / iters
        per = dt / nrows * 1e6
        gbs = nrows * w * 4 / dt / 1e9
        print(f"rowdma w={w} nrows={nrows} depth={depth}: {dt*1e3:.1f} ms "
              f"({per:.2f} us/row, {gbs:.0f} GB/s read) "
              f"v={float(out[0, 0]):.3g}", flush=True)


# ---------------------------------------------------------------------------
def probe_overlap(ti=2048, t=1024, kk=1024, steps=2048,
                  extra_mb=(0, 2, 4, 8, 16), iters=3):
    """steps back-to-back (ti,kk)@(kk,t) bf16 dots; per step, also stream
    ``extra`` bytes of HBM reads via a side ring.  Reports ms/step vs extra."""
    g = 16

    def kern(l_ref, u_ref, a_ref, o_ref, xb, sems, *, steps, xrows):
        def body(i, acc):
            @pl.when(xrows > 0)
            def _():
                def xb_body(xj, _):
                    s = xj % 2

                    @pl.when(xj >= 2)
                    def _():
                        pltpu.make_async_copy(
                            a_ref.at[pl.ds(pl.multiple_of(((i * xrows + xj - 2) * g) % (8192 - g), g), g)],
                            xb.at[s], sems.at[s],
                        ).wait()

                    pltpu.make_async_copy(
                        a_ref.at[pl.ds(pl.multiple_of(((i * xrows + xj) * g) % (8192 - g), g), g)],
                        xb.at[s], sems.at[s],
                    ).start()
                    return 0

                jax.lax.fori_loop(0, xrows, xb_body, 0)
                for s in range(2):
                    if xrows - 2 + s >= 0:
                        pltpu.make_async_copy(
                            a_ref.at[pl.ds(pl.multiple_of(((i * xrows + xrows - 2 + s) * g) % (8192 - g), g), g)],
                            xb.at[(xrows - 2 + s) % 2], sems.at[(xrows - 2 + s) % 2],
                        ).wait()

            d = jnp.dot(l_ref[:], u_ref[:], preferred_element_type=jnp.float32)
            return acc + jnp.sum(d[:1, :1])

        acc = jax.lax.fori_loop(0, steps, body, jnp.zeros((), jnp.float32))
        o_ref[0, 0] = acc

    w = 8192
    for mb in extra_mb:
        xrows = int(mb * 1e6 / (g * w * 2))
        kernel = functools.partial(kern, steps=steps, xrows=xrows)
        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, g, w), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            interpret=INTERPRET,
        )
        l = jnp.ones((ti, kk), jnp.bfloat16)
        u = jnp.ones((kk, t), jnp.bfloat16)
        a = jnp.ones((8192, w), jnp.bfloat16)
        f = jax.jit(fn)
        _sync(f(l, u, a))
        t0 = time.time()
        for _ in range(iters):
            _sync(f(l, u, a))
        dt = (time.time() - t0) / iters
        flops = 2 * ti * kk * t * steps
        print(f"overlap extra={mb}MB/step: {dt/steps*1e6:.1f} us/step "
              f"({flops/dt/1e12:.1f} TF/s)", flush=True)


CMDS = {
    "smem": probe_smem,
    "hbm2smem": probe_hbm2smem,
    "rowdma": probe_rowdma,
    "overlap": probe_overlap,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(CMDS)
    print(f"backend={jax.default_backend()} interpret={INTERPRET}", flush=True)
    for nm in names:
        try:
            CMDS[nm]()
        except Exception as e:  # noqa: BLE001
            print(f"{nm}: TOPLEVEL FAIL {type(e).__name__}: "
                  f"{' '.join(str(e).split())[:300]}", flush=True)
