"""Round-5 probe: can Mosaic DMA sub-granule row slices of a 2D-tiled HBM
ref WITHOUT an XLA relayout?

The fine-granule exchange worked on a natively-3D (n/2, 2, w) buffer
(tools/tpu_granule_r5.py: 688 GB/s), but an XLA reshape of the 2D matrix
into that view MATERIALIZES a relayout copy (T(8,128)(2,1) -> T(2,128)(2,1))
— 2 full-matrix copies per exchange call (measured: 32k MPF_BF16 455 ->
1063 ms) and an 8 GB temp that OOMs at 64k.  Probe whether the kernel can
view the buffer finer in place:

  A  bf16 2D ref: in-kernel a_ref.reshape(n//2, 2, w), pair DMA
  B  bf16 2D ref: direct .at[pl.ds(row, 2), :] with row dynamic (even)
  C  f32  2D ref: direct .at[pl.ds(row, 1), :]
  D  bf16 2D ref: .at[pl.ds(row, 2), :] with pl.multiple_of(row, 2)

Each: compile on chip, then exact correctness (read pair, add 1, write
back; compare full matrix against numpy).
"""

import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, W, E = 1024, 1024, 16


def _kernel(ids_ref, a_in_ref, a_ref, buf, rsem, wsem, *, mode, g):
    if mode == "A":
        av = a_ref.reshape(N // g, g, W)

        def rd(i, slot):
            return pltpu.make_async_copy(av.at[ids_ref[i]], buf.at[slot],
                                         rsem.at[slot])

        def wr(i, slot):
            return pltpu.make_async_copy(buf.at[slot], av.at[ids_ref[i]],
                                         wsem.at[slot])
    else:
        def rd(i, slot):
            row = ids_ref[i] * g
            if mode == "D":
                row = pl.multiple_of(row, g)
            return pltpu.make_async_copy(a_ref.at[pl.ds(row, g), :],
                                         buf.at[slot], rsem.at[slot])

        def wr(i, slot):
            row = ids_ref[i] * g
            if mode == "D":
                row = pl.multiple_of(row, g)
            return pltpu.make_async_copy(buf.at[slot],
                                         a_ref.at[pl.ds(row, g), :],
                                         wsem.at[slot])

    def body(i, c):
        slot = i % 2
        rd(i, slot).start()
        rd(i, slot).wait()
        buf[slot] = (buf[slot].astype(jnp.float32) + 1.0).astype(buf.dtype)
        wr(i, slot).start()
        wr(i, slot).wait()
        return c

    jax.lax.fori_loop(0, E, body, jnp.int32(0))


@functools.lru_cache(maxsize=None)
def build(mode, g, dname):
    dt = jnp.dtype(dname)
    kern = functools.partial(_kernel, mode=mode, g=g)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, g, W), dt),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N, W), dt),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    rng = np.random.default_rng(0)
    for mode, g, dt in (("A", 2, jnp.bfloat16), ("B", 2, jnp.bfloat16),
                        ("C", 1, jnp.float32), ("D", 2, jnp.bfloat16)):
        try:
            nwin = N // g
            ids_np = np.sort(rng.choice(nwin, size=E, replace=False))
            ids = jnp.asarray(ids_np, jnp.int32)
            fn = jax.jit(lambda a, f=build(mode, g, jnp.dtype(dt).name):
                         f(ids, a), donate_argnums=(0,))
            a0 = np.zeros((N, W), np.float32)
            out = np.asarray(fn(jnp.asarray(a0, dt)).astype(jnp.float32))
            exp = a0.copy()
            for i in ids_np:
                exp[i * g:(i + 1) * g] += 1.0
            ok = np.array_equal(out, exp)
            nbad = int((out != exp).sum())
            print(f"{mode} g={g} {jnp.dtype(dt).name}: compile OK, "
                  f"exact={ok} (bad={nbad})", flush=True)
        except Exception as ex:  # noqa: BLE001
            msg = " ".join(str(ex).split())[:220]
            print(f"{mode} g={g}: FAIL {type(ex).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
