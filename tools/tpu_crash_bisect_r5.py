"""Round-5 bisect of the tunnel compile-helper crash (VERDICT r4 item 2).

Symptom: `remote_compile: HTTP 500: tpu_compile_helper subprocess exit
code 1` — distinct from the HTTP 413 request-size limit (fp32 kk=2048
gemmx) and from ordinary Mosaic verification errors (those come back as
typed XlaRuntimeError messages).  Known triggers on record:

  * the round-4 lazy-driver jit: ~2.1-2.3 MB Mosaic module, many kernel
    instances (every instance compiles standalone);
  * round-5: an UNFUSED single-shot dot kernel at (2048,1024)@(1024,2048)
    bf16 — module is tiny, so size alone is NOT the trigger; shape-driven
    compiler blowup (likely the unfused (s, w) fp32 accumulator
    vectorization) is a second, independent cause.

Legs bisect the unfused-dot boundary along each axis from a known-good
(1024, 1024, 1024), one crash per axis maximum (repeated helper crashes
take the TPU worker down for ~8-40 min — see memory/tpu-env-gotchas).
Production kernels are all grid+BlockSpec windowed (per-step tiles
<= (4096, 1024)); the boundary recorded here is the budget the kernel
builders must stay under for any future single-shot kernel.

Usage: python tools/tpu_crash_bisect_r5.py [axis]   axis in {w, s, k, all}
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_dot(s, k, w, dname="bfloat16"):
    dt = jnp.dtype(dname)

    def kern(a_ref, b_ref, o_ref):
        acc = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(dt)

    fn = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, w), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 << 20),
    )
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((s, k)), dt)
    b = jnp.asarray(rng.standard_normal((k, w)), dt)
    try:
        out = np.asarray(fn(a, b))
        ok = np.isfinite(out.astype(np.float32)).all()
        print(f"dot s={s:5d} k={k:5d} w={w:5d} {dname}: OK (finite={ok})",
              flush=True)
        return True
    except Exception as ex:  # noqa: BLE001
        msg = " ".join(str(ex).split())[:160]
        crash = "HTTP 500" in msg or "exit code" in msg
        print(f"dot s={s:5d} k={k:5d} w={w:5d} {dname}: "
              f"{'HELPER CRASH' if crash else 'FAIL'} {msg}", flush=True)
        return False


def main():
    axis = sys.argv[1] if len(sys.argv) > 1 else "all"
    assert try_dot(1024, 1024, 1024), "known-good base failed — stop"
    legs = {
        "w": [(1024, 1024, w) for w in (1280, 1536, 1792, 2048)],
        "s": [(s, 1024, 1024) for s in (1536, 2048, 3072, 4096)],
        "k": [(1024, k, 1024) for k in (2048, 4096)],
    }
    for ax in (("w", "s", "k") if axis == "all" else (axis,)):
        for s, k, w in legs[ax]:
            if not try_dot(s, k, w):
                break  # one crash per axis — protect the worker
            time.sleep(2)


if __name__ == "__main__":
    main()
