"""Minimal on-chip check of the roll-packed strip pivot kernel vs the CPU
jnp reference: m=2048, r=128 single panel.  Bisection stages:
  0: tiny matmul (worker health)
  1: pltpu.roll f32 standalone
  2: pltpu.roll int32 standalone
  3: full strip_panel_pivots vs CPU reference pivots
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "0123"
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if "0" in stage:
        x = jnp.ones((256, 256), jnp.bfloat16)
        print("health:", float((x @ x).sum()), flush=True)

    M, ML = 2048, 256

    def mk_roll(dtype):
        def kern(x_ref, o_ref):
            v = x_ref[0:1, :]
            b = jnp.broadcast_to(v, (8, M))
            r = pltpu.roll(b, ML, 1, stride=ML, stride_axis=0)[:, :ML]
            o_ref[:] = r

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, ML), dtype),
        )

    if "1" in stage:
        x = jnp.asarray(np.arange(M)[None, :], jnp.float32)
        r = np.asarray(jax.jit(mk_roll(jnp.float32))(x))
        want = np.asarray(x).reshape(8, ML)[::-1, :]
        print("roll f32:", "OK" if np.array_equal(r, want) else
              f"MISMATCH {r[:,0]} vs {want[:,0]}", flush=True)

    if "2" in stage:
        x = jnp.asarray(np.arange(M)[None, :], jnp.int32)
        r = np.asarray(jax.jit(mk_roll(jnp.int32))(x))
        want = np.asarray(x).reshape(8, ML)[::-1, :]
        print("roll int32:", "OK" if np.array_equal(r, want) else
              f"MISMATCH {r[:,0]} vs {want[:,0]}", flush=True)

    if "3" in stage:
        from mpf_tpu.ops.panel_strip import strip_panel_pivots
        from mpf_tpu.ops.getf2 import panel_pivots_perm
        from mpf_tpu.precision import MPF_BF16, cast_to_panel

        rng = np.random.default_rng(0)
        m, r = 2048, 128
        panel = jnp.asarray(rng.standard_normal((m, r)), jnp.float32)
        pos0 = jnp.arange(m, dtype=jnp.int32)
        t0 = time.time()
        piv, pos, gl = jax.jit(
            lambda p, q: strip_panel_pivots(p, 0, q, panel_dtype=jnp.bfloat16)
        )(panel, pos0)
        piv, pos, gl = map(np.asarray, (piv, pos, gl))
        print(f"strip kernel ran in {time.time()-t0:.1f}s", flush=True)
        piv_ref, perm_ref, _ = panel_pivots_perm(
            cast_to_panel(panel, MPF_BF16), row_offset=0,
            prev_perm=jnp.arange(m, dtype=jnp.int32),
        )
        piv_ref = np.asarray(piv_ref)
        ok = np.array_equal(piv, piv_ref)
        print("pivots vs jnp reference:", "EXACT MATCH" if ok else "MISMATCH",
              flush=True)
        if not ok:
            d = np.nonzero(piv != piv_ref)[0]
            print("first diffs at", d[:8], piv[d[:8]], piv_ref[d[:8]],
                  flush=True)
            sys.exit(1)


if __name__ == "__main__":
    main()
