"""Per-kernel cost breakdown of the fused panel step on the real chip.

Each piece runs ITERS times inside ONE jitted fori_loop (data-chained so
nothing is DCE'd); the tunnel RTT (~28 ms) is amortized away.  Reports
per-iteration milliseconds.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import time
import numpy as np
import jax
import jax.numpy as jnp

from mpf_tpu.ops.panel_strip import strip_panel_pivots
from mpf_tpu.ops.panel_fused import rowblock_assemble, panel_apply_update

M = int(os.environ.get("MB_M", "8192"))
BC = int(os.environ.get("MB_BC", "1024"))
R = int(os.environ.get("MB_R", "128"))
ITERS = int(os.environ.get("MB_ITERS", "64"))
WORK = jnp.bfloat16 if os.environ.get("MB_BF16") else jnp.float32


def bench(name, fn, *args):
    g = jax.jit(fn)
    t = None
    for _ in range(2):
        r = g(*args)
        t0 = time.perf_counter()
        fp = float(jax.tree.leaves(r)[0].sum() if hasattr(jax.tree.leaves(r)[0], "sum") else r)
        t = time.perf_counter() - t0
    # timed run
    t0 = time.perf_counter()
    r = g(*args)
    fp = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    print(f"{name:28s}: {dt*1e3/ITERS:8.3f} ms/iter  (total {dt*1e3:.0f} ms, fp={fp:.3e})")


rng = np.random.default_rng(0)
panel = jnp.asarray(rng.standard_normal((M, R)), WORK)
slab = jnp.asarray(rng.standard_normal((M, BC)), WORK)
pos0 = jnp.arange(M, dtype=jnp.int32)
glist0 = jnp.arange(R, dtype=jnp.int32) * (M // R)
rowblock = jnp.asarray(rng.standard_normal((R, BC)), WORK)
uinv = jnp.asarray(np.triu(rng.standard_normal((R, R))), WORK)


def a1_loop(panel, pos, perm):
    def body(t, c):
        pos, perm = c
        piv, pos, perm, gl = strip_panel_pivots(panel, 0, pos, perm,
                                                panel_dtype=jnp.bfloat16)
        return pos, perm
    return jax.lax.fori_loop(0, ITERS, body, (pos, perm))


def a2_loop(slab, glist):
    def body(t, g):
        rb, ui, info = rowblock_assemble(slab, g, 0)
        return g + info * 0
    return jax.lax.fori_loop(0, ITERS, body, glist)


def b_loop(slab, pos, rowblock, uinv):
    def body(t, s):
        return panel_apply_update(s, pos, rowblock, uinv, 0, 0, rb=512)
    return jax.lax.fori_loop(0, ITERS, body, slab)


def glue_loop(slab, u_all):
    def body(t, c):
        s, u = c
        p = jax.lax.dynamic_slice(s, (0, (t % (BC // R)) * R), (M, R))
        u = jax.lax.dynamic_update_slice(u, p[:R, :R], (0, 0))
        s = s + jnp.float32(1e-7).astype(s.dtype) * jnp.sum(u[0, :1])
        return s, u
    return jax.lax.fori_loop(0, ITERS, body, (slab, u_all))


print(f"M={M} BC={BC} R={R} ITERS={ITERS} work={WORK.__name__}")
which = os.environ.get("MB_ONLY", "a1,a2,b,glue").split(",")
if "a1" in which:
    bench("A1 strip pivot", a1_loop, panel, pos0, pos0)
if "a2" in which:
    bench("A2 rowblock assemble", a2_loop, slab, glist0)
if "b" in which:
    bench("B streaming update", b_loop, slab, pos0, rowblock, uinv)
if "glue" in which:
    bench("XLA glue (slice+DUS)", glue_loop, slab, jnp.zeros((R, R), WORK))
