"""A1 strip-pivot kernel stage attribution (round 4, VERDICT r3 item 7).

Times ONLY the strip-pivot kernel in subprocesses with ``MPF_A1_STUB``
stubbing successive kernel stages (results numerically WRONG — timing
only), at the north-star shape (m=65536 window, bc=1024 block column,
r=128 panels, bf16 panel dtype):

  baseline            full kernel
  search              diagonal pivots, no cross-lane reduce
  elim                no in-strip rank-1 elimination
  search,elim         mult/bookkeeping + loads + deferred MXU updates
  search,elim,defer   loads + transposes + chain bookkeeping only

Usage: python tools/tpu_a1_r4.py [--m 65536] [--block 1024] [--r 128]
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', {cache!r})
import sys; sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
from mpf_tpu.ops.panel_strip import strip_panel_pivots

m, bc, r, iters = {m}, {block}, {r}, 64
rng = np.random.default_rng(0)
slab = jnp.asarray(rng.standard_normal((m, bc)), jnp.bfloat16)
pos0 = jnp.arange(m, dtype=jnp.int32)

null = jax.jit(lambda x: x + 1.0)
for _ in range(2):
    float(null(jnp.float32(1)))
t0 = time.perf_counter()
for _ in range(4):
    float(null(jnp.float32(1)))
rtt = (time.perf_counter() - t0) / 4

def a1(slab, pos):
    def body(t, c):
        pos, acc = c
        piv, pos, gl = strip_panel_pivots(slab, 0, pos,
                                          panel_dtype=jnp.bfloat16,
                                          jj0=0, r=r)
        return pos, acc + jnp.sum(piv)
    return jax.lax.fori_loop(0, iters, body, (pos, jnp.int32(0)))

g = jax.jit(a1)
for _ in range(2):
    fp = float(g(slab, pos0)[1])
dts = []
for _ in range(3):
    t0 = time.perf_counter()
    fp = float(g(slab, pos0)[1])
    dts.append(time.perf_counter() - t0)
dt = max(min(dts) - rtt, 0.0) / iters
print(f"A1 {{dt*1e3:8.3f}} ms/iter (fp={{fp:.3e}})", flush=True)
"""

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--r", type=int, default=128)
    args = ap.parse_args()
    script = SCRIPT.format(cache=os.path.join(REPO, ".jax_cache"),
                           repo=REPO, m=args.m, block=args.block, r=args.r)
    for stub in ("", "search", "elim", "search,elim", "search,elim,defer"):
        env = dict(os.environ, MPF_A1_STUB=stub)
        r = subprocess.run([sys.executable, "-c", script],
                           capture_output=True, text=True, cwd=REPO, env=env)
        a1 = [l for l in r.stdout.splitlines() if l.startswith("A1 ")]
        out = a1[0] if a1 else (r.stdout + r.stderr)[-200:].replace("\n", " ")
        print(f"stub={stub or 'none':20s}: {out}", flush=True)
