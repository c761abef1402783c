"""Chip A/B + validation for the v2 strip-pivot kernel (`MPF_A1_V2`,
round 4): S-major strip body + one-hot MXU winner-row extraction.

One process: kernel micro at the north-star window shape (v1 vs v2, both
panel dtypes), then a compiled driver oracle at n=2048 with v2 on.

Usage: python tools/tpu_a1v2_r4.py [--m 65536] [--block 1024] [--r 128]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from mpf_tpu.ops.panel_strip import strip_panel_pivots


def _rtt():
    null = jax.jit(lambda x: x + 1.0)
    for _ in range(2):
        float(null(jnp.float32(1)))
    t0 = time.perf_counter()
    for _ in range(4):
        float(null(jnp.float32(1)))
    return (time.perf_counter() - t0) / 4


def micro(m, bc, r, iters=64):
    rtt = _rtt()
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    slab = jnp.asarray(rng.standard_normal((m, bc)), jnp.bfloat16)
    pos0 = jnp.arange(m, dtype=jnp.int32)

    for v2 in ("0", "1"):
        os.environ["MPF_A1_V2"] = v2

        def a1(slab, pos):
            def body(t, c):
                pos, acc = c
                piv, pos, gl = strip_panel_pivots(
                    slab, 0, pos, panel_dtype=jnp.bfloat16, jj0=0, r=r)
                return pos, acc + jnp.sum(piv)
            return jax.lax.fori_loop(0, iters, body, (pos, jnp.int32(0)))

        try:
            g = jax.jit(a1)
            for _ in range(2):
                fp = float(g(slab, pos0)[1])
            dts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fp = float(g(slab, pos0)[1])
                dts.append(time.perf_counter() - t0)
            dt = max(min(dts) - rtt, 0.0) / iters
            print(f"A1 v2={v2}: {dt*1e3:8.3f} ms/panel (fp={fp:.3e})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"A1 v2={v2}: FAIL {type(e).__name__}: "
                  f"{' '.join(str(e).split())[:300]}", flush=True)
    os.environ.pop("MPF_A1_V2", None)


def validate(n=2048):
    import mpf_tpu
    from mpf_tpu.utils import matgen
    from mpf_tpu.utils.oracle import check_factorization

    os.environ["MPF_A1_V2"] = "1"
    for name, gen in (("uniform", matgen.random_dense),
                      ("hpl", matgen.hpl_ai_matrix)):
        a = gen(n, seed=1)
        res = mpf_tpu.mpf_factorize(jnp.asarray(a), r=128)
        rep = check_factorization(
            a.astype(np.float64), np.asarray(res.lu), np.asarray(res.ipiv),
            nbe_tol=1e-3)
        print(f"validate v2 n={n} {name}: nbe={rep.normwise_backward_err:.3e}"
              f" ok={rep.ok} info={int(res.info)}", flush=True)
    os.environ.pop("MPF_A1_V2", None)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--r", type=int, default=128)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)
    micro(args.m, args.block, args.r)
    validate()
    print("done", flush=True)
