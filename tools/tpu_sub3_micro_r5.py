"""Micro A/B: pair-layout trailing GEMM (trailing_sub3) vs the 2D
epilogue-fused kernel (trailing_gemm_sub) at matched shapes.

The 64k pair-driver chip debut lost 4.9x corpus-independently
(tools/chip_logs_r5_p3t64e.log) — ~90% of driver flops are this kernel,
so if it runs at ~1/5 the 2D rate, that alone explains the loss.  Legs:

  sub3       (n/2, 2, n) matrix, trailing region at ko=1024
  sub3_ti    same, ti forced to 1024 (vs the auto 2048) — isolates the
             44 MB budget reduction from the 3D-layout cost
  sub2d      the chip-proven 2D kernel, same region/tiles

Usage: python tools/tpu_sub3_micro_r5.py [n] [iters]
"""

import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from mpf_tpu.utils.timing import time_fn


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bc = 1024
    ko = bc
    m = n - ko
    flops = 2.0 * m * m * bc

    key = jax.random.PRNGKey(0)
    a3 = jax.random.normal(key, (n // 2, 2, n), jnp.bfloat16)
    l21_3 = jax.random.normal(key, (m // 2, 2, bc), jnp.bfloat16)
    u12_3 = jax.random.normal(key, (bc // 2, 2, m), jnp.bfloat16)
    a2 = jax.random.normal(key, (n, n), jnp.bfloat16)
    l21 = jax.random.normal(key, (m, bc), jnp.bfloat16)
    u12 = jax.random.normal(key, (bc, m), jnp.bfloat16)

    from mpf_tpu.ops.pair3d import trailing_sub3
    from mpf_tpu.ops.panel_fused import trailing_gemm_sub

    REP = 8  # amortize the ~30 ms dispatch RTT (memory/tpu-env-gotchas)

    def leg(name, f, *args):
        def rep(*a):
            A = a[0]
            for _ in range(REP):
                A = f(A, *a[1:])
            return A
        g = jax.jit(rep)
        secs, _ = time_fn(lambda *a: g(*a), *args, warmup=1, iters=iters)
        per = secs / REP
        print(f"{name:8s} n={n}: {per*1e3:7.2f} ms/apply  "
              f"{flops/per/1e12:6.1f} TF/s", flush=True)

    leg("sub3", lambda A, L, U: trailing_sub3(A, L, U, ko), a3, l21_3, u12_3)
    leg("sub3_ti", lambda A, L, U: trailing_sub3(A, L, U, ko, _ti=1024),
        a3, l21_3, u12_3)
    leg("sub2d", lambda A, L, U: trailing_gemm_sub(A, L, U, ko, ncols=m),
        a2, l21, u12)


if __name__ == "__main__":
    main()
