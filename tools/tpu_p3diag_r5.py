"""Diagnose the 64k pair-driver 4.9x loss at fast-compile scale (n=16k).

trailing_sub3 alone is only ~18% slower than the 2D kernel
(tools/tpu_sub3_micro_r5.py: 8.15 vs 6.91 ms/apply), so the 7.2 s pair
run has a different dominant term.  Legs (one process, all_bf16,
block=1024, uniform corpus):

  2d        classic driver, full
  3d        pair driver, full
  3d-x      pair driver, MPF_ABLATE=exchange   (built fresh via __wrapped__)
  3d-outer  pair driver, MPF_ABLATE=outer      (U12+trailing GEMM stubbed)
  3d-slabio pair driver, MPF_ABLATE=slabio     (slab writeback stubbed)

Usage: python tools/tpu_p3diag_r5.py [n] [iters]
"""

import os
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from mpf_tpu.utils.timing import time_fn, tflops


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from mpf_tpu.models.mpf import make_mpf
    from mpf_tpu.precision import ALL_BF16
    from mpf_tpu.utils import matgen

    wd = ALL_BF16.working
    gen = matgen.random_dense_device

    def leg(name, pairs, ablate=""):
        if ablate:
            os.environ["MPF_ABLATE"] = ablate
            fac = make_mpf.__wrapped__(n, r=128, policy=ALL_BF16,
                                       block=1024, donate=True)
            os.environ.pop("MPF_ABLATE", None)
        else:
            fac = make_mpf.__wrapped__(n, r=128, policy=ALL_BF16,
                                       block=1024, donate=True)
        secs, _ = time_fn(
            lambda s: fac(gen(n, seed=s, pairs=pairs,
                              dtype=wd if pairs else None)),
            0, warmup=1, iters=iters, rejit=not pairs)
        gsecs, _ = time_fn(
            lambda s: gen(n, seed=s, pairs=pairs,
                          dtype=wd if pairs else None),
            0, warmup=1, iters=2)
        secs = max(secs - gsecs, 1e-9)
        print(f"{name:10s} n={n}: {secs*1e3:8.1f} ms  "
              f"{tflops(n, secs):6.2f} TF/s", flush=True)

    leg("2d", False)
    leg("3d", True)
    leg("3d-x", True, "exchange")
    leg("3d-outer", True, "outer")
    leg("3d-slabio", True, "slabio")


if __name__ == "__main__":
    main()
