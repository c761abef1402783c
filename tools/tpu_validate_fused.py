"""Round-2 fused-path validation + timing on the real TPU chip.

Usage: python tools/tpu_validate_fused.py [stage]
  stage 1: tiny-n correctness (compiled Mosaic kernels) vs CPU oracle
  stage 2: n=8192 timing fused vs round-1 path
  stage 3: n=16384 timing (headline precursor)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp

from mpf_tpu.models.mpf import make_mpf
from mpf_tpu.precision import MPF_BF16, ALL_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization
from mpf_tpu.utils.timing import time_fn, tflops


def stage1():
    print("backend:", jax.default_backend(), jax.devices())
    for n, r, block in [(256, 128, 128), (512, 128, 256), (1024, 128, 512)]:
        a = matgen.hpl_ai_matrix(n, seed=0).astype(np.float32)
        fac = make_mpf(n, r=r, policy=MPF_BF16, block=block, donate=False)
        res = jax.block_until_ready(fac(jnp.asarray(a)))
        lu = np.asarray(res.lu)
        ipiv = np.asarray(res.ipiv)
        rep = check_factorization(a.astype(np.float64), lu, ipiv, nbe_tol=1e-3)
        print(f"n={n} r={r} blk={block}: oracle ok={rep.ok} nbe={rep.normwise_backward_err:.2e} info={int(res.info)}")
        assert rep.ok, rep
    # bf16 working precision (un-gated fused kernels)
    n = 1024
    a = matgen.hpl_ai_matrix(n, seed=0).astype(np.float32)
    fac = make_mpf(n, r=128, policy=ALL_BF16, block=512, donate=False)
    res = jax.block_until_ready(fac(jnp.asarray(a)))
    rep = check_factorization(
        a.astype(np.float64), np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=5e-2
    )
    print(f"ALL_BF16 n={n}: ok={rep.ok} nbe={rep.normwise_backward_err:.2e}")
    assert rep.ok, rep
    print("stage1 PASS")


def timing(n, r, block, policy):
    a = matgen.hpl_ai_matrix_device(n, seed=0)
    if policy.working != jnp.float32:
        a = a.astype(policy.working)
    fac = make_mpf(n, r=r, policy=policy, block=block, donate=False)
    secs, _ = time_fn(fac, a, warmup=1, iters=3)
    tf = tflops(n, secs)
    print(f"n={n} r={r} blk={block} {policy.name}: {secs*1e3:.1f} ms = {tf:.2f} TF/s ({100*tf/194:.1f}% of MXU)")
    return tf


def stage2():
    timing(8192, 128, 1024, MPF_BF16)


def stage3():
    timing(16384, 128, 1024, MPF_BF16)
    timing(16384, 128, 2048, MPF_BF16)


if __name__ == "__main__":
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    [stage1, stage2, stage3][stage - 1]()
