"""Round-2 consolidated TPU batch (one process, serialized chip use):

  1. health check (tiny matmul)
  2. oracle probe n=2048 MPF_BF16 (validates the current kernel stack)
  3. n=16384 MPF_BF16 timing
  4. n=32768 MPF_BF16 timing (donated, device-side generation)
  5. batched 4096 x 256^2 (Pallas grid path vs vmapped-jnp fallback)
  6. ALL_BF16 probe + n=32768 timing
  7. (optional, SKIP_65536=0) n=65536 ALL_BF16

Each stage prints + flushes immediately; failures skip to the next stage.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mpf_tpu.models.mpf import make_mpf
from mpf_tpu import precision
from mpf_tpu.utils import matgen
from mpf_tpu.utils.oracle import check_factorization
from mpf_tpu.utils.timing import time_fn, tflops

PEAK = 194.0


def stage(name):
    def deco(f):
        def g(*a):
            print(f"--- {name}", flush=True)
            try:
                f(*a)
            except Exception:
                traceback.print_exc()
                print(f"--- {name}: FAILED", flush=True)
        return g
    return deco


@stage("health")
def health():
    x = jnp.ones((256, 256), jnp.bfloat16)
    print("matmul fingerprint:", float(jnp.sum(jnp.dot(x, x))), flush=True)


@stage("probe n=2048 MPF_BF16")
def probe():
    n0 = 2048
    a0 = matgen.hpl_ai_matrix(n0, seed=7).astype(np.float32)
    fn0 = make_mpf(n0, r=128, policy=precision.MPF_BF16, block=1024, donate=False)
    res0 = fn0(jnp.asarray(a0))
    rep = check_factorization(
        a0.astype(np.float64), np.asarray(res0.lu), np.asarray(res0.ipiv),
        nbe_tol=1e-3,
    )
    print(rep, flush=True)
    assert rep.ok


def timed(n, policy, block=1024, donate=True):
    fac = make_mpf(n, r=128, policy=policy, block=block, donate=donate)

    def run(_):
        return fac(matgen.hpl_ai_matrix_device(n, seed=0).astype(policy.working))

    secs, fp = time_fn(run, 0, warmup=1, iters=3)
    gsecs, _ = time_fn(
        lambda _: matgen.hpl_ai_matrix_device(n, seed=0).astype(policy.working),
        0, warmup=1, iters=2,
    )
    net = secs - gsecs
    tf = tflops(n, net)
    print(
        f"n={n} {policy.name}: {net*1e3:.1f} ms (raw {secs*1e3:.1f} - gen "
        f"{gsecs*1e3:.1f}) {tf:.2f} TF/s = {100*tf/PEAK:.1f}% of {PEAK}",
        flush=True,
    )


@stage("n=16384 MPF_BF16")
def s16():
    timed(16384, precision.MPF_BF16)


@stage("n=32768 MPF_BF16")
def s32():
    timed(32768, precision.MPF_BF16)


@stage("batched 4096x256 fp32")
def sbatch():
    from mpf_tpu.models.batched import batched_factorize

    bsz, n = 4096, 256
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(k):
        a = jax.random.uniform(k, (bsz, n, n), jnp.float32) - 0.5
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        return jnp.where(rows == cols, a + n / 4.0, a)

    a = gen(key)
    # correctness spot-check on 2 instances
    res = batched_factorize(a[:8], r=128, policy=precision.PURE_FP32)
    lu = np.asarray(res.lu)
    ip = np.asarray(res.ipiv)
    host = np.asarray(a[:8], np.float64)
    for m in range(2):
        rep = check_factorization(host[m], lu[m], ip[m], nbe_tol=1e-4)
        print(f"  batched oracle[{m}]: {rep}", flush=True)
        assert rep.ok
    fn = jax.jit(lambda x: batched_factorize(x, r=128, policy=precision.PURE_FP32))
    secs, _ = time_fn(fn, a, warmup=1, iters=3)
    fl = bsz * (2 / 3) * n**3
    print(f"  batched {bsz}x{n}^2: {secs*1e3:.1f} ms  "
          f"{fl/secs/1e12:.3f} TF/s", flush=True)


@stage("ALL_BF16 probe + n=32768")
def sbf16():
    n0 = 2048
    a0 = matgen.hpl_ai_matrix(n0, seed=7)
    fn0 = make_mpf(n0, r=128, policy=precision.ALL_BF16, block=1024, donate=False)
    res0 = fn0(jnp.asarray(a0, jnp.bfloat16))
    rep = check_factorization(
        a0.astype(np.float64), np.asarray(res0.lu, np.float32),
        np.asarray(res0.ipiv), nbe_tol=5e-2,
    )
    print(rep, flush=True)
    assert rep.ok
    timed(32768, precision.ALL_BF16)


@stage("n=65536 ALL_BF16")
def s65():
    timed(65536, precision.ALL_BF16, block=1024)


if __name__ == "__main__":
    only = os.environ.get("STAGES", "").split(",") if os.environ.get("STAGES") else None
    for name, f in [("health", health), ("probe", probe), ("s16", s16),
                    ("s32", s32), ("batch", sbatch), ("bf16", sbf16),
                    ("s65", s65)]:
        if only and name not in only:
            continue
        f()
