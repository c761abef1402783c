"""Headline single-chip runs: n=32768 MPF_BF16 (the BASELINE.json primary
metric) and large ALL_BF16 sizes.  Env knobs: HL_N, HL_BLOCK, HL_POLICY,
HL_R, HL_CHECK (oracle on a small probe first)."""

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
from mpf_tpu import precision
from mpf_tpu.utils import matgen
from mpf_tpu.utils.timing import time_fn, tflops

N = int(os.environ.get("HL_N", "32768"))
R = int(os.environ.get("HL_R", "128"))
BLOCK = int(os.environ.get("HL_BLOCK", "1024"))
POLICY = getattr(precision, os.environ.get("HL_POLICY", "MPF_BF16"))
CHECK = os.environ.get("HL_CHECK", "0") == "1"
PEAK = 194.0  # sustained bf16 MXU TF/s measured on this chip (round 1)

if CHECK:
    from mpf_tpu.utils.oracle import check_factorization

    n0 = 2048
    a0 = matgen.hpl_ai_matrix(n0, seed=7).astype(np.float32)
    fn0 = make_mpf(n0, r=R, policy=POLICY, block=min(BLOCK, 1024), donate=False)
    res0 = fn0(jnp.asarray(a0, dtype=POLICY.working))
    rep = check_factorization(
        a0.astype(np.float64), np.asarray(res0.lu, np.float32),
        np.asarray(res0.ipiv),
        nbe_tol=5e-2 if POLICY.working == jnp.bfloat16 else 1e-3,
    )
    print(f"probe n={n0} {POLICY.name}: {rep}")
    assert rep.ok, rep

a = matgen.hpl_ai_matrix_device(N, seed=0).astype(POLICY.working)
fac = make_mpf(N, r=R, policy=POLICY, block=BLOCK, donate=True)
# donation consumes `a` each call: rebuild per iteration via a closure that
# regenerates on device (generation is ~free vs the factorization at this N)


def run(_):
    m = matgen.hpl_ai_matrix_device(N, seed=0).astype(POLICY.working)
    return fac(m)


secs, fp = time_fn(run, 0, warmup=1, iters=3)
# subtract the matrix generation cost measured separately
gsecs, _ = time_fn(
    lambda _: matgen.hpl_ai_matrix_device(N, seed=0).astype(POLICY.working),
    0, warmup=1, iters=3,
)
net = secs - gsecs
tf = tflops(N, net)
print(
    f"n={N} r={R} block={BLOCK} {POLICY.name}: {net*1e3:.1f} ms "
    f"(raw {secs*1e3:.1f} - gen {gsecs*1e3:.1f}), {tf:.2f} TF/s "
    f"= {100*tf/PEAK:.1f}% of {PEAK} TF/s peak; fingerprint {fp:.6g}"
)
