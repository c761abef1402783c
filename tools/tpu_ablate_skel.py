"""Skeleton ablation: attribute the non-kernel driver cost (XLA glue,
outer GEMMs, physical exchange) by skipping stages via MPF_ABLATE.
Results are numerically WRONG under ablation — timing only."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = os.environ.get("AB_N", "16384")
BLOCK = os.environ.get("AB_BLOCK", "1024")

SCRIPT = r"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
from mpf_tpu.models.mpf import make_mpf
from mpf_tpu.precision import MPF_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.timing import time_fn, tflops
N, BLOCK = %s, %s
a = matgen.hpl_ai_matrix_device(N, seed=0)
fac = make_mpf(N, r=128, policy=MPF_BF16, block=BLOCK, donate=False)
secs, _ = time_fn(fac, a, warmup=1, iters=3)
print("%%7.1f ms  (%%6.2f TF/s)" %% (secs*1e3, tflops(N, secs)), flush=True)
""" % (N, BLOCK)

for tag in ["", "exchange", "outer", "slabio", "exchange,outer,slabio"]:
    env = dict(os.environ, MPF_ABLATE=tag)
    r = subprocess.run([sys.executable, "-c", SCRIPT], capture_output=True,
                       text=True, cwd=REPO, env=env)
    out = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else r.stderr[-200:]
    print(f"{tag or 'baseline':24s}: {out}", flush=True)
