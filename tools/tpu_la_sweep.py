"""Chip validation + A/B for the one-deep lookahead driver (round 4,
`models/mpf.py:_lookahead_factorize` — panel k+1's row exchange threaded
through block column k's wide trailing GEMM by `ops/gemmx.py`).

One process, phases in order (no cross-process compile cache through the
tunnel):

  val   n=4096 compiled debut: lookahead vs serial on uniform + hpl —
        pivot-exact, oracle-clean
  t32   n=32768 MPF_BF16 hpl + uniform, lookahead off/on
  t64   n=65536 ALL_BF16 hpl + uniform, lookahead off/on (the north-star
        corpus pair; VERDICT r3 items 1+3)

Usage: python tools/tpu_la_sweep.py [val t32 t64 ...]  (default: val t32)
"""

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

from mpf_tpu.models.mpf import make_mpf, mpf_factorize
from mpf_tpu.precision import ALL_BF16, MPF_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.timing import time_fn, tflops
from mpf_tpu.utils.oracle import check_factorization

GENS = {"hpl": matgen.hpl_ai_matrix_device,
        "uniform": matgen.random_dense_device}


def phase_val():
    n, r, block = 4096, 128, 1024
    for mat in ("uniform", "hpl"):
        gen = matgen.random_dense if mat == "uniform" else matgen.hpl_ai_matrix
        a = gen(n, seed=2)
        outs = {}
        for la in (False, True):
            res = mpf_factorize(jnp.asarray(a), r=r, policy=MPF_BF16,
                                block=block, lookahead=la)
            outs[la] = jax.tree.map(np.asarray, res)
        piv_ok = (outs[True].ipiv == outs[False].ipiv).all() and (
            outs[True].perm == outs[False].perm).all()
        rep = check_factorization(a.astype(np.float64), outs[True].lu,
                                  outs[True].ipiv, nbe_tol=1e-3)
        print(f"val {mat}: pivots {'MATCH' if piv_ok else 'DIVERGE'}, "
              f"lookahead nbe={rep.normwise_backward_err:.3e} ok={rep.ok} "
              f"info={int(outs[True].info)}", flush=True)


def _timed(n, policy, block, mat, la, iters=3):
    gen = GENS[mat]
    fac = make_mpf(n, r=128, policy=policy, block=block, donate=True,
                   lookahead=la)
    secs, _ = time_fn(lambda s: fac(gen(n, seed=s)), 0, warmup=1, iters=iters)
    gsecs, _ = time_fn(lambda s: gen(n, seed=s), 0, warmup=1, iters=2)
    secs = max(secs - gsecs, 1e-9)
    return secs, tflops(n, secs)


def _ab(n, policy, block, pol_name):
    for mat in ("hpl", "uniform"):
        for la in (False, True):
            try:
                secs, tf = _timed(n, policy, block, mat, la)
                print(f"n={n} {pol_name} block={block} {mat:8s} "
                      f"lookahead={int(la)}: {secs*1e3:8.1f} ms  "
                      f"{tf:6.2f} TF/s ({100*tf/194.0:.1f}%)", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = " ".join(str(e).split())[:300]
                print(f"n={n} {pol_name} {mat} lookahead={int(la)}: FAIL "
                      f"{type(e).__name__}: {msg}", flush=True)


def phase_t32():
    _ab(32768, MPF_BF16, None, "MPF_BF16")


def phase_t64():
    _ab(65536, ALL_BF16, 1024, "ALL_BF16")


PHASES = {"val": phase_val, "t32": phase_t32, "t64": phase_t64}

if __name__ == "__main__":
    names = sys.argv[1:] or ["val", "t32"]
    print(f"backend={jax.default_backend()}", flush=True)
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        try:
            PHASES[nm]()
        except Exception as e:  # noqa: BLE001
            msg = " ".join(str(e).split())[:400]
            print(f"{nm}: TOPLEVEL FAIL {type(e).__name__}: {msg}", flush=True)
    print("done", flush=True)
