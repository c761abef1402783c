"""Round-5 chip harness: deferred-overflow exchange A/B.

One process.  Phases (comma list in argv[1], default "val"):
  val    n=4096 both policies: defer=2 vs eager — ipiv/perm bit-parity +
         fp64 oracle on the uniform corpus
  t32    n=32768 MPF_BF16 block=2048: hpl + uniform, defer=8 vs eager
  t64    n=65536 ALL_BF16 block=1024: hpl + uniform, defer=8 vs eager
  t64d   n=65536 defer-only (when the eager numbers are already on record)
  s      sweep defer S in {4, 8, 16} at 64k uniform

Usage: python tools/tpu_defer_r5.py [phases] [--s 8]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np


def _factor_time(n, policy_name, block, defer, matrix, iters=3):
    from mpf_tpu.models.mpf import make_mpf, defer_extension
    from mpf_tpu.utils.timing import time_fn, tflops
    from mpf_tpu.utils import matgen
    from tools.tpu_lab import _policy

    gen0 = (matgen.random_dense_device if matrix == "uniform"
            else matgen.hpl_ai_matrix_device)
    ov = defer_extension(n, r=128, policy=_policy(policy_name), block=block,
                         defer=defer)

    def gen(n, seed):
        return gen0(n, seed=seed, ext_rows=ov)

    fac = make_mpf(n, r=128, policy=_policy(policy_name), block=block,
                   donate=True, defer=defer)
    secs, _ = time_fn(lambda s: fac(gen(n, seed=s)), 0, warmup=1, iters=iters)
    gsecs, _ = time_fn(lambda s: gen(n, seed=s), 0, warmup=1, iters=2)
    secs = max(secs - gsecs, 1e-9)
    print(f"n={n} {policy_name} block={block} {matrix:8s} defer={defer!s:5s}: "
          f"{secs*1e3:8.1f} ms  {tflops(n, secs):6.2f} TF/s "
          f"({100*tflops(n, secs)/194.0:.1f}%)", flush=True)
    return secs


def phase_val():
    import jax.numpy as jnp

    from mpf_tpu.models.mpf import make_mpf
    from mpf_tpu.utils import matgen
    from mpf_tpu.utils.oracle import check_factorization
    from tools.tpu_lab import _policy

    n = 4096
    a = matgen.random_dense(n, seed=2).astype(np.float32)
    aj = jnp.asarray(a)
    for pol in ("mpf_bf16", "all_bf16"):
        outs = {}
        for defer in (2, False):
            fac = make_mpf(n, r=128, policy=_policy(pol), block=1024,
                           donate=False, defer=defer)
            res = fac(aj)
            outs[defer] = (np.asarray(res.ipiv), np.asarray(res.perm),
                           np.asarray(res.lu), int(res.info))
        ip_ok = np.array_equal(outs[2][0], outs[False][0])
        pm_ok = np.array_equal(outs[2][1], outs[False][1])
        lu_ok = np.array_equal(
            np.asarray(outs[2][2], np.float32),
            np.asarray(outs[False][2], np.float32))
        rep = check_factorization(a.astype(np.float64), outs[2][2],
                                  outs[2][0], nbe_tol=1e-2)
        print(f"val n={n} {pol}: ipiv_match={ip_ok} perm_match={pm_ok} "
              f"lu_match={lu_ok} nbe={rep.normwise_backward_err:.3e} "
              f"ok={rep.ok}", flush=True)
        if not (ip_ok and pm_ok and lu_ok and rep.ok):
            sys.exit(1)


def main():
    phases = (sys.argv[1] if len(sys.argv) > 1 else "val").split(",")
    s = int(sys.argv[sys.argv.index("--s") + 1]) if "--s" in sys.argv else 8
    for ph in phases:
        if ph == "val":
            phase_val()
        elif ph == "t32":
            for mat in ("hpl", "uniform"):
                _factor_time(32768, "mpf_bf16", 2048, s, mat)
                _factor_time(32768, "mpf_bf16", 2048, False, mat)
        elif ph == "t64":
            for mat in ("hpl", "uniform"):
                _factor_time(65536, "all_bf16", 1024, s, mat)
                _factor_time(65536, "all_bf16", 1024, False, mat)
        elif ph == "t64d":
            for mat in ("hpl", "uniform"):
                _factor_time(65536, "all_bf16", 1024, s, mat)
        elif ph == "s":
            for sv in (4, 8, 16):
                _factor_time(65536, "all_bf16", 1024, sv, "uniform")
        elif ph == "u12":
            # 32k MPF_BF16 outer-U12 precision A/B (round-5 cost model:
            # ~65 ms of the 262 ms outer stage is the fp32-HIGHEST U12).
            # Env is read at trace time -> fresh closures per leg.
            import jax
            from mpf_tpu.models.mpf import make_mpf
            from mpf_tpu.utils.timing import time_fn, tflops
            from mpf_tpu.utils import matgen
            from tools.tpu_lab import _policy

            n = 32768
            for prec in ("highest", "high"):
                os.environ["MPF_U12_PREC"] = prec
                # bypass make_mpf's lru cache: a fresh closure per env leg
                fac = make_mpf.__wrapped__(n, r=128,
                                           policy=_policy("mpf_bf16"),
                                           block=2048, donate=True)
                for mat in ("hpl", "uniform"):
                    gen = (matgen.random_dense_device if mat == "uniform"
                           else matgen.hpl_ai_matrix_device)
                    secs, _ = time_fn(lambda s: fac(gen(n, seed=s)), 0,
                                      warmup=1, iters=3)
                    gsecs, _ = time_fn(lambda s: gen(n, seed=s), 0,
                                       warmup=1, iters=2)
                    secs = max(secs - gsecs, 1e-9)
                    print(f"u12={prec:7s} n={n} {mat:8s}: {secs*1e3:8.1f} ms "
                          f"{tflops(n, secs):6.2f} TF/s", flush=True)
        else:
            print(f"unknown phase {ph}", flush=True)


if __name__ == "__main__":
    main()
