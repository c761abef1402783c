"""Round-5 main chip sweep.

Phases (comma list in argv[1], default "u12val,t64"):
  u12val  n=8192 MPF_BF16 both corpora: MPF_U12_PREC high vs highest —
          fp64 oracle nbe side by side (justifies or rejects the default
          flip; pivots MAY differ since U12 feeds future trailing blocks)
  t64     n=65536 ALL_BF16 eager, hpl + uniform — first measurement WITH
          the 8-slot / read-ahead-3 exchange window ring (the round-4
          ledger numbers predate it)
  x64     MPF_ABLATE=exchange subprocess at 64k uniform (+hpl with x64h):
          re-closes the exchange byte model against the deep ring
  t32     n=32768 MPF_BF16 block=2048 hpl + uniform (whatever MPF_U12_PREC
          is set in the environment — default flip candidates run this via
          `MPF_U12_PREC=high python tools/tpu_r5_sweep.py t32`)

One process per invocation; every 64k leg recompiles (~10 min through the
axon tunnel — the JAX compilation cache does not persist, see memory).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _time_leg(n, policy_name, block, matrix, iters=3):
    from mpf_tpu.models.mpf import make_mpf
    from mpf_tpu.utils.timing import time_fn, tflops
    from mpf_tpu.utils import matgen
    from tools.tpu_lab import _policy

    gen = (matgen.random_dense_device if matrix == "uniform"
           else matgen.hpl_ai_matrix_device)
    fac = make_mpf(n, r=128, policy=_policy(policy_name), block=block,
                   donate=True)
    secs, _ = time_fn(lambda s: fac(gen(n, seed=s)), 0, warmup=1, iters=iters)
    gsecs, _ = time_fn(lambda s: gen(n, seed=s), 0, warmup=1, iters=2)
    secs = max(secs - gsecs, 1e-9)
    tf = tflops(n, secs)
    tag = os.environ.get("MPF_ABLATE", "") or "full"
    print(f"n={n} {policy_name} block={block} {matrix:8s} [{tag}]: "
          f"{secs*1e3:8.1f} ms  {tf:6.2f} TF/s ({100*tf/194.0:.1f}%)",
          flush=True)
    return secs


def phase_u12val():
    import jax.numpy as jnp

    from mpf_tpu.models.mpf import make_mpf
    from mpf_tpu.utils import matgen
    from mpf_tpu.utils.oracle import check_factorization
    from tools.tpu_lab import _policy

    n = 8192
    mats = {
        "uniform": matgen.random_dense(n, seed=3).astype(np.float32),
        "hpl": matgen.hpl_ai_matrix(n, seed=3),
    }
    for prec in ("highest", "high"):
        os.environ["MPF_U12_PREC"] = prec
        fac = make_mpf.__wrapped__(n, r=128, policy=_policy("mpf_bf16"),
                                   block=1024, donate=False)
        for mname, a in mats.items():
            res = fac(jnp.asarray(a))
            rep = check_factorization(a.astype(np.float64),
                                      np.asarray(res.lu),
                                      np.asarray(res.ipiv), nbe_tol=1e-2)
            print(f"u12val n={n} {mname:8s} u12={prec:7s}: "
                  f"nbe={rep.normwise_backward_err:.3e} ok={rep.ok} "
                  f"info={int(res.info)}", flush=True)
    os.environ.pop("MPF_U12_PREC", None)


def phase_p3val(n=4096):
    """Pair-layout chip debut: 3D vs 2D parity (ipiv/perm/lu bitwise) +
    fp64 oracle, both policies, uniform corpus."""
    import jax.numpy as jnp

    from mpf_tpu.models.mpf import make_mpf
    from mpf_tpu.utils import matgen
    from mpf_tpu.utils.oracle import check_factorization
    from tools.tpu_lab import _policy

    a = matgen.random_dense(n, seed=2).astype(np.float32)
    for pol in ("all_bf16", "mpf_bf16"):
        if pol == "mpf_bf16":
            # fp32 working: the pair-layout U12 kernel promotes HIGH ->
            # HIGHEST (no Mosaic 3-pass dot) — pin both paths to HIGHEST
            # for a bit-comparable A/B (fresh closure, env at trace time)
            os.environ["MPF_U12_PREC"] = "highest"
            fac = make_mpf.__wrapped__(n, r=128, policy=_policy(pol),
                                       block=1024, donate=False)
        else:
            fac = make_mpf(n, r=128, policy=_policy(pol), block=1024,
                           donate=False)
        r2 = fac(jnp.asarray(a))
        r3 = fac(jnp.asarray(a).reshape(n // 2, 2, n))
        os.environ.pop("MPF_U12_PREC", None)
        ip_ok = np.array_equal(np.asarray(r3.ipiv), np.asarray(r2.ipiv))
        pm_ok = np.array_equal(np.asarray(r3.perm), np.asarray(r2.perm))
        lu3 = np.asarray(r3.lu).reshape(n, n)
        lu_ok = np.array_equal(
            lu3.astype(np.float32), np.asarray(r2.lu, np.float32))
        rep = check_factorization(a.astype(np.float64), lu3,
                                  np.asarray(r3.ipiv), nbe_tol=1e-2)
        print(f"p3val n={n} {pol}: ipiv={ip_ok} perm={pm_ok} lu={lu_ok} "
              f"nbe={rep.normwise_backward_err:.3e} ok={rep.ok}", flush=True)
        # bf16 working must be BIT-exact (chip result 2026-08-20: True).
        # fp32 working is oracle-gated only: the pair U12 kernel's Mosaic
        # fp32-HIGHEST dot does not bit-match XLA's (different pass
        # accumulation), so pivots may legitimately differ.
        need_bits = pol == "all_bf16"
        if not (rep.ok and (ip_ok and pm_ok or not need_bits)):
            sys.exit(1)


def _time_leg3(n, policy_name, block, matrix, iters=3):
    from mpf_tpu.models.mpf import make_mpf
    from mpf_tpu.utils.timing import time_fn, tflops
    from mpf_tpu.utils import matgen
    from tools.tpu_lab import _policy

    gen = (matgen.random_dense_device if matrix == "uniform"
           else matgen.hpl_ai_matrix_device)
    pol = _policy(policy_name)
    fac = make_mpf(n, r=128, policy=pol, block=block, donate=True)
    # rejit=False: the pair driver may be multi-part (sequential jits) —
    # an outer jit would inline them into one over-the-wall module.  The
    # generator must emit the WORKING dtype (an fp32 3D arg is 16 GB at
    # 64k and can't donation-alias the bf16 output -> HBM OOM).
    wd = pol.working
    secs, _ = time_fn(lambda s: fac(gen(n, seed=s, pairs=True, dtype=wd)), 0,
                      warmup=1, iters=iters, rejit=False)
    gsecs, _ = time_fn(lambda s: gen(n, seed=s, pairs=True, dtype=wd), 0,
                       warmup=1, iters=2)
    secs = max(secs - gsecs, 1e-9)
    tf = tflops(n, secs)
    print(f"n={n} {policy_name} block={block} {matrix:8s} [pair3d]: "
          f"{secs*1e3:8.1f} ms  {tf:6.2f} TF/s ({100*tf/194.0:.1f}%)",
          flush=True)
    return secs


def main():
    phases = (sys.argv[1] if len(sys.argv) > 1 else "u12val,t64").split(",")
    for ph in phases:
        if ph == "u12val":
            phase_u12val()
        elif ph == "t64":
            for mat in ("hpl", "uniform"):
                _time_leg(65536, "all_bf16", 1024, mat)
        elif ph in ("x64", "x64h"):
            mats = ("uniform",) if ph == "x64" else ("uniform", "hpl")
            for mat in mats:
                env = dict(os.environ, MPF_ABLATE="exchange")
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), f"_x64leg:{mat}"],
                    env=env, check=True)
        elif ph.startswith("_x64leg:"):
            _time_leg(65536, "all_bf16", 1024, ph.split(":", 1)[1])
        elif ph == "t32":
            prec = os.environ.get("MPF_U12_PREC", "default")
            print(f"t32 with MPF_U12_PREC={prec}", flush=True)
            for mat in ("hpl", "uniform"):
                _time_leg(32768, "mpf_bf16", 2048, mat)
        elif ph == "p3val":
            phase_p3val()
        elif ph == "p3t64":
            for mat in ("hpl", "uniform"):
                _time_leg3(65536, "all_bf16", 1024, mat)
        elif ph == "p3t32":
            for mat in ("hpl", "uniform"):
                _time_leg3(32768, "mpf_bf16", 2048, mat)
        else:
            print(f"unknown phase {ph}", flush=True)


if __name__ == "__main__":
    main()
