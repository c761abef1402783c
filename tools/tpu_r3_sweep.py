"""Round-3 single-process chip sweep: validate + headline timings for the
split streaming update / combined exchange work, HPL-AI vs uniform corpus.

One process => one compile-cache lifetime (the axon tunnel backend never
persists JAX's compilation cache across processes).  Each phase prints a
flushed line so partial results survive TPU-worker restarts.

Usage: python tools/tpu_r3_sweep.py [phases]
  phases: comma list from {val,16k,32k,64k,solve}; default val,16k,32k,64k
  MPF_XCHG_AB=1 additionally times the split-exchange variant at 16k/32k.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


_FAC_CACHE = {}


def _fac(n, policy, r, block):
    """Compiled-driver cache: repeat configs inside one sweep process must
    not recompile (~10 min each at n=32768 — the tunnel backend has no
    persistent compilation cache).  The A/B env knobs are read at TRACE
    time, so they are part of the key."""
    import mpf_tpu

    key = (n, policy.name, r, block,
           os.environ.get("MPF_XCHG"), os.environ.get("MPF_GM"),
           os.environ.get("MPF_QUANT16"), os.environ.get("MPF_SPLITB"),
           os.environ.get("MPF_SUPER"), os.environ.get("MPF_ABLATE"))
    if key not in _FAC_CACHE:
        _FAC_CACHE[key] = mpf_tpu.make_mpf(
            n, r=r, policy=policy, block=block, donate=True)
    return _FAC_CACHE[key]


def measure(n, policy, matrix="hpl", r=128, block=1024, iters=3):
    """Seconds per factorization, net of device-side generation."""
    import jax.numpy as jnp  # noqa: F401
    from mpf_tpu.utils import matgen
    from mpf_tpu.utils.timing import time_fn, tflops

    gen = (matgen.random_dense_device if matrix == "uniform"
           else matgen.hpl_ai_matrix_device)
    fac = _fac(n, policy, r, block)
    t0 = time.time()
    secs, _ = time_fn(lambda _: fac(gen(n, seed=0)), 0, warmup=1, iters=iters)
    gsecs, _ = time_fn(lambda _: gen(n, seed=0), 0, warmup=1, iters=2)
    net = max(secs - gsecs, 1e-9)
    tf = tflops(n, net)
    log(f"n={n} {policy.name} {matrix:8s}: {net*1e3:8.1f} ms  {tf:6.2f} TF/s "
        f"({100*tf/194.0:5.1f}% peak)  [wall {time.time()-t0:.0f}s incl compile]")
    return net


def main():
    phases = (sys.argv[1] if len(sys.argv) > 1 else "val,16k,32k,64k").split(",")
    ab = os.environ.get("MPF_XCHG_AB") == "1"

    import jax
    import jax.numpy as jnp
    import mpf_tpu
    from mpf_tpu.precision import ALL_BF16, MPF_BF16
    from mpf_tpu.utils import matgen
    from mpf_tpu.utils.oracle import check_factorization

    t0 = time.time()
    x = jnp.ones((256, 256), jnp.bfloat16)
    log(f"health: {float((x @ x).sum()):.3g} on {jax.devices()} "
        f"({time.time()-t0:.0f}s)")

    if "val" in phases:
        # compiled-kernel oracle probe at n=2048 (combined exchange default),
        # on BOTH matrix classes (uniform moves pivots on ~every column)
        for matrix, gen in (("hpl", matgen.hpl_ai_matrix),
                            ("uniform", matgen.random_dense)):
            a = gen(2048, seed=1)
            res = mpf_tpu.mpf_factorize(
                jnp.asarray(a, jnp.float32), r=128, policy=MPF_BF16, block=1024
            )
            rep = check_factorization(
                a.astype(np.float64), np.asarray(res.lu), np.asarray(res.ipiv),
                nbe_tol=1e-3,
            )
            log(f"validate n=2048 {matrix}: ok={rep.ok} "
                f"nbe={rep.normwise_backward_err:.2e}")
            assert rep.ok, rep

    if "superval" in phases:
        # compiled debut of the three-level driver: smallest size where
        # MPF_SUPER=auto activates (n >= 2*4096), oracle-checked on host
        n = 8192
        a = matgen.hpl_ai_matrix(n, seed=2)
        res = mpf_tpu.mpf_factorize(
            jnp.asarray(a, jnp.float32), r=128, policy=MPF_BF16, block=1024)
        rep = check_factorization(
            a.astype(np.float64), np.asarray(res.lu), np.asarray(res.ipiv),
            nbe_tol=1e-3)
        log(f"superval n={n} S=4096: ok={rep.ok} "
            f"nbe={rep.normwise_backward_err:.2e}")
        assert rep.ok, rep

    if "16k" in phases:
        measure(16384, MPF_BF16, "hpl")
        measure(16384, MPF_BF16, "uniform")
        if ab:
            os.environ["MPF_XCHG"] = "split"
            measure(16384, MPF_BF16, "hpl")
            measure(16384, MPF_BF16, "uniform")
            del os.environ["MPF_XCHG"]

    if "32k" in phases:
        measure(32768, MPF_BF16, "hpl")
        measure(32768, MPF_BF16, "uniform")
        if ab:
            os.environ["MPF_XCHG"] = "split"
            measure(32768, MPF_BF16, "hpl")
            del os.environ["MPF_XCHG"]

    if "32kattr" in phases:
        # regression attribution at the flagship size (STATUS: 453.7 ms
        # mid-round -> 508.5 ms after d61f1d3/5c4d306): A/B the group-major
        # pivot kernel and the exchange variant, one process
        log("-- 32k attribution: default (gm=1, combined exchange)")
        measure(32768, MPF_BF16, "hpl")
        os.environ["MPF_GM"] = "0"
        log("-- 32k attribution: MPF_GM=0 (flat strip kernel)")
        measure(32768, MPF_BF16, "hpl")
        del os.environ["MPF_GM"]
        os.environ["MPF_XCHG"] = "split"
        log("-- 32k attribution: MPF_XCHG=split")
        measure(32768, MPF_BF16, "hpl")
        del os.environ["MPF_XCHG"]
        os.environ["MPF_QUANT16"] = "0"
        log("-- 32k attribution: MPF_QUANT16=0 (exact two-reduce chain)")
        measure(32768, MPF_BF16, "hpl")
        del os.environ["MPF_QUANT16"]
        os.environ["MPF_SPLITB"] = "0"
        log("-- 32k attribution: MPF_SPLITB=0 (round-2 single-pass B kernel)")
        measure(32768, MPF_BF16, "hpl")
        del os.environ["MPF_SPLITB"]

    if "super" in phases:
        # three-level blocking A/B at the flagship size: the far-trailing
        # fp32 RMW traffic drops ~3x (8n^3/(3*1024) -> 8n^3/(3*4096) + mid)
        log("-- 32k superblock A/B")
        measure(32768, MPF_BF16, "hpl")              # MPF_SUPER auto (4096)
        os.environ["MPF_SUPER"] = "0"
        log("-- 32k attribution: MPF_SUPER=0 (two-level)")
        measure(32768, MPF_BF16, "hpl")
        del os.environ["MPF_SUPER"]

    if "super64" in phases:
        log("-- 64k superblock A/B (ALL_BF16)")
        measure(65536, ALL_BF16, "hpl")
        os.environ["MPF_SUPER"] = "0"
        measure(65536, ALL_BF16, "hpl")
        del os.environ["MPF_SUPER"]

    if "blk" in phases:
        # outer block-size A/B at the flagship size: trailing-GEMM HBM
        # traffic scales as 1/block (8*n^3/(3*block) bytes), while the B
        # streaming stage scales up with block — measure the trade.
        log("-- 32k block A/B")
        measure(32768, MPF_BF16, "hpl", block=2048)
        measure(32768, MPF_BF16, "hpl", block=1024)

    if "64k" in phases:
        measure(65536, ALL_BF16, "hpl")
        measure(65536, ALL_BF16, "uniform")

    if "64kblk" in phases:
        measure(65536, ALL_BF16, "hpl", block=2048)

    if "confirm" in phases:
        # round-3 closing confirmation: combine the sweep-3 A/B winners
        # (block=2048 won by 34 ms, MPF_SPLITB=0 by 10 ms at n=32768) and
        # measure the prospective default on BOTH corpora (uniform = the
        # honest pivot-heavy number, VERDICT item 4); same env key => the
        # uniform leg reuses the compiled driver.
        os.environ["MPF_SPLITB"] = "0"
        log("-- confirm: 32k block=2048 + MPF_SPLITB=0 (combined winners)")
        measure(32768, MPF_BF16, "hpl", block=2048)
        log("-- confirm: 32k block=2048 + MPF_SPLITB=0, uniform corpus")
        measure(32768, MPF_BF16, "uniform", block=2048)
        del os.environ["MPF_SPLITB"]
        log("-- confirm: 64k ALL_BF16 block=2048")
        measure(65536, ALL_BF16, "hpl", block=2048)

    if "solve" in phases:
        from mpf_tpu.utils.timing import time_fn

        n = 32768
        a = matgen.hpl_ai_matrix_device(n, seed=0)
        b = jnp.ones((n,), jnp.float32)
        t0 = time.time()
        out = mpf_tpu.mpf_solve(a, b, r=128, sweeps=3)
        rn = np.asarray(out.residual_norms, np.float64)
        log(f"solve n={n}: residual norms {rn} in {time.time()-t0:.0f}s "
            "(compile incl)")
        # a/b must be ARGUMENTS: time_fn jits its wrapper, and closed-over
        # device arrays become lowering-time constants (the 4.3 GB matrix
        # baked into the executable hung the round-3 sweep here).  warmup=1:
        # with warmup=0 the wrapper's fresh compile (~60-100 s at n=32768)
        # landed inside the timed region (sweep-3's bogus 126.6 s reading).
        secs, _ = time_fn(
            lambda x, rhs: mpf_tpu.mpf_solve(x, rhs, r=128, sweeps=3).x, a, b,
            warmup=1, iters=2,
        )
        log(f"solve n={n}: {secs*1e3:.1f} ms end-to-end (factor+IR)")

    log("sweep done")


if __name__ == "__main__":
    main()
