"""Consolidated TPU validation + perf sweep (run on the real chip).

Used because the session's TPU tunnel is flaky: run everything in one
process, print progress line by line, tolerate worker restarts between
stages.  Usage:  python tools/tpu_validate.py [stage...]
Stages: health kernel driver bench  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def stage_health():
    x = jnp.ones((128, 128))
    log("health:", float(jnp.sum(jnp.dot(x, x))))


def stage_kernel():
    import mpf_tpu.config as cfg
    from mpf_tpu.ops.panel_pallas import hgetf2_panel, getf2_npv_block
    from mpf_tpu.ops.getf2 import panel_pivots_perm

    rng = np.random.default_rng(0)
    for m in [512, 4096, 16384]:
        r = 128
        pan = jnp.asarray(rng.random((m, r)) * 9.9, jnp.bfloat16)
        f = jax.jit(lambda p: jnp.sum(hgetf2_panel(p, 0)[0]))
        t0 = time.perf_counter()
        v = float(f(pan))
        log(f"kernel m={m}: first {time.perf_counter()-t0:.1f}s sum={v}")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(pan))
            ts.append(time.perf_counter() - t0)
        log(f"kernel m={m}: steady {min(ts)*1000:.1f} ms (incl ~30ms dispatch)")
        # correctness: same pivots produce an oracle-valid factorization via
        # driver tests; here check piv is a valid permutation prefix
        piv, perm = jax.jit(lambda p: hgetf2_panel(p, 0))(pan)
        piv = np.asarray(piv)
        perm = np.asarray(perm)
        assert np.all(piv >= np.arange(r)), "pivot below diagonal"
        assert sorted(perm.tolist()) == list(range(m)), "perm not a permutation"
        log(f"kernel m={m}: piv/perm structurally valid")


def stage_driver():
    import mpf_tpu.config as cfg
    from mpf_tpu.models.mpf import mpf_factorize_traced
    from mpf_tpu.precision import MPF_BF16
    from mpf_tpu.utils import matgen
    from mpf_tpu.utils.timing import time_fn, tflops
    from mpf_tpu.utils.oracle import check_factorization

    for use in ["1", "0"]:
        cfg._USE_PALLAS = use
        for n, r, blk in [(2048, 128, 2048), (4096, 128, 2048), (8192, 128, 2048)]:
            a = jnp.asarray(matgen.hpl_ai_matrix(n, seed=0))
            fn = lambda a: mpf_factorize_traced(a, r=r, policy=MPF_BF16, block=blk)
            t0 = time.perf_counter()
            secs, _ = time_fn(fn, a, warmup=1, iters=3)
            log(
                f"driver pallas={use} n={n}: {secs*1000:.1f} ms = {tflops(n, secs):.2f} TF/s"
                f" (stage total {time.perf_counter()-t0:.0f}s)"
            )
    # oracle on the pallas path
    cfg._USE_PALLAS = "1"
    a = matgen.hpl_ai_matrix(2048, seed=1)
    res = jax.jit(lambda a: mpf_factorize_traced(a, r=128, policy=MPF_BF16, block=2048))(
        jnp.asarray(a)
    )
    rep = check_factorization(a, np.asarray(res.lu), np.asarray(res.ipiv), nbe_tol=1e-3)
    log("driver pallas oracle n=2048:", rep)
    assert rep.ok


def stage_bench():
    os.environ["BENCH_N"] = os.environ.get("BENCH_N", "8192")
    import runpy

    runpy.run_path(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
        run_name="__main__",
    )


STAGES = {
    "health": stage_health,
    "kernel": stage_kernel,
    "driver": stage_driver,
    "bench": stage_bench,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["health", "kernel", "driver", "bench"]
    for name in names:
        log(f"=== stage {name} ===")
        t0 = time.perf_counter()
        STAGES[name]()
        log(f"=== stage {name} done in {time.perf_counter()-t0:.0f}s ===")
