"""Consolidated TPU measurement lab (round 3: replaces the ten one-off
tools/tpu_*.py harnesses — VERDICT r2 weak #8).

One process per invocation, tunnel-safe timing via on-device scalar
fingerprints (`mpf_tpu/utils/timing.py`), progress printed line by line so
partial results survive TPU-worker restarts.

Usage:  python tools/tpu_lab.py CMD [options]

  health                         tiny-matmul chip check
  validate  [--n 2048]           compiled-kernel oracle probe at small n
  time      [--n 32768 ...]      timed factorization, net of generation
  uniform   [--n 32768 ...]      same, on the uniform (pivot-heavy) corpus
  ablate    [--n 32768 ...]      MPF_ABLATE skeleton ablation (subprocesses)
  micro     [--m 8192 ...]       per-kernel fori-amortized micro-bench
  solve     [--n 32768 ...]      factor + getrs/IR solve timing + BE
  batched   [--bsz 4096 --n 256] batched driver vs XLA's batched LU

Common options: --n, --r, --block, --policy {mpf_bf16,all_bf16,mpf_fp16,
pure_fp32,mpf_ref}, --iters, --seed, --matrix {hpl,uniform}.
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def _policy(name):
    from mpf_tpu import precision

    return {
        "mpf_bf16": precision.MPF_BF16,
        "all_bf16": precision.ALL_BF16,
        "mpf_fp16": precision.MPF_FP16,
        "pure_fp32": precision.PURE_FP32,
        "mpf_ref": precision.MPF_REF,
    }[name]


def _gen(args, n=None, seed=None):
    from mpf_tpu.utils import matgen

    n = n or args.n
    seed = args.seed if seed is None else seed
    if args.matrix == "uniform":
        return matgen.random_dense_device(n, seed=seed)
    return matgen.hpl_ai_matrix_device(n, seed=seed)


def cmd_health(args):
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    v = float((x @ x).sum())
    print(f"devices={jax.devices()} matmul={v:.3g} in {time.time()-t0:.1f}s")


def cmd_validate(args):
    import jax.numpy as jnp
    import numpy as np

    import mpf_tpu
    from mpf_tpu.utils import matgen
    from mpf_tpu.utils.oracle import check_factorization

    n = args.n if args.n != 32768 else 2048
    a = matgen.hpl_ai_matrix(n, seed=1)
    res = mpf_tpu.mpf_factorize(
        jnp.asarray(a), r=args.r, policy=_policy(args.policy), block=args.block
    )
    rep = check_factorization(
        a.astype(np.float64), np.asarray(res.lu), np.asarray(res.ipiv),
        nbe_tol=args.tol,
    )
    print(f"n={n} policy={args.policy} nbe={rep.normwise_backward_err:.3e} "
          f"maxabs={rep.max_abs_err:.3e} ok={rep.ok} info={int(res.info)}")
    if not rep.ok:
        sys.exit(1)


def _timed_factor(args, n):
    from mpf_tpu.models.mpf import make_mpf
    from mpf_tpu.utils.timing import time_fn, tflops

    fac = make_mpf(n, r=args.r, policy=_policy(args.policy), block=args.block,
                   donate=True)
    secs, _ = time_fn(lambda s: fac(_gen(args, n, seed=s)), 0,
                      warmup=1, iters=args.iters)
    gsecs, _ = time_fn(lambda s: _gen(args, n, seed=s), 0, warmup=1, iters=2)
    secs = max(secs - gsecs, 1e-9)
    return secs, tflops(n, secs)


def cmd_time(args):
    secs, tf = _timed_factor(args, args.n)
    print(f"n={args.n} r={args.r} block={args.block} policy={args.policy} "
          f"matrix={args.matrix}: {secs*1e3:.1f} ms  {tf:.2f} TF/s "
          f"({100*tf/194.0:.1f}% of sustained bf16 MXU)")


def cmd_uniform(args):
    """HPL-AI vs uniform corpus at the same size: the exchange-cost delta
    (VERDICT r2 item 4 — pivots move on ~every column on uniform)."""
    for matrix in ("hpl", "uniform"):
        args.matrix = matrix
        secs, tf = _timed_factor(args, args.n)
        print(f"n={args.n} {matrix:8s}: {secs*1e3:8.1f} ms  {tf:6.2f} TF/s",
              flush=True)


def cmd_ablate(args):
    """Stage ablation via MPF_ABLATE in subprocesses (results numerically
    WRONG under ablation — timing attribution only)."""
    script = (
        "import os\n"
        f"os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', {os.path.join(REPO, '.jax_cache')!r})\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from tools.tpu_lab import _timed_factor, build_args\n"
        "a = build_args(%r)\n"
        "secs, tf = _timed_factor(a, a.n)\n"
        "print('%%7.1f ms  (%%6.2f TF/s)' %% (secs*1e3, tf), flush=True)\n"
    ) % (REPO, vars(args))
    stages = args.stages.split("/") if args.stages else [
        "", "a1", "a2", "bstream", "exchange", "outer",
        "a1,a2,bstream,exchange,outer,slabio",
    ]
    for tag in stages:
        env = dict(os.environ, MPF_ABLATE=tag)
        r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                           text=True, cwd=REPO, env=env)
        out = (r.stdout.strip().splitlines() or [r.stderr[-200:]])[-1]
        print(f"{tag or 'baseline':26s}: {out}", flush=True)


def cmd_micro(args):
    """Per-kernel cost of the fused panel pipeline, ITERS reps data-chained
    inside one jitted fori_loop (tunnel RTT amortized)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpf_tpu.ops.panel_fused import rowblock_assemble, panel_apply_update_trim
    from mpf_tpu.ops.panel_strip import strip_panel_pivots

    m, bc, r, iters = args.m, args.block, args.r, args.iters_micro
    work = jnp.bfloat16 if args.policy == "all_bf16" else jnp.float32
    panel_dt = jnp.bfloat16 if "bf16" in args.policy else jnp.float32
    rng = np.random.default_rng(0)
    slab = jnp.asarray(rng.standard_normal((m, bc)), work)
    pos0 = jnp.arange(m, dtype=jnp.int32)

    # dispatch floor: the tunnel RTT (~28 ms) rides on every host-visible
    # fetch — measure it with a null jit and subtract, else a 0.2 ms/iter
    # kernel at iters=32 reads as 1.1 ms/iter (round-3 lesson)
    null = jax.jit(lambda x: x + 1.0)
    for _ in range(2):
        float(null(jnp.float32(1)))
    t0 = time.perf_counter()
    for _ in range(4):
        fp0 = float(null(jnp.float32(1)))
    rtt = (time.perf_counter() - t0) / 4
    print(f"dispatch floor: {rtt*1e3:.1f} ms", flush=True)

    def bench(name, fn, *xs):
        g = jax.jit(fn)
        for _ in range(2):
            fp = float(jnp.sum(jax.tree.leaves(g(*xs))[0].astype(jnp.float32)))
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fp = float(jnp.sum(jax.tree.leaves(g(*xs))[0].astype(jnp.float32)))
            dts.append(time.perf_counter() - t0)
        dt = max(min(dts) - rtt, 0.0)
        print(f"{name:24s}: {dt*1e3/iters:8.3f} ms/iter (total {dt*1e3:6.0f} ms"
              f" net of {rtt*1e3:.0f} ms dispatch, fp={fp:.3e})", flush=True)

    def a1(slab, pos):
        def body(t, c):
            pos, acc = c
            piv, pos, gl = strip_panel_pivots(slab, 0, pos, panel_dtype=panel_dt,
                                              jj0=0, r=r)
            return pos, acc + jnp.sum(piv)
        return jax.lax.fori_loop(0, iters, body, (pos, jnp.int32(0)))

    bench("A1 strip pivots", a1, slab, pos0)

    glist = jnp.arange(r, dtype=jnp.int32) * (m // r)

    def a2(slab):
        def body(t, c):
            rb, uinv, info = rowblock_assemble(slab, glist + t % 7, 0)
            return c + jnp.sum(rb.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    bench("A2 rowblock assemble", a2, slab)

    rowblock = jnp.asarray(rng.standard_normal((r, bc)), work)
    uinv = jnp.asarray(np.triu(rng.standard_normal((r, r))), work)

    from mpf_tpu.models.mpf import _FUSED_RB

    rb = min(_FUSED_RB, m)

    def bstage(slab):
        def body(t, s):
            return panel_apply_update_trim(s, pos0, rowblock, uinv,
                                           jnp.int32(0), 0, rb=rb)
        return jax.lax.fori_loop(0, iters, body, slab)

    bench("B streaming update", bstage, slab)

    # ---- exchange A/B at matrix width m: combined one-sweep kernel vs the
    # round-2 gather + band-source-scatter pair, on (a) a diagonally
    # dominant pivot pattern (sources mostly in-band) and (b) a
    # uniform-heavy one (every band row moves to a spread-out window) ------
    from mpf_tpu.ops.exchange import rows_exchange
    from mpf_tpu.ops.panel_fused import rows_gather, rows_scatter_from_band

    n = m  # square matrix: exchange cost scales with row WIDTH
    a_full = jnp.asarray(rng.standard_normal((n, n)), work)
    k0 = 0
    nrb = min(bc, n // 2)
    for tag in ("diag", "uniform"):
        rows = np.arange(n)
        rngl = np.random.default_rng(1)
        for j in range(nrb):  # sequential partial-pivoting swap chains
            if tag == "uniform":
                p = rngl.integers(k0 + j, n)
            else:
                p = k0 + j if rngl.random() < 0.7 else rngl.integers(k0 + j, n)
            rows[k0 + j], rows[p] = rows[p], rows[k0 + j]
        inv = np.empty(n, np.int64)
        inv[rows] = np.arange(n)
        glist = jnp.asarray(rows[k0:k0 + nrb], jnp.int32)
        dests = jnp.asarray(inv[k0:k0 + nrb], jnp.int32)

        def xcomb(a):
            def body(t, a):
                a, piv = rows_exchange(a, k0, glist, dests)
                return jax.lax.dynamic_update_slice(a, piv, (k0, 0))
            return jax.lax.fori_loop(0, iters, body, a)

        def xsplit(a):
            def body(t, a):
                piv = rows_gather(a, glist)
                a = rows_scatter_from_band(a, k0, dests)
                return jax.lax.dynamic_update_slice(a, piv, (k0, 0))
            return jax.lax.fori_loop(0, iters, body, a)

        bench(f"exch combined {tag}", xcomb, a_full)
        bench(f"exch split    {tag}", xsplit, a_full)

    # ---- trailing GEMM: epilogue-fused kernel vs raw XLA dot at the same
    # shape, with the HBM roofline for context (read+write A22 dominates;
    # MXU floor = 2*m*m*k flops / 194 TF/s) -------------------------------
    from mpf_tpu.ops.panel_fused import trailing_gemm_sub

    kk = bc
    l21 = jnp.asarray(rng.standard_normal((m, kk)),
                      jnp.bfloat16 if "bf16" in args.policy else work)
    u12 = jnp.asarray(rng.standard_normal((kk, m)), l21.dtype)

    def tgemm(a):
        def body(t, a):
            return trailing_gemm_sub(a, l21, u12, 0)
        return jax.lax.fori_loop(0, iters, body, a)

    def tdot(a):
        def body(t, a):
            upd = jnp.dot(l21, u12, preferred_element_type=jnp.float32)
            return (a.astype(jnp.float32) - upd).astype(a.dtype)
        return jax.lax.fori_loop(0, iters, body, a)

    bench("trailing epilogue GEMM", tgemm, a_full)
    bench("trailing XLA dot-sub", tdot, a_full)
    it = jnp.dtype(work).itemsize
    hbm_ms = 2 * m * m * it / 819e9 * 1e3
    mxu_ms = 2 * m * m * kk / 194e12 * 1e3
    print(f"rooflines per iter: HBM(a r+w) {hbm_ms:.2f} ms, "
          f"MXU {mxu_ms:.2f} ms", flush=True)

    # ---- superblock far GEMM (kk=4096): adaptive (ti, t) choice A/B ------
    kw = min(4096, m)
    l21w = jnp.asarray(rng.standard_normal((m, kw)) / 64.0, l21.dtype)
    u12w = jnp.asarray(rng.standard_normal((kw, m)), l21.dtype)

    def tgemmw(a):
        def body(t, a):
            return trailing_gemm_sub(a, l21w, u12w, 0)
        return jax.lax.fori_loop(0, iters, body, a)

    def tgemmw1k(a):
        def body(t, a):
            return trailing_gemm_sub(a, l21w, u12w, 0, _ti=1024)
        return jax.lax.fori_loop(0, iters, body, a)

    bench(f"far GEMM kk={kw} auto", tgemmw, a_full)
    bench(f"far GEMM kk={kw} ti=1024", tgemmw1k, a_full)
    mxu_w = 2 * m * m * kw / 194e12 * 1e3
    print(f"far rooflines per iter: HBM {hbm_ms:.2f} ms, MXU {mxu_w:.2f} ms",
          flush=True)


def cmd_solve(args):
    import jax.numpy as jnp
    import numpy as np

    import mpf_tpu
    from mpf_tpu.models.refine import ir_solve
    from mpf_tpu.models.solve import getrs
    from mpf_tpu.utils.timing import time_fn
    from mpf_tpu.utils.oracle import solve_residual

    n = args.n
    pol = _policy(args.policy)
    a = _gen(args, n)
    fac = mpf_tpu.make_mpf(n, r=args.r, policy=pol, block=args.block,
                           donate=False)
    fsecs, _ = time_fn(fac, a, warmup=1, iters=1)
    res = fac(a)
    b = jnp.ones((n,), jnp.float32)
    ssecs, _ = time_fn(
        lambda lu, perm, bb: getrs(lu, None, bb, perm=perm),
        res.lu, res.perm, b, warmup=1, iters=args.iters)
    print(f"n={n}: factor {fsecs*1e3:.0f} ms, getrs {ssecs*1e3:.1f} ms", flush=True)
    isecs, _ = time_fn(
        lambda aa, lu, perm, bb: ir_solve(aa, lu, None, bb, sweeps=3, perm=perm).x,
        a, res.lu, res.perm, b, warmup=1, iters=args.iters)
    ir = ir_solve(a, res.lu, None, b, sweeps=3, perm=res.perm)
    # backward error via on-device residual (host O(n^2) transfer is too slow)
    x = ir.x
    num = float(jnp.max(jnp.abs(a.astype(jnp.float32) @ x - b)))
    den = float(jnp.max(jnp.sum(jnp.abs(a), axis=1)) * jnp.max(jnp.abs(x)) +
                jnp.max(jnp.abs(b)))
    print(f"n={n}: ir_solve(3) {isecs*1e3:.1f} ms, be={num/den:.3e} "
          f"diverged={bool(ir.diverged)}", flush=True)


def cmd_batched(args):
    """Batched driver vs XLA's own batched LU at the config-5 shape."""
    import jax
    import jax.numpy as jnp

    from mpf_tpu.models.batched import batched_factorize
    from mpf_tpu.utils.timing import time_fn

    bsz, n = args.bsz, args.n if args.n != 32768 else 256
    key = jax.random.PRNGKey(args.seed)
    a = jax.random.uniform(key, (bsz, n, n), jnp.float32) + \
        jnp.eye(n)[None] * (n / 4.0)
    pol = _policy(args.policy if args.policy != "mpf_bf16" else "pure_fp32")
    psecs, _ = time_fn(lambda x: batched_factorize(x, r=args.r, policy=pol).lu,
                       a, warmup=1, iters=args.iters)
    xsecs, _ = time_fn(
        jax.jit(jax.vmap(lambda m: jax.scipy.linalg.lu_factor(m)[0])),
        a, warmup=1, iters=args.iters)
    fl = bsz * 2 * n**3 / 3
    print(f"batched {bsz}x{n}^2: driver {psecs*1e3:.0f} ms ({fl/psecs/1e12:.3f}"
          f" TF/s), xla lu_factor {xsecs*1e3:.0f} ms ({fl/xsecs/1e12:.3f} TF/s)")


def cmd_dist11(args):
    """(1,1)-mesh fused dist driver vs the single-chip driver at the same
    size: the replicated-panel SPMD structure's overhead with zero
    communication (VERDICT r2 weak #5 / item 5 — round 2 measured +20-29%;
    round 3 confined dist trailing GEMMs to static tail windows)."""
    import jax
    import jax.numpy as jnp

    import mpf_tpu
    from mpf_tpu.parallel.mesh import make_mesh
    from mpf_tpu.parallel.block_cyclic import shard_block_cyclic
    from mpf_tpu.parallel.dist_lu import make_dist_lu
    from mpf_tpu.utils.timing import time_fn

    n, b, r = args.n, args.block, args.r
    pol = _policy(args.policy)
    a = _gen(args, n)
    fac = mpf_tpu.make_mpf(n, r=r, policy=pol, block=b, donate=False)
    ssecs, _ = time_fn(fac, a, warmup=1, iters=args.iters)
    # apples-to-apples structural overhead: the dist driver has no
    # superblock deferral yet, so also time the two-level single-chip driver
    fac2 = mpf_tpu.make_mpf(n, r=r, policy=pol, block=b, donate=False,
                            super_block=None)
    s2secs, _ = time_fn(fac2, a, warmup=1, iters=args.iters)
    import jax as _jax
    mesh = make_mesh((1, 1), devices=_jax.devices()[:1])
    tiles = shard_block_cyclic(a, mesh, b)
    dfn = make_dist_lu(n, b, mesh, pol, r=r)
    dsecs, _ = time_fn(lambda t: dfn(t)[0], tiles, warmup=1, iters=args.iters)
    print(f"dist11 n={n} b={b}: single {ssecs*1e3:.0f} ms "
          f"(two-level {s2secs*1e3:.0f} ms), dist(1,1) {dsecs*1e3:.0f} ms  "
          f"(+{100*(dsecs/ssecs-1):.1f}% vs single, "
          f"+{100*(dsecs/s2secs-1):.1f}% structural vs two-level)", flush=True)


def build_args(d=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", nargs="?", default="health",
                   choices=["health", "validate", "time", "uniform", "ablate",
                            "micro", "solve", "batched", "dist11"])
    p.add_argument("--n", type=int, default=32768)
    p.add_argument("--m", type=int, default=8192)
    p.add_argument("--r", type=int, default=128)
    p.add_argument("--block", type=int, default=1024)
    p.add_argument("--bsz", type=int, default=4096)
    p.add_argument("--policy", default="mpf_bf16",
                   choices=["mpf_bf16", "all_bf16", "mpf_fp16", "pure_fp32",
                            "mpf_ref"])
    p.add_argument("--matrix", default="hpl", choices=["hpl", "uniform"])
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--iters-micro", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--stages", default="")
    if d is not None:
        a = p.parse_args([])
        for k, v in d.items():
            setattr(a, k, v)
        return a
    return p.parse_args()


def main():
    args = build_args()
    globals()[f"cmd_{args.cmd}"](args)


if __name__ == "__main__":
    main()
