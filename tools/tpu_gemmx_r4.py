"""Chip validation + perf A/B for the fused trailing-GEMM + exchange kernel
(`ops/gemmx.py`, round 4).  One process, phases in order (compile cache does
not persist through the tunnel — keep every measurement in this process):

  val    compiled debut at n=4096: fused vs (plain gemmx -> rows_exchange)
         bit-exact on chip, fp32 + bf16
  perf   n=32768 plain gemmx vs panel_fused.trailing_gemm_sub (the round-3
         auto-pipelined kernel), fp32(kk=2048) + bf16(kk=1024)
  perfx  n=32768 fused (GEMM+exchange) vs serial (GEMM then rows_exchange),
         uniform-style pivot movement (every band row moves)

Usage: python tools/tpu_gemmx_r4.py [val perf perfx ...]  (default: all)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from mpf_tpu.ops.exchange import rows_exchange
from mpf_tpu.ops.gemmx import gemm_trailing
from mpf_tpu.ops.panel_fused import trailing_gemm_sub

INTERPRET = jax.default_backend() != "tpu"


def _fp(x):
    return float(jnp.sum(x[::997, ::499].astype(jnp.float32)))


def _rtt():
    null = jax.jit(lambda x: x + 1.0)
    for _ in range(2):
        float(null(jnp.float32(1)))
    t0 = time.perf_counter()
    for _ in range(4):
        float(null(jnp.float32(1)))
    return (time.perf_counter() - t0) / 4


def _rand_band_perm(rng, n, k, bc):
    perm = np.arange(k, n)
    for i in range(bc):
        j = rng.integers(i, n - k)
        perm[[i, j]] = perm[[j, i]]
    glist = perm[:bc].copy()
    inv = np.empty(n - k, dtype=np.int64)
    inv[perm - k] = np.arange(n - k)
    return (jnp.asarray(glist, jnp.int32), jnp.asarray(inv[:bc] + k, jnp.int32))


def phase_val():
    rng = np.random.default_rng(3)
    n, kk, k = 4096, 1024, 1024
    r0, c0, bc = k, k + kk, 512
    for dt in (jnp.float32, jnp.bfloat16):
        a = jnp.asarray(rng.standard_normal((n, n)), dt)
        l21 = jnp.asarray(rng.standard_normal((n - r0, kk)), dt)
        u12 = jnp.asarray(rng.standard_normal((kk, n - c0)), dt)
        glist, dests = _rand_band_perm(rng, n, k, bc)
        ag = jax.jit(lambda a: gemm_trailing(a, l21, u12, r0, c0,
                                             interpret=INTERPRET))(a)
        ref_a, ref_piv = jax.jit(
            lambda a: rows_exchange(a, k, glist, dests, interpret=INTERPRET)
        )(ag)
        out_a, out_piv = jax.jit(
            lambda a: gemm_trailing(a, l21, u12, r0, c0,
                                    xargs=(k, glist, dests),
                                    interpret=INTERPRET)
        )(a)
        # compare on device (D2H is ~10 MB/s through the tunnel)
        mask = jnp.ones((n, 1), bool).at[k:k + bc].set(False)
        d_a = jnp.max(jnp.abs(jnp.where(mask, out_a.astype(jnp.float32)
                                        - ref_a.astype(jnp.float32), 0.0)))
        d_p = jnp.max(jnp.abs(out_piv.astype(jnp.float32)
                              - ref_piv.astype(jnp.float32)))
        print(f"val {jnp.dtype(dt).name}: max|fused-composed| a={float(d_a)} "
              f"piv={float(d_p)} {'OK' if float(d_a) == 0 == float(d_p) else 'FAIL'}",
              flush=True)


def _bench(name, fn, a, iters, rtt, flops=None):
    g = jax.jit(fn)
    for _ in range(2):
        fp = _fp(g(a))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fp = _fp(g(a))
        dts.append(time.perf_counter() - t0)
    dt = max(min(dts) - rtt, 0.0) / iters
    extra = f", {flops / dt / 1e12:.1f} TF/s" if flops else ""
    print(f"{name:34s}: {dt*1e3:8.2f} ms/iter{extra} (fp={fp:.4e})", flush=True)
    return dt


def phase_perf(iters=8):
    # fp32 at kk=1024: the kk=2048 FUSED kernel exceeds the tunnel's
    # remote-compile size limit (HTTP 413), so the fp32 lookahead driver
    # runs block=1024 — measure the matching GEMM shape.
    rtt = _rtt()
    print(f"dispatch floor {rtt*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(5)
    n = 32768
    for dt, kk in ((jnp.bfloat16, 1024), (jnp.float32, 1024)):
        r0, c0 = kk, 2 * kk
        m, w = n - r0, n - c0
        a = jnp.asarray(rng.standard_normal((n, n)), dt)
        l21 = jnp.asarray(rng.standard_normal((m, kk)), dt)
        u12 = jnp.asarray(rng.standard_normal((kk, w)), dt)
        flops = 2.0 * m * w * kk

        def plain(a):
            def body(i, a):
                return gemm_trailing(a, l21, u12, r0, c0, interpret=INTERPRET)
            return jax.lax.fori_loop(0, iters, body, a)

        def auto(a):
            def body(i, a):
                return trailing_gemm_sub(a, l21, u12, r0, ncols=w)
            return jax.lax.fori_loop(0, iters, body, a)

        name = jnp.dtype(dt).name
        if not INTERPRET:
            _bench(f"{name} kk={kk} auto (round-3)", auto, a, iters, rtt, flops)
        _bench(f"{name} kk={kk} gemmx plain", plain, a, iters, rtt, flops)


def phase_perfx(iters=8):
    rtt = _rtt()
    rng = np.random.default_rng(9)
    n = 32768
    for dt, kk in ((jnp.bfloat16, 1024), (jnp.float32, 1024)):
        r0, c0 = kk, 2 * kk
        k, bc = r0, kk
        m, w = n - r0, n - c0
        a = jnp.asarray(rng.standard_normal((n, n)), dt)
        l21 = jnp.asarray(rng.standard_normal((m, kk)), dt)
        u12 = jnp.asarray(rng.standard_normal((kk, w)), dt)
        glist, dests = _rand_band_perm(rng, n, k, bc)
        flops = 2.0 * m * w * kk

        def fused(a):
            def body(i, a):
                a2, piv = gemm_trailing(a, l21, u12, r0, c0,
                                        xargs=(k, glist, dests),
                                        interpret=INTERPRET)
                return jax.lax.dynamic_update_slice(a2, piv.astype(a2.dtype),
                                                    (k, 0))
            return jax.lax.fori_loop(0, iters, body, a)

        def serial(a):
            def body(i, a):
                a2 = gemm_trailing(a, l21, u12, r0, c0, interpret=INTERPRET)
                a3, piv = rows_exchange(a2, k, glist, dests,
                                        interpret=INTERPRET)
                return jax.lax.dynamic_update_slice(a3, piv.astype(a3.dtype),
                                                    (k, 0))
            return jax.lax.fori_loop(0, iters, body, a)

        name = jnp.dtype(dt).name
        t_f = _bench(f"{name} kk={kk} FUSED gemm+xchg", fused, a, iters, rtt,
                     flops)
        t_s = _bench(f"{name} kk={kk} serial gemm,xchg", serial, a, iters, rtt,
                     flops)
        print(f"  -> exchange hidden: {1e3*(t_s - t_f):.2f} ms/iter "
              f"({100*(t_s-t_f)/max(t_s,1e-9):.1f}% of serial)", flush=True)


def phase_valroll():
    """Chip bit-exactness of the MPF_XSEL=roll extraction (compiled Mosaic
    lowering of the dynamic uniform sublane rotate) vs the masked default."""
    rng = np.random.default_rng(11)
    n, k, bc = 4096, 1024, 512
    for dt in (jnp.float32, jnp.bfloat16):
        a = jnp.asarray(rng.standard_normal((n, n)), dt)
        glist, dests = _rand_band_perm(rng, n, k, bc)
        outs = {}
        for xsel in ("masked", "roll"):
            os.environ["MPF_XSEL"] = xsel
            a2, piv = jax.jit(
                lambda a: rows_exchange(a, k, glist, dests,
                                        interpret=INTERPRET)
            )(a)
            outs[xsel] = (a2, piv)
        d_a = jnp.max(jnp.abs(outs["roll"][0].astype(jnp.float32)
                              - outs["masked"][0].astype(jnp.float32)))
        d_p = jnp.max(jnp.abs(outs["roll"][1].astype(jnp.float32)
                              - outs["masked"][1].astype(jnp.float32)))
        ok = float(d_a) == 0 == float(d_p)
        print(f"valroll {jnp.dtype(dt).name}: a={float(d_a)} piv={float(d_p)}"
              f" {'OK' if ok else 'FAIL'}", flush=True)
    os.environ.pop("MPF_XSEL", None)


def phase_xchg(iters=16):
    """Standalone combined one-sweep exchange, xsel A/B, uniform-style
    movement (every band row moves) at the flagship size."""
    rtt = _rtt()
    rng = np.random.default_rng(7)
    n = 32768
    for dt in (jnp.bfloat16, jnp.float32):
        a = jnp.asarray(rng.standard_normal((n, n)), dt)
        k, bc = 1024, 1024
        glist, dests = _rand_band_perm(rng, n, k, bc)
        for xsel in ("masked", "roll"):
            os.environ["MPF_XSEL"] = xsel

            def run(a):
                def body(i, a):
                    a2, piv = rows_exchange(a, k, glist, dests,
                                            interpret=INTERPRET)
                    return jax.lax.dynamic_update_slice(
                        a2, piv.astype(a2.dtype), (k, 0))
                return jax.lax.fori_loop(0, iters, body, a)

            _bench(f"{jnp.dtype(dt).name} xchg xsel={xsel}", run, a, iters,
                   rtt)
    os.environ.pop("MPF_XSEL", None)


PHASES = {"val": phase_val, "perf": phase_perf, "perfx": phase_perfx,
          "valroll": phase_valroll, "xchg": phase_xchg}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PHASES)
    print(f"backend={jax.default_backend()} interpret={INTERPRET}", flush=True)
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        try:
            PHASES[nm]()
        except Exception as e:  # noqa: BLE001
            msg = " ".join(str(e).split())[:400]
            print(f"{nm}: TOPLEVEL FAIL {type(e).__name__}: {msg}", flush=True)
    print("done", flush=True)
