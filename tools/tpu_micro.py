"""Micro-benchmarks of driver inner-loop components, amortized over a
fori_loop inside one jit (dispatch-free)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from mpf_tpu.ops.panel_pallas import (
    hgetf2_panel,
    getf2_npv_block,
    getf2_npv_inv_block,
    unit_lower_inv_pallas,
)
from mpf_tpu.ops.blas3 import unit_lower_inv, upper_inv

M_, R, BC, IT = 4096, 128, 2048, 32
rng = np.random.default_rng(0)
slab = jnp.asarray(rng.random((M_, BC)), jnp.float32)
pan_bf = jnp.asarray(rng.random((R, M_)), jnp.bfloat16)  # pre-transposed
pan_nt = jnp.asarray(rng.random((M_, R)), jnp.bfloat16)
diag = jnp.asarray(rng.random((R, R)) + R * np.eye(R), jnp.float32)


def timed(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t*1000:.1f} ms total, {t/IT*1e6:.0f} us/iter", flush=True)


def loop(body):
    def fn(x):
        def b(i, acc):
            return acc + body(i, x)
        return jax.lax.fori_loop(0, IT, b, jnp.float32(0))
    return fn


# E1: cast+transpose of a (M, R) fp32 slice -> (R, M) bf16
timed("cast_transpose", loop(
    lambda i, x: jnp.sum(jnp.swapaxes(
        jax.lax.dynamic_slice(x, (0, (i % 16) * 128), (M_, R)).astype(jnp.bfloat16), 0, 1
    ).astype(jnp.float32)[0, :1])), slab)

# E2: hgetf2 kernel on an already-(m,r) panel (includes its wrapper transpose)
timed("hgetf2_incl_transpose", loop(
    lambda i, x: jnp.sum(hgetf2_panel(x, 0)[0]).astype(jnp.float32)), pan_nt)

# E3: bounded swap gather+scatter (256 rows of the slab)
cand = jnp.asarray(np.arange(256, dtype=np.int32))
src = jnp.asarray(rng.integers(0, M_, 256).astype(np.int32))
timed("bounded_swap", loop(
    lambda i, x: x.at[cand + i, :].set(jnp.take(x, src + i, axis=0), mode="drop")[0, 0]), slab)

# E4: (n,) perm compose gather
perm = jnp.asarray(rng.permutation(M_).astype(np.int32))
timed("perm_compose", loop(
    lambda i, x: jnp.take(x, perm, axis=0)[0].astype(jnp.float32)),
    jnp.asarray(np.arange(M_, dtype=np.int32)))

# E5: fused npv+inv kernel
timed("npv_inv_fused", loop(
    lambda i, x: jnp.sum(getf2_npv_inv_block(x + i)[1][0, :1])), diag)

# E6: old npv + two XLA triangular inverses
timed("npv_plus_xla_tri", loop(
    lambda i, x: jnp.sum(getf2_npv_block(x + i)[0][0, :1])
    + jnp.sum(unit_lower_inv(x + i)[0, :1])
    + jnp.sum(upper_inv(x + i)[0, :1])), diag)

# E6b: just the two XLA triangular inverses
timed("xla_tri_only", loop(
    lambda i, x: jnp.sum(unit_lower_inv(x + i)[0, :1])
    + jnp.sum(upper_inv(x + i)[0, :1])), diag)

# E6c: pallas unit-lower inverse
timed("pallas_tri_inv", loop(
    lambda i, x: jnp.sum(unit_lower_inv_pallas(x + i)[0, :1])), diag)

# E7: dynamic_update_slice of (M, R) into slab
piece = jnp.asarray(rng.random((M_, R)), jnp.float32)
timed("dyn_update_slice", loop(
    lambda i, x: jax.lax.dynamic_update_slice(x, piece, (0, (i % 16) * 128))[0, 0]), slab)

# E8: masked (M,R)@(R,BC) bf16 GEMM (the within-slab trailing update)
lm = jnp.asarray(rng.random((M_, R)), jnp.bfloat16)
um = jnp.asarray(rng.random((R, BC)), jnp.bfloat16)
timed("inner_gemm", loop(
    lambda i, x: jnp.dot(lm, um, preferred_element_type=jnp.float32)[0, 0]), slab)
