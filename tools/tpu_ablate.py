"""Ablate per-panel driver costs on the real chip: which inner-loop pieces
eat the time?  Monkeypatches pieces out (numerically wrong, timing only)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

import mpf_tpu.config as cfg
from mpf_tpu.models import mpf as M
from mpf_tpu.ops import blas3
from mpf_tpu.precision import MPF_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.timing import time_fn, tflops

cfg._USE_PALLAS = "1"
N = int(os.environ.get("ABLATE_N", "4096"))
a = jnp.asarray(matgen.hpl_ai_matrix(N, seed=0))


def run(label):
    fn = lambda a: M.mpf_factorize_traced(a, r=128, policy=MPF_BF16, block=2048)
    secs, _ = time_fn(fn, a, warmup=1, iters=3)
    print(f"{label}: {secs*1000:.1f} ms = {tflops(N, secs):.2f} TF/s", flush=True)


orig_upper_inv = M.upper_inv
orig_lower_inv = M.unit_lower_inv
orig_npv = M._auto_npv_kernel
orig_panel = M._auto_panel_kernel

run("baseline")

# no triangular inverses (identity instead)
M.upper_inv = lambda x: jnp.eye(x.shape[0], dtype=x.dtype)
M.unit_lower_inv = lambda x: jnp.eye(x.shape[0], dtype=x.dtype)
run("no_tri_inv")
M.upper_inv = orig_upper_inv
M.unit_lower_inv = orig_lower_inv

# no npv kernel
M._auto_npv_kernel = lambda rp: (lambda d: (d, jnp.int32(0)))
run("no_npv")
M._auto_npv_kernel = orig_npv

# no pivoting at all (also removes swaps + perm + panel kernel)
fn = lambda a: M.mpf_factorize_traced(a, r=128, policy=MPF_BF16, block=2048, pivot=False)
secs, _ = time_fn(fn, a, warmup=1, iters=3)
print(f"no_pivot: {secs*1000:.1f} ms = {tflops(N, secs):.2f} TF/s", flush=True)

# pivoting but swaps/perm-compose disabled (patch take-based swap to no-op)
orig_take = jnp.take


def fake_kernel(m, rp):
    k = orig_panel(m, rp)

    def kern(panel, row_offset=0):
        piv, pperm = k(panel, row_offset=row_offset)
        return piv, pperm

    return kern


# isolate the bounded swap + perm compose by removing them from the step:
src_step = M._inner_panel_step


def step_no_swap(slab, perm, piv_all, info, kk, jj0, rp, policy, pivot, panel_kernel):
    n, bc = slab.shape
    j0 = kk + jj0
    panel = jax.lax.dynamic_slice(slab, (0, jj0), (n, rp))
    if pivot:
        kern = panel_kernel if panel_kernel is not None else M._auto_panel_kernel(n, rp)
        piv, pperm = kern(M.cast_to_panel(panel, policy), row_offset=j0)
    else:
        piv = j0 + M._iota(rp)
    # (swaps, perm compose, piv record intentionally skipped)
    diag = jax.lax.dynamic_slice(slab, (j0, jj0), (rp, rp))
    diag_lu, info_k = M._auto_npv_kernel(rp)(diag)
    slab = jax.lax.dynamic_update_slice(slab, diag_lu, (j0, jj0))
    rows = M._iota(n)
    cols = M._iota(bc)
    colp = jax.lax.dynamic_slice(slab, (0, jj0), (n, rp))
    l21 = jnp.dot(colp, M.upper_inv(diag_lu), preferred_element_type=policy.accum).astype(slab.dtype)
    below = rows >= j0 + rp
    l21 = jnp.where(below[:, None], l21, colp)
    slab = jax.lax.dynamic_update_slice(slab, l21, (0, jj0))
    rowp = jax.lax.dynamic_slice(slab, (j0, 0), (rp, bc))
    u12 = jnp.dot(M.unit_lower_inv(diag_lu), rowp, preferred_element_type=policy.accum).astype(slab.dtype)
    right = cols >= jj0 + rp
    u12 = jnp.where(right[None, :], u12, rowp)
    slab = jax.lax.dynamic_update_slice(slab, u12, (j0, 0))
    lm = jnp.where(below[:, None], l21, 0).astype(policy.gemm_in)
    um = jnp.where(right[None, :], u12, 0).astype(policy.gemm_in)
    upd = jnp.dot(lm, um, preferred_element_type=policy.accum)
    slab = (slab.astype(policy.accum) - upd).astype(slab.dtype)
    return slab, perm, piv_all, info


M._inner_panel_step = step_no_swap
run("no_swap_no_perm")
M._inner_panel_step = src_step
