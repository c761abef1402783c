"""Fine-grained ablation of the current inner panel step at n=8192.

Monkeypatches individual pieces to no-ops (numerically wrong; timing only)
to attribute per-panel cost.  Run on the real chip.
"""

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
from mpf_tpu.precision import MPF_BF16, cast_to_panel
from mpf_tpu.utils import matgen
from mpf_tpu.utils.timing import time_fn, tflops

cfg._USE_PALLAS = "1"
N = int(os.environ.get("ABLATE_N", "16384"))
R, BLK = 128, int(os.environ.get("ABLATE_BLK", "1024"))
a = jnp.asarray(matgen.hpl_ai_matrix(N, seed=0))

TOGGLES = set()


def step(slab, perm, piv_all, info, kk, jj0, rp, policy, pivot, panel_kernel):
    n, bc = slab.shape
    rows = M._iota(n)
    cols = M._iota(bc)
    j0 = kk + jj0

    if "panel" in TOGGLES:
        piv = j0 + M._iota(rp)
        pperm = rows
    else:
        panel = jax.lax.dynamic_slice(slab, (0, jj0), (n, rp))
        kern = M._auto_panel_kernel(n, rp)
        piv, pperm, perm = kern(cast_to_panel(panel, policy), row_offset=j0, prev_perm=perm)

    if "laswp" not in TOGGLES:
        cand = jnp.concatenate([j0 + M._iota(rp), piv])
        src = jnp.take(pperm, cand)
        from mpf_tpu.ops.panel_pallas import laswp_apply

        slab = laswp_apply(slab, cand, src)
    piv_all = jax.lax.dynamic_update_slice(piv_all, piv, (jj0,))

    diag = jax.lax.dynamic_slice(slab, (j0, jj0), (rp, rp))
    if "npv" in TOGGLES:
        diag_lu = diag
        linv = uinv = jnp.eye(rp, dtype=diag.dtype)
    else:
        diag_lu, linv, uinv, info_k = M._auto_npv_inv_kernel(rp)(diag)
    if "dus" not in TOGGLES:
        slab = jax.lax.dynamic_update_slice(slab, diag_lu, (j0, jj0))

    colp = jax.lax.dynamic_slice(slab, (0, jj0), (n, rp))
    below = rows >= j0 + rp
    if "l21gemm" in TOGGLES:
        l21 = colp
    else:
        l21 = jnp.dot(colp, uinv, preferred_element_type=policy.accum).astype(slab.dtype)
        l21 = jnp.where(below[:, None], l21, colp)
    if "dus" not in TOGGLES:
        slab = jax.lax.dynamic_update_slice(slab, l21, (0, jj0))

    rowp = jax.lax.dynamic_slice(slab, (j0, 0), (rp, bc))
    right = cols >= jj0 + rp
    if "u12gemm" in TOGGLES:
        u12 = rowp
    else:
        u12 = jnp.dot(linv, rowp, preferred_element_type=policy.accum).astype(slab.dtype)
        u12 = jnp.where(right[None, :], u12, rowp)
    if "dus" not in TOGGLES:
        slab = jax.lax.dynamic_update_slice(slab, u12, (j0, 0))

    if "trail" not in TOGGLES:
        lm = jnp.where(below[:, None], l21, 0).astype(policy.gemm_in)
        um = jnp.where(right[None, :], u12, 0).astype(policy.gemm_in)
        upd = jnp.dot(lm, um, preferred_element_type=policy.accum)
        slab = (slab.astype(policy.accum) - upd).astype(slab.dtype)
    return slab, perm, piv_all, info


M._inner_panel_step = step


def run(label):
    fn = lambda a: M.mpf_factorize_traced(a, r=R, policy=MPF_BF16, block=BLK)
    secs, _ = time_fn(fn, a, warmup=1, iters=3)
    print(f"{label}: {secs*1000:.1f} ms = {tflops(N, secs):.2f} TF/s", flush=True)


for label, toggles in [
    ("baseline", set()),
    ("no_l21gemm", {"l21gemm"}),
    ("no_l21gemm", {"l21gemm"}),
    ("no_u12gemm", {"u12gemm"}),
    ("no_trail", {"trail"}),
    ("only_panel", {"laswp", "npv", "dus", "l21gemm", "u12gemm", "trail"}),
    ("nothing", {"panel", "laswp", "npv", "dus", "l21gemm", "u12gemm", "trail"}),
]:
    TOGGLES.clear()
    TOGGLES.update(toggles)
    run(label)
