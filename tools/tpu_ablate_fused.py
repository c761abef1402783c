"""Ablation of the fused panel pipeline inside the REAL driver: stub each
stage out and measure the end-to-end delta at n=8192 (the reliable way to
attribute cost through the tunnel; traces don't survive it)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp

import mpf_tpu.ops.panel_strip as PS
import mpf_tpu.ops.panel_fused as PF
from mpf_tpu.models.mpf import make_mpf
from mpf_tpu.precision import MPF_BF16
from mpf_tpu.utils import matgen
from mpf_tpu.utils.timing import time_fn, tflops

N = int(os.environ.get("AB_N", "8192"))
R = int(os.environ.get("AB_R", "128"))
BLOCK = int(os.environ.get("AB_BLOCK", "1024"))

real_a1 = PS.strip_panel_pivots
real_a2 = PF.rowblock_assemble
real_b = PF.panel_apply_update
real_bt = PF.panel_apply_update_trim


def stub_a1(panel, off, pos, panel_dtype=None, interpret=False, jj0=0, r=None):
    m, w = panel.shape
    r = w if r is None else r
    piv = jnp.asarray(off, jnp.int32) + jnp.arange(r, dtype=jnp.int32)
    # keep a data dependence on the panel so nothing upstream is DCE'd
    eps = (jnp.sum(panel[:1, :1].astype(jnp.float32)) * 0).astype(jnp.int32)
    return piv + eps, pos, piv


def stub_a2(slab, glist, jj0, interpret=False):
    r = glist.shape[0]
    bc = slab.shape[1]
    eps = (jnp.sum(slab[:1, :1].astype(jnp.float32)) * 0 + jnp.sum(glist) * 0)
    rb = jnp.zeros((r, bc), slab.dtype) + eps.astype(slab.dtype)
    uinv = jnp.eye(r, dtype=slab.dtype)
    return rb, uinv, jnp.int32(0)


def stub_b(slab, pos, rowblock, uinv, j0, jj0, rb=512, gemm_bf16=False,
           interpret=False):
    eps = (jnp.sum(rowblock[:1, :1].astype(jnp.float32)) * 0
           + jnp.sum(uinv[:1, :1].astype(jnp.float32)) * 0
           + (jnp.sum(pos[:1]) * 0).astype(jnp.float32))
    return slab + eps.astype(slab.dtype)


def run(tag):
    a = matgen.hpl_ai_matrix_device(N, seed=0)
    fac = make_mpf(N, r=R, policy=MPF_BF16, block=BLOCK, donate=False)
    secs, _ = time_fn(fac, a, warmup=1, iters=3)
    print(f"{tag:24s}: {secs*1e3:7.1f} ms  ({tflops(N, secs):6.2f} TF/s)")
    return secs


base = run("full fused")
PS.strip_panel_pivots = stub_a1
no_a1 = run("A1 stubbed")
PS.strip_panel_pivots = real_a1
PF.rowblock_assemble = stub_a2
no_a2 = run("A2 stubbed")
PF.rowblock_assemble = real_a2
PF.panel_apply_update = stub_b
PF.panel_apply_update_trim = stub_b
no_b = run("B stubbed")
PF.panel_apply_update = real_b
PF.panel_apply_update_trim = real_bt
PS.strip_panel_pivots = stub_a1
PF.rowblock_assemble = stub_a2
PF.panel_apply_update = stub_b
PF.panel_apply_update_trim = stub_b
skel = run("all three stubbed")

npanels = 0
k = 0
while k < N:
    bc = min(BLOCK, N - k)
    npanels += bc // R
    k += BLOCK
print(f"panels={npanels}")
print(f"A1 ~{(base-no_a1)*1e3/npanels:.3f} ms/panel, A2 ~{(base-no_a2)*1e3/npanels:.3f}, "
      f"B ~{(base-no_b)*1e3/npanels:.3f}, skeleton {skel*1e3:.1f} ms")
