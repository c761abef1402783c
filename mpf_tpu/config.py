"""Runtime configuration knobs (env-var driven).

``MPF_USE_PALLAS``: "auto" (default — Pallas kernels on TPU, jnp reference
kernels elsewhere), "1" (force Pallas, interpret-mode on CPU), "0" (force
the jnp reference kernels everywhere).
"""

from __future__ import annotations

import os

import jax

import contextlib

_USE_PALLAS = os.environ.get("MPF_USE_PALLAS", "auto")
_FORCE_JNP_DEPTH = 0


def apply_env_platform():
    """Honor MPF_FORCE_CPU=1 (the session's TPU plugin ignores the
    JAX_PLATFORMS env var, so subprocesses — e.g. CLI tools under test —
    need an explicit config override before backend init)."""
    if os.environ.get("MPF_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")


apply_env_platform()


def use_pallas() -> bool:
    if _FORCE_JNP_DEPTH > 0:
        return False
    if _USE_PALLAS == "1":
        return True
    if _USE_PALLAS == "0":
        return False
    return jax.default_backend() == "tpu"


def combined_exchange() -> bool:
    """``MPF_XCHG`` selects the physical-exchange implementation on the
    fused path: ``combined`` (default — the one-sweep kernel in
    `ops/exchange.py`: each out-of-band granule window read once) or
    ``split`` (the round-2 pair rows_gather + rows_scatter_from_band)."""
    return os.environ.get("MPF_XCHG", "combined") != "split"


def lookahead() -> bool:
    """``MPF_LOOKAHEAD``: one-deep pipelined block columns (round 4).  The
    trailing GEMM of block column k is split narrow/wide; panel k+1 is
    factored after the narrow part, and its physical row exchange rides
    INSIDE the wide trailing GEMM (`ops/gemmx.py` — exchange window DMAs
    threaded between the MXU tiles, entries gated on GEMM row-strip
    completion).  Replaces the reference's strictly serial panel ->
    LASWP -> TRSM -> GEMM order (`MPF.cu:100-240`).  Default ``auto`` =
    off until the round-4 chip A/B lands; ``1`` enables, ``0`` disables."""
    env = os.environ.get("MPF_LOOKAHEAD", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return False


def u12_precision(default):
    """``MPF_U12_PREC``: MXU pass count for the fp32-working OUTER U12 TRSM
    (the `_trailing_update` ``linv @ A12`` dot).  The round-5 32k cost model
    (STATUS) puts the 262 ms outer stage at ~110 ms bf16-GEMM MXU floor +
    ~60 ms fp32 A22 RMW + ~65 ms of THIS dot at fp32-HIGHEST (6-pass MXU
    emulation).  ``high`` (3-pass: drops the lo*lo cross term, relative
    error ~2^-18 per product vs fp32's 2^-24) halves the U12 flop tax; the
    panel factors and trailing accumulation are untouched.

    DEFAULT (round 5): ``high`` wherever the caller would use HIGHEST —
    chip A/B (tools/chip_logs_r5_u12.log): n=32768 MPF_BF16 hpl 433.4 vs
    454.3 ms, uniform 506.7 vs 529.8 (-4.6%/-4.4%), oracle-NEUTRAL at
    n=8192 on both corpora (uniform nbe 3.137e-05 vs 3.140e-05, hpl
    3.011e-11 vs 2.977e-11 — the U12 2^-18 term is far below the bf16
    panel's 2^-8 method error).  ``MPF_U12_PREC=highest`` restores the
    6-pass dot.  Read at TRACE time — A/B harnesses must build fresh
    closures (make_mpf.__wrapped__), never flip the env under the lru
    cache."""
    import jax as _jax

    env = os.environ.get("MPF_U12_PREC", "")
    if not env:
        return (_jax.lax.Precision.HIGH
                if default == _jax.lax.Precision.HIGHEST else default)
    return {
        "high": _jax.lax.Precision.HIGH,
        "highest": _jax.lax.Precision.HIGHEST,
        "default": _jax.lax.Precision.DEFAULT,
    }[env]


def force_kernels() -> bool:
    """``MPF_FORCE_KERNELS=1``: drive the Pallas kernel paths through the
    DRIVER on a non-TPU backend (kernels run in interpret mode).  CI hook
    closing the round-3 gap where driver-level tests always took the jnp
    fallback and the composed kernel paths were only covered by kernel unit
    tests plus one-off chip runs."""
    return os.environ.get("MPF_FORCE_KERNELS") == "1"


def kernels_on() -> tuple[bool, bool]:
    """(use kernel paths in the driver, interpret mode) — the driver-side
    backend gate: real kernels on TPU, interpret-mode kernels under
    MPF_FORCE_KERNELS, jnp fallbacks otherwise."""
    if use_pallas() and jax.default_backend() == "tpu":
        return True, False
    if use_pallas() and force_kernels():
        return True, True
    return False, False


def ablate(stage: str) -> bool:
    """Trace-time perf-attribution knob: ``MPF_ABLATE`` is a comma list of
    driver stages to skip (results become WRONG — measurement only).
    Stages: ``exchange`` (per-block-column physical row exchange),
    ``outer`` (outer U12 + trailing GEMM, mid AND far), ``far`` (only the
    once-per-superblock deferred far update), ``slabio`` (block-column slab
    extract/writeback), ``a1`` (strip pivot kernel), ``a2`` (rowblock
    assembly), ``bstream`` (streaming panel update)."""
    return stage in os.environ.get("MPF_ABLATE", "").split(",")


@contextlib.contextmanager
def force_jnp_kernels():
    """Trace-time override: use the jnp reference kernels regardless of
    backend (e.g. under vmap, where the Pallas kernels' aliasing/DMA
    patterns are not batchable)."""
    global _FORCE_JNP_DEPTH
    _FORCE_JNP_DEPTH += 1
    try:
        yield
    finally:
        _FORCE_JNP_DEPTH -= 1
