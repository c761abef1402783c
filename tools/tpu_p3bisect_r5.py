"""Bisect which pair-layout kernel family kills the compile helper at 64k.

The 64k pair driver SIGKILLs the tunnel's compile helper even after the
multi-part split (part 1 ships 1.45 MB — half the 2D driver's size, which
compiles), so the trigger is a shape-driven compiler blowup in ONE kernel
instance, not total module size (same class as the unfused-dot crash in
tools/tpu_crash_bisect_r5.py).  n=4096 compiles every family; this tool
AOT-compiles each family standalone at the 64k driver's exact shapes, one
subprocess per family so a SIGKILL doesn't stop the scan.

Usage: python tools/tpu_p3bisect_r5.py          # scan all families
       python tools/tpu_p3bisect_r5.py <name>   # one family, in-process
"""

import subprocess
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

N = 65536
NP, BC = N // 2, 1024


def _compile(fn, *shapes):
    import jax

    args = [jax.ShapeDtypeStruct(s, d) for s, d in shapes]
    jax.jit(fn).lower(*args).compile()


def leg_extract():
    from mpf_tpu.ops.pair3d import slab_extract

    _compile(lambda a3: slab_extract(a3, 0, 0, N, BC),
             ((NP, 2, N), "bfloat16"))


def leg_writeback():
    from mpf_tpu.ops.pair3d import slab_writeback

    _compile(lambda a3, sub: slab_writeback(a3, sub, 0, 0),
             ((NP, 2, N), "bfloat16"), ((N, BC), "bfloat16"))


def leg_bandwrite():
    from mpf_tpu.ops.pair3d import band_write_rows

    _compile(lambda a3, piv3: band_write_rows(a3, piv3, 0),
             ((NP, 2, N), "bfloat16"), ((BC, 1, N), "float32"))


def leg_u12():
    # DEFAULT precision like the bf16-working driver: HIGHEST with bf16
    # operands is a Mosaic "Bad lhs type" (fp32-emulation passes need f32
    # inputs) — an earlier version of this leg passed HIGHEST and
    # misattributed that harness artifact to the driver
    from mpf_tpu.ops.pair3d import u12_transform

    _compile(lambda a3, linv: u12_transform(a3, linv, 0, BC, N - BC, None),
             ((NP, 2, N), "bfloat16"), ((BC, BC), "bfloat16"))


def leg_sub3():
    from mpf_tpu.ops.pair3d import trailing_sub3

    m = N - BC
    _compile(lambda a3, l21, u12: trailing_sub3(a3, l21, u12, BC),
             ((NP, 2, N), "bfloat16"), ((m // 2, 2, BC), "bfloat16"),
             ((BC // 2, 2, m), "bfloat16"))


def leg_exchange3():
    from mpf_tpu.ops.exchange import rows_exchange3

    _compile(lambda a3, gl, ds: rows_exchange3(a3, 0, gl, ds),
             ((NP, 2, N), "bfloat16"), ((BC,), "int32"), ((BC,), "int32"))


LEGS = ["extract", "writeback", "bandwrite", "u12", "sub3", "exchange3"]


def main():
    if len(sys.argv) > 1:
        globals()[f"leg_{sys.argv[1]}"]()
        print(f"{sys.argv[1]}: COMPILES", flush=True)
        return
    for name in LEGS:
        r = subprocess.run(
            [sys.executable, __file__, name],
            capture_output=True, text=True, timeout=900,
        )
        if r.returncode == 0:
            print(f"{name:10s} OK", flush=True)
        else:
            tail = " ".join(r.stderr.split())[-200:]
            print(f"{name:10s} FAIL rc={r.returncode}: {tail}", flush=True)


if __name__ == "__main__":
    main()
