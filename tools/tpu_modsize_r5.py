"""Attribute lowered-module size by Pallas kernel family (round 5).

The axon tunnel's compile helper is OOM-killed (SIGKILL) on the 64k
pair-layout driver's ~2.75 MB MLIR module (tools/chip_logs_r5_p3t64.log);
the round-4 lazy driver died the same way at ~2.1-2.3 MB.  Lowering is
LOCAL (the HTTP compile ships the result), so module size can be measured
and attributed without touching the chip: this tool lowers the requested
driver jit, counts tpu_custom_call sites per kernel name, and sizes each
family's serialized Mosaic payload.

Usage: python tools/tpu_modsize_r5.py [n] [layout]   layout in {3d, 2d}
"""

import re
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    layout = sys.argv[2] if len(sys.argv) > 2 else "3d"
    from mpf_tpu.models.mpf import make_mpf
    from mpf_tpu.precision import ALL_BF16

    fac = make_mpf.__wrapped__(n, r=128, policy=ALL_BF16, block=1024,
                               donate=True)
    shape = ((n // 2, 2, n) if layout == "3d" else (n, n))
    x = jax.ShapeDtypeStruct(shape, jnp.bfloat16)
    txt = fac.lower(x).as_text()
    print(f"n={n} layout={layout}: lowered stablehlo text = "
          f"{len(txt)/1e6:.2f} MB")
    # each Mosaic kernel site: custom_call with kernel_name in the
    # backend_config/metadata and a serialized module payload
    sizes = {}
    counts = {}
    for m in re.finditer(
            r'kernel_name\s*=\s*"([^"]+)"', txt):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    # payload attribution: stablehlo serializes the Mosaic module bytes
    # inline; approximate per-site size by the span between custom-call
    # sites (ordered scan)
    sites = [(m.start(), m.group(1))
             for m in re.finditer(r'kernel_name\s*=\s*"([^"]+)"', txt)]
    for m in re.finditer(r'tpu.custom_call|custom_call', txt):
        pass
    bounds = [s for s, _ in sites] + [len(txt)]
    for i, (s, name) in enumerate(sites):
        sizes[name] = sizes.get(name, 0) + (bounds[i + 1] - s)
    total_attr = sum(sizes.values())
    print(f"{'kernel family':42s} {'sites':>6s} {'~MB':>8s}")
    for name in sorted(sizes, key=sizes.get, reverse=True):
        print(f"{name:42s} {counts[name]:6d} {sizes[name]/1e6:8.2f}")
    print(f"{'(attributed)':42s} {sum(counts.values()):6d} "
          f"{total_attr/1e6:8.2f}")


if __name__ == "__main__":
    main()
