"""Matrix corpus generator CLI — behavioral equivalent of the reference's
`matrix_generator.cpp:6-90`:

    python -m mpf_tpu.cli.matrix_generator file maxSize [step=2] [exp|lin] [sparsity]

Same argv semantics, same output format, same value stream (glibc ``rand()``
clone, unseeded => seed 1), so corpora are bit-identical to the C++ tool
(both the reference's and ours in ``native/matrix_generator.cpp``).
"""

from __future__ import annotations

import sys

from mpf_tpu.utils.glibc_rand import GlibcRand
from mpf_tpu.utils.matgen import corpus_sizes


def main(argv=None) -> int:
    argv = sys.argv if argv is None else argv
    if len(argv) < 3:
        print(
            f"Usage: {argv[0]} filename maxSize [step=2] [function=exp (exp/lin)] [sparsity=0.0]"
        )
        print("  sparsity: fraction of zeros in the matrix (0.0 = dense, 0.9 = 90% zeros)")
        return -1

    path = argv[1]
    max_size = int(argv[2])
    if max_size <= 0:
        print(f"Invalid maxSize: {max_size}")
        return -1
    step = 2
    if len(argv) > 3:
        step = int(argv[3])
        if step <= 0:
            print(f"Invalid step: {step}")
            return -1
    mode = "exp"
    if len(argv) > 4:
        mode = argv[4]
        if mode not in ("exp", "lin"):
            print(f"Invalid function: {mode}. Use 'exp' or 'lin'.")
            return -1
    if mode == "exp" and step < 2:
        # size *= 1 never grows — the reference would hang here
        print(f"Invalid step for exp: {step}. Must be >= 2.")
        return -1
    sparsity = 0.0
    if len(argv) > 5:
        sparsity = float(argv[5])
        if not (0.0 <= sparsity < 1.0):
            print(f"Invalid sparsity: {sparsity}. Must be in [0.0, 1.0).")
            return -1

    rng = GlibcRand(1)  # unseeded C program semantics
    sizes = corpus_sizes(max_size, step, mode)
    # stream matrices to disk (the reference writes as it generates,
    # `matrix_generator.cpp:57-82`, then back-patches the count)
    with open(path, "w") as f:
        f.write(f"{len(sizes):<16}\n")
        for n in sizes:
            f.write(f"{n}\n")
            for _ in range(n):
                row = []
                for _ in range(n):
                    if sparsity > 0.0 and rng.uniform() < sparsity:
                        row.append("0")
                    else:
                        row.append(f"{rng.ref_value():g}")
                f.write(" ".join(row) + " \n")
            f.write("\n")
            print(f"Generating matrix of size {n}", end="\r", flush=True)
    print(f"\nnumber of matrices: {len(sizes)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
