"""L3/L4 command-line tools mirroring the reference harness:

``benchmark``        — `benchmark.cpp` equivalent (corpus-driven timing +
                       correctness oracle, CSV output)
``matrix_generator`` — `matrix_generator.cpp` equivalent (bit-identical
                       corpora via the glibc rand() clone)
``probe``            — `check_cooperative_groups.cu` equivalent (device /
                       mesh capability report)
"""
