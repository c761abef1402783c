"""Corpus file format round-trip + generator semantics
(`matrix_generator.cpp`, `benchmark.cpp:171-199`)."""

import numpy as np

from mpf_tpu.utils import matio, matgen


def test_roundtrip(tmp_path):
    mats = matgen.generate_corpus(8, step=2, mode="exp")
    assert [m.shape[0] for m in mats] == [2, 4, 8]
    path = str(tmp_path / "corpus.txt")
    matio.write_matrix_file(path, mats)
    back = matio.read_matrix_file(path)
    assert len(back) == len(mats)
    for a, b in zip(mats, back):
        np.testing.assert_allclose(a, b, atol=1e-12)


def test_header_field_width(tmp_path):
    path = str(tmp_path / "c.txt")
    matio.write_matrix_file(path, [np.ones((2, 2))])
    first = open(path).readline()
    # count left-justified in a 16-char field (seekp(0) overwrite semantics)
    assert first == "1" + " " * 15 + "\n"


def test_corpus_sizes():
    assert matgen.corpus_sizes(16, 2, "exp") == [2, 4, 8, 16]
    assert matgen.corpus_sizes(8, 3, "lin") == [2, 5, 8]


def test_sparsity_consumption_order():
    # sparsity draws consume one rand; kept values consume a second —
    # replicate by hand against the same PRNG stream
    from mpf_tpu.utils.glibc_rand import GlibcRand

    m = matgen.generate_corpus(2, sparsity=0.5)[0]
    g = GlibcRand(1)
    expect = np.empty((2, 2))
    for i in range(2):
        for j in range(2):
            if g.uniform() < 0.5:
                expect[i, j] = 0.0
            else:
                expect[i, j] = g.ref_value()
    np.testing.assert_array_equal(m, expect)


def test_dense_no_bernoulli_draw():
    from mpf_tpu.utils.glibc_rand import GlibcRand

    m = matgen.generate_corpus(2, sparsity=0.0)[0]
    g = GlibcRand(1)
    expect = np.array([[g.ref_value() for _ in range(2)] for _ in range(2)])
    np.testing.assert_array_equal(m, expect)
