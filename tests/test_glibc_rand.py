"""Bit-parity of the glibc rand() clone against the host libc (the
reference corpus's reproducibility hinges on glibc rand,
`matrix_generator.cpp:63-66`)."""

import ctypes
import ctypes.util

import pytest

from mpf_tpu.utils.glibc_rand import GlibcRand, RAND_MAX


def _libc():
    path = ctypes.util.find_library("c")
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


@pytest.mark.parametrize(
    "seed",
    # includes seeds >= 2^31: glibc stores the seed in int32 and runs the
    # Schrage step in signed arithmetic — parity must hold there too
    [1, 2, 42, 123456789, 2**31 - 1, 2**31, 2**31 + 12345, 0xFFFFFFFF],
)
def test_matches_libc(seed):
    libc = _libc()
    if libc is None:
        pytest.skip("libc not loadable")
    libc.srand(ctypes.c_uint(seed))
    ours = GlibcRand(seed)
    got = [ours.rand() for _ in range(2000)]
    want = [libc.rand() for _ in range(2000)]
    assert got == want


def test_unseeded_equals_seed_1():
    assert [GlibcRand(1).rand() for _ in range(10)] == [GlibcRand(1).rand() for _ in range(10)]


def test_range():
    g = GlibcRand(7)
    for _ in range(1000):
        v = g.rand()
        assert 0 <= v <= RAND_MAX


def test_ref_value_distribution():
    g = GlibcRand(1)
    vals = [g.ref_value() for _ in range(1000)]
    assert all(0.0 <= v <= 9.9 for v in vals)
    # values are exact multiples of 0.1 (rand() % 100 / 10.0)
    assert all(abs(v * 10 - round(v * 10)) < 1e-12 for v in vals)
