import numpy as np

from fuzzypatternmatching_tpu.utils import hashing


def _scalar_hash32(a: int) -> int:
    M = 0xFFFFFFFF
    a = ((a + 0x7ED55D16) + (a << 12)) & M
    a = ((a ^ 0xC761C23C) ^ (a >> 19)) & M
    a = ((a + 0x165667B1) + (a << 5)) & M
    a = ((a + 0xD3A2646C) ^ (a << 9)) & M
    a = ((a + 0xFD7046C5) + (a << 3)) & M
    a = ((a ^ 0xB55A4F09) ^ (a >> 16)) & M
    return a


def test_hash32_matches_scalar():
    xs = np.array([0, 1, 12345, 0xFFFFFFFF, 2**31], dtype=np.uint64)
    out = hashing.hash32(xs)
    for x, o in zip(xs, out):
        assert int(o) == _scalar_hash32(int(x))


def test_hash_nbits_is_permutation_17():
    n = 17
    xs = np.arange(1 << n, dtype=np.uint64)
    out = hashing.hash_nbits(xs, n)
    assert out.max() < (1 << n)
    assert len(np.unique(out)) == 1 << n  # bijective on the n-bit domain


def test_hash_nbits_is_permutation_21_sample():
    n = 21
    xs = np.arange(1 << n, dtype=np.uint64)
    out = hashing.hash_nbits(xs, n)
    assert out.max() < (1 << n)
    assert len(np.unique(out)) == 1 << n


def test_hash_nbits_33_stays_in_domain():
    n = 33
    xs = np.array([0, 1, (1 << 33) - 1, 1234567890], dtype=np.uint64)
    out = hashing.hash_nbits(xs, n)
    assert out.max() < (1 << n)
    # deterministic
    assert np.array_equal(out, hashing.hash_nbits(xs, n))
