"""MurmurHash3_x64_128 bit-identity: C++ oracle == Python oracle == JAX kernel.

The reference's hash is the low u64 of murmur3 x64_128
(/root/reference/lib/src/sketch_schemes/hashing.rs:9-12).
"""

import numpy as np
import pytest

from finch_tpu.models import oracle
from finch_tpu.native import murmur3_packed, murmur3_x64_128, unpack_kmers
from finch_tpu.ops.murmur3 import hash_packed_kmers


@pytest.mark.parametrize("seed", [0, 42, 2**63 + 12345])
@pytest.mark.parametrize(
    "key",
    [b"", b"a", b"acgt", b"AAAAAAAA", b"ACGTACGTACGTACGT",
     b"ACGTACGTACGTACGTACGTA", b"x" * 31, b"y" * 32, b"z" * 47],
)
def test_cpp_matches_python(key, seed):
    assert murmur3_x64_128(key, seed) == oracle.murmur3_x64_128(key, seed)


def test_known_streaming_vector():
    # from the commented test in mash.rs:136-154 ("ACACGGAAATCCTCACGTCGCGGCGCCGGGC", k=21, seed=42)
    seq = b"ACACGGAAATCCTCACGTCGCGGCGCCGGGC"
    expected = {
        3186265289206375993, 3197567229193635484, 5157287830980272133,
        7515070071080094037, 9123665698461883699, 9650810550987401968,
        10462414310441547028, 12872951831549606632, 13584836512372089324,
        14093285637546356047, 16069721578136260683,
    }
    got = set()
    for kmer, _ in oracle.canonical_kmers(oracle.normalize(seq), 21):
        got.add(oracle.hash_f(kmer, 42))
    assert got == expected


@pytest.mark.parametrize("k", [1, 4, 7, 8, 15, 16, 21, 24, 25, 31])
@pytest.mark.parametrize("seed", [0, 42])
def test_jax_kernel_matches_cpp(k, seed):
    rng = np.random.default_rng(k * 1000 + seed)
    packed = rng.integers(0, 4**min(k, 31), size=257, dtype=np.uint64)
    expected = murmur3_packed(packed, k, seed)
    got = np.asarray(hash_packed_kmers(packed, k=k, seed=seed))
    np.testing.assert_array_equal(got, expected)


def test_packed_matches_bytes():
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 4**21, size=100, dtype=np.uint64)
    kmers = unpack_kmers(packed, 21)
    expected = np.array(
        [oracle.hash_f(bytes(row), 0) for row in kmers], dtype=np.uint64)
    np.testing.assert_array_equal(murmur3_packed(packed, 21, 0), expected)
