"""Vectorized MurmurHash3_x64_128 over 2-bit packed k-mer lanes.

This is the bit-identity root of the whole framework: finch hashes the ASCII
bytes of each canonical k-mer with MurmurHash3_x64_128 and keeps the low u64
(/root/reference/lib/src/sketch_schemes/hashing.rs:9-12). Here the k ASCII
bytes are reconstructed on-device from the packed 2-bit code (A=0 C=1 G=2
T=3, base 0 in the most-significant bits) and the hash is evaluated in u64
lanes. XLA lowers u64 arithmetic to 32-bit pairs on TPU; a hand-written
(hi,lo) Pallas kernel lives beside this as the speed-of-light path.

The byte->word assembly is specialized per static k (k <= 31 on this path:
at most 2 16-byte blocks + tail).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

C1 = np.uint64(0x87C37B91114253D5)
C2 = np.uint64(0x4CF5AD432745937F)
F1 = np.uint64(0xFF51AFD7ED558CCD)
F2 = np.uint64(0xC4CEB9FE1A85EC53)
M5 = np.uint64(5)
A1 = np.uint64(0x52DCE729)
A2 = np.uint64(0x38495AB5)

# ASCII bases indexed by 2-bit code.
_BASE_U64 = tuple(np.uint64(b) for b in (65, 67, 71, 84))


def _rotl(x, r: int):
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix64(x):
    x = x ^ (x >> np.uint64(33))
    x = x * F1
    x = x ^ (x >> np.uint64(33))
    x = x * F2
    x = x ^ (x >> np.uint64(33))
    return x


def _byte_of_code(code):
    """Map 2-bit code lanes -> ASCII byte lanes (0→A 1→C 2→G 3→T)."""
    return jnp.where(
        code == 0, _BASE_U64[0],
        jnp.where(code == 1, _BASE_U64[1],
                  jnp.where(code == 2, _BASE_U64[2], _BASE_U64[3])),
    ).astype(jnp.uint64)


def packed_to_le_words(packed, k: int):
    """Little-endian u64 words of the ASCII k-mer string.

    packed: u64[...] codes with base 0 in bits [2k-2, 2k-1].
    Returns ceil(k/8) u64 arrays; bytes beyond k are zero.
    """
    packed = packed.astype(jnp.uint64)
    nwords = (k + 7) // 8
    words = []
    for w in range(nwords):
        acc = jnp.zeros_like(packed)
        for j in range(w * 8, min(k, w * 8 + 8)):
            code = (packed >> np.uint64(2 * (k - 1 - j))) & np.uint64(3)
            acc = acc | (_byte_of_code(code) << np.uint64(8 * (j - w * 8)))
        words.append(acc)
    return words


def murmur3_x64_words(words, length: int, seed: int):
    """MurmurHash3_x64_128 h1 over byte strings given as LE u64 word lanes.

    `length` is the static byte length; trailing bytes of the last word must
    be zero. Returns the low u64 (h1) per lane, matching hash_f.
    """
    h1 = jnp.full_like(words[0], np.uint64(seed))
    h2 = jnp.full_like(words[0], np.uint64(seed))
    nblocks = length // 16
    for i in range(nblocks):
        k1 = words[2 * i]
        k2 = words[2 * i + 1]
        k1 = k1 * C1
        k1 = _rotl(k1, 31)
        k1 = k1 * C2
        h1 = h1 ^ k1
        h1 = _rotl(h1, 27)
        h1 = h1 + h2
        h1 = h1 * M5 + A1
        k2 = k2 * C2
        k2 = _rotl(k2, 33)
        k2 = k2 * C1
        h2 = h2 ^ k2
        h2 = _rotl(h2, 31)
        h2 = h2 + h1
        h2 = h2 * M5 + A2
    t = length & 15
    if t > 8:
        k2 = words[2 * nblocks + 1]
        k2 = k2 * C2
        k2 = _rotl(k2, 33)
        k2 = k2 * C1
        h2 = h2 ^ k2
    if t > 0:
        k1 = words[2 * nblocks]
        k1 = k1 * C1
        k1 = _rotl(k1, 31)
        k1 = k1 * C2
        h1 = h1 ^ k1
    ln = np.uint64(length)
    h1 = h1 ^ ln
    h2 = h2 ^ ln
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    # h2 = h2 + h1  # h2 unused; finch keeps only h1
    return h1


@partial(jax.jit, static_argnames=("k", "seed"))
def hash_packed_kmers(packed, *, k: int, seed: int = 0):
    """u64 hash lanes for packed canonical k-mer codes (k <= 31)."""
    if not 1 <= k <= 31:
        raise ValueError("packed murmur path supports k in 1..=31")
    words = packed_to_le_words(packed, k)
    return murmur3_x64_words(words, k, seed)
