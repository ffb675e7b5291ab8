"""Fused Pallas extraction kernel (ops/pallas_extract.py) — exactness vs
the scalar C++ murmur oracle, in interpreter mode on CPU."""

import numpy as np
import pytest

from finch_tpu.native import murmur3_packed
from finch_tpu.ops import pallas_extract as pe

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


@pytest.mark.parametrize("kk,seed", [(21, 0), (15, 42)])
def test_extract_candidates_matches_oracle(kk, seed):
    import jax.numpy as jnp

    b = pe.COLH * pe.CHUNK_W  # one chunk
    rng = np.random.default_rng(11)
    packed = rng.integers(0, 4 ** kk, size=b, dtype=np.uint64)
    rc = rng.integers(0, 2, size=b, dtype=np.uint64)
    v = (packed << np.uint64(1)) | rc
    v[-37:] = U64_MAX  # nvalid padding
    thresh = np.uint64(int(0.01 * 2 ** 64))

    cand, ovf = pe.extract_candidates(
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
        jnp.uint32(int(thresh >> np.uint64(32))),
        jnp.uint32(int(thresh & np.uint64(0xFFFFFFFF))),
        k=kk, seed=seed, interpret=True)
    cand = np.asarray(cand)

    hashes = murmur3_packed(packed[:-37], kk, seed)
    exp = np.sort(v[:-37][hashes <= thresh] + np.uint64(1))
    got = np.sort(cand[cand != U64_MAX])
    assert int(ovf) == 0
    assert np.array_equal(exp, got)


def test_extract_candidates_overflow_flag():
    """A column with more than ROWS_OUT survivors must raise the flag."""
    import jax.numpy as jnp

    b = pe.COLH * pe.CHUNK_W
    v = np.arange(b, dtype=np.uint64)  # all valid, tiny composites
    cand, ovf = pe.extract_candidates(
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
        jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFF),  # admit everything
        k=21, seed=0, interpret=True)
    assert int(ovf) == 1  # 32 survivors per column > ROWS_OUT
