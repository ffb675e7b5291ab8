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


def test_sketch_step_composite_equals_classic():
    """Composite u32-plane input (the parser's fn_next_batch_c format)
    must produce bit-identical states to the classic (packed, rc) form,
    on both the kernel and XLA fallback paths available here."""
    import jax.numpy as jnp
    import numpy as np

    from finch_tpu.ops import bottomk

    rng = np.random.default_rng(8)
    cap, b = 512, 1 << 14
    for use_kernel in ([False, True] if bottomk.auto_use_kernel()
                       else [False]):
        s1 = bottomk.empty_state(cap)
        s2 = bottomk.empty_state(cap)
        for step in range(3):
            pk = rng.integers(0, 4 ** 21, size=b, dtype=np.uint64)
            pk[: b // 8] = pk[b // 8: b // 4]  # duplicates
            rc = rng.integers(0, 2, size=b, dtype=np.uint8)
            comp = (pk << np.uint64(1)) | rc
            lo = (comp & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            hi = (comp >> np.uint64(32)).astype(np.uint32)
            nv = jnp.uint32(b - 7 if step else b)
            s1, _ = bottomk.sketch_step(
                s1, jnp.asarray(pk), jnp.asarray(rc), nv, jnp.uint64(0),
                k=21, seed=0, has_max_hash=False, use_kernel=use_kernel)
            s2, _ = bottomk.sketch_step(
                s2, jnp.asarray(lo), jnp.asarray(hi), nv, jnp.uint64(0),
                k=21, seed=0, has_max_hash=False, use_kernel=use_kernel,
                composite=True)
        f1, _ = bottomk.flush_state(s1, jnp.uint64(0), k=21, seed=0)
        f2, _ = bottomk.flush_state(s2, jnp.uint64(0), k=21, seed=0)
        for a, b2 in zip(f1[:4], f2[:4]):
            assert np.array_equal(np.asarray(a), np.asarray(b2)), use_kernel
