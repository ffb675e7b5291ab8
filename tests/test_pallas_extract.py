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

    cand, slab, _khl, _khh, covf, aovf = pe.extract_candidates(
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
        jnp.uint32(int(thresh >> np.uint64(32))),
        jnp.uint32(int(thresh & np.uint64(0xFFFFFFFF))),
        k=kk, seed=seed, interpret=True, weighted=False)
    cand = np.asarray(cand)
    slab = np.asarray(slab)

    hashes = murmur3_packed(packed[:-37], kk, seed)
    exp = np.sort(v[:-37][hashes <= thresh] + np.uint64(1))
    got = np.sort(cand[cand != U64_MAX])
    assert int(covf) == 0 and int(aovf) == 0
    assert np.array_equal(exp, got)
    # the per-chunk slab (tier B) must hold the same survivor multiset
    assert np.array_equal(exp, np.sort(slab[slab != U64_MAX]))
    # the hash planes (tier C input) must be the murmur of every lane
    kh = ((np.asarray(_khh).astype(np.uint64) << np.uint64(32))
          | np.asarray(_khl).astype(np.uint64))
    assert np.array_equal(kh[:-37], hashes)


def test_extract_candidates_multichunk_accumulator():
    """Survivors from every chunk must come out of the cross-chunk
    accumulator exactly (multiset equality, duplicates included)."""
    import jax.numpy as jnp

    b = 4 * pe.COLH * pe.CHUNK_W
    rng = np.random.default_rng(5)
    packed = rng.integers(0, 4 ** 21, size=b, dtype=np.uint64)
    packed[b // 2:b // 2 + 64] = packed[:64]  # cross-chunk duplicates
    rc = rng.integers(0, 2, size=b, dtype=np.uint64)
    v = (packed << np.uint64(1)) | rc
    thresh = np.uint64(int(0.004 * 2 ** 64))

    cand, slab, _khl, _khh, covf, aovf = pe.extract_candidates(
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
        jnp.uint32(int(thresh >> np.uint64(32))),
        jnp.uint32(int(thresh & np.uint64(0xFFFFFFFF))),
        k=21, seed=0, interpret=True, weighted=False)
    cand = np.asarray(cand)
    slab = np.asarray(slab)
    assert cand.shape == (pe.ACC_H * pe.CHUNK_W,)
    assert slab.shape == (4 * pe.ROWS_OUT * pe.CHUNK_W,)

    hashes = murmur3_packed(packed, 21, 0)
    exp = np.sort(v[hashes <= thresh] + np.uint64(1))
    got = np.sort(cand[cand != U64_MAX])
    assert int(covf) == 0 and int(aovf) == 0
    assert np.array_equal(exp, got)
    assert np.array_equal(exp, np.sort(slab[slab != U64_MAX]))


def test_extract_candidates_accumulator_overflow():
    """> ACC_H survivors in one lane column across chunks (each chunk within
    the per-chunk ROWS_OUT bound) must raise the overflow flag."""
    import jax.numpy as jnp

    nchunks = (pe.ACC_H // pe.ROWS_OUT) + 1
    b = nchunks * pe.COLH * pe.CHUNK_W
    v = np.full(b, U64_MAX, dtype=np.uint64)  # all padding...
    for c in range(nchunks):  # ...except ROWS_OUT lanes of column 0 per chunk
        base = c * pe.COLH * pe.CHUNK_W
        for r in range(pe.ROWS_OUT):
            v[base + r * pe.CHUNK_W] = np.uint64(c * pe.ROWS_OUT + r) << 1

    cand, slab, _khl, _khh, covf, aovf = pe.extract_candidates(
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
        jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFF),  # admit everything
        k=21, seed=0, interpret=True)
    assert int(aovf) == 1
    # no single chunk column exceeded ROWS_OUT, so tier B stays exact:
    slab = np.asarray(slab)
    exp = np.sort(v[v != U64_MAX] + np.uint64(1))
    assert int(covf) == 0
    assert np.array_equal(exp, np.sort(slab[slab != U64_MAX]))


def test_extract_candidates_overflow_flag():
    """A column with more than ROWS_OUT survivors must raise the flag."""
    import jax.numpy as jnp

    b = pe.COLH * pe.CHUNK_W
    v = np.arange(b, dtype=np.uint64)  # all valid, tiny composites
    cand, slab, _khl, _khh, covf, aovf = pe.extract_candidates(
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
        jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFF),  # admit everything
        k=21, seed=0, interpret=True)
    assert int(covf) == 1  # 32 survivors per column > ROWS_OUT


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


def test_aggregate_runs_preserves_weighted_multiset():
    """_aggregate_runs must conserve the total occurrence count of every
    composite (run heads carry run_length-1 in the weight bits) and emit
    only real entries above U64_MAX padding after its compaction sort."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    k = 21
    shift = bottomk._spill_weight_shift(k)
    rng = np.random.default_rng(3)
    H, w = 64, 256
    vals = rng.integers(1, 1000, size=(H, w)).astype(np.uint64)
    # heavy duplication + padding
    vals[vals % 3 == 0] = 42
    pad = rng.random((H, w)) < 0.3
    vals[pad] = U64_MAX
    s2 = np.sort(vals, axis=0)  # column-sorted, as stage2 provides

    out = np.asarray(bottomk._aggregate_runs(jnp.asarray(s2), shift))
    mask = np.uint64((1 << shift) - 1)
    real = out[out != U64_MAX]
    got = {}
    for e in real:
        got[int(e & mask)] = got.get(int(e & mask), 0) + int(e >> shift) + 1
    exp = {}
    for e in vals[vals != U64_MAX]:
        exp[int(e)] = exp.get(int(e), 0) + 1
    assert got == exp
    # compaction: every real entry sits above the first all-MAX row
    col_real = (out != U64_MAX)
    assert np.array_equal(np.sort(col_real, axis=0)[::-1], col_real)


def test_weighted_spill_flush_exact():
    """_flush must decode run weights from spill entries: a weighted head
    equals that many plain duplicates, bit for bit."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    k = 21
    shift = bottomk._spill_weight_shift(k)
    rng = np.random.default_rng(9)
    pk = rng.integers(0, 4 ** k, size=64, dtype=np.uint64)
    rc = rng.integers(0, 2, size=64, dtype=np.uint64)
    comp = ((pk << np.uint64(1)) | rc) + np.uint64(1)
    weights = rng.integers(1, 7, size=64).astype(np.uint64)

    cap = 32
    spill_w = np.full(256, U64_MAX, dtype=np.uint64)
    spill_w[:64] = comp + ((weights - 1) << np.uint64(shift))
    plain = np.full(1024, U64_MAX, dtype=np.uint64)
    pos = 0
    for c, wt in zip(comp, weights):
        plain[pos:pos + int(wt)] = c
        pos += int(wt)

    s4 = (jnp.full((cap,), U64_MAX, dtype=jnp.uint64),
          jnp.zeros((cap,), dtype=jnp.uint64),
          jnp.zeros((cap,), dtype=jnp.uint64),
          jnp.zeros((cap,), dtype=jnp.uint64))
    a, _ = bottomk._flush(s4, jnp.asarray(spill_w), jnp.uint64(0),
                          k=k, seed=0)
    b, _ = bottomk._flush(s4, jnp.asarray(plain), jnp.uint64(0),
                          k=k, seed=0)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_compact_spill_preserves_count_mass():
    """_compact_spill must re-encode the spill's exact (composite ->
    total count) multiset as one weighted head per distinct composite,
    compacted to the front in ascending composite order."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    k = 21
    s = bottomk._spill_weight_shift(k)
    rng = np.random.default_rng(5)
    comp = np.unique(
        rng.integers(1, 1 << (2 * k + 1), size=50, dtype=np.uint64))
    entries = []
    want = {}
    for c in comp:
        for _ in range(int(rng.integers(1, 6))):
            w = int(rng.integers(1, 9))
            entries.append(np.uint64(c) + (np.uint64(w - 1) << np.uint64(s)))
            want[int(c)] = want.get(int(c), 0) + w
    rng.shuffle(entries)
    spill = np.full(512, U64_MAX, dtype=np.uint64)
    # interspersed U64_MAX holes (page-padding pattern)
    pos = rng.choice(512, size=len(entries), replace=False)
    spill[pos] = entries

    out, n_real, ovf = bottomk._compact_spill(jnp.asarray(spill), k=k)
    out = np.asarray(out)
    assert not bool(ovf)
    assert int(n_real) == len(want)
    got = out[: int(n_real)]
    assert np.all(out[int(n_real):] == U64_MAX)
    mask = np.uint64((1 << s) - 1)
    got_comp = got & mask
    got_w = (got >> np.uint64(s)).astype(np.int64) + 1
    assert np.array_equal(got_comp, np.sort(np.array(sorted(want),
                                                     dtype=np.uint64)))
    assert {int(c): int(w) for c, w in zip(got_comp, got_w)} == want


def test_compact_spill_weight_overflow_flag():
    """Run totals that exceed the weight field must set ovf (the caller
    then falls back to a real flush instead of losing count mass)."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    k = 21
    s = bottomk._spill_weight_shift(k)
    width = 64 - s
    near_max = (1 << width) - 1  # stored weight cap (count near_max + 1)
    spill = np.full(64, U64_MAX, dtype=np.uint64)
    c = np.uint64(123457)
    spill[0] = c + (np.uint64(near_max) << np.uint64(s))
    spill[1] = c  # +1 more pushes the total past the field
    out, n_real, ovf = bottomk._compact_spill(jnp.asarray(spill), k=k)
    assert bool(ovf)
    # a second composite with a fitting total stays exact
    spill2 = np.full(64, U64_MAX, dtype=np.uint64)
    spill2[0] = c + (np.uint64(near_max - 1) << np.uint64(s))
    spill2[1] = c
    out2, n2, ovf2 = bottomk._compact_spill(jnp.asarray(spill2), k=k)
    assert not bool(ovf2)
    assert int(n2) == 1
    assert int(np.asarray(out2)[0] >> np.uint64(s)) == near_max


def test_dup_burst_xla_aggregation_end_to_end():
    """Full sketch_step with duplicate-run aggregation (the tier-B/C
    machinery, forced onto the XLA path): a 64x-duplicate burst stream
    must produce bit-identical state to the plain path, counts included."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    rng = np.random.default_rng(21)
    cap, b = 2000, 1 << 17  # two_stage threshold is 128k lanes
    s_agg = bottomk.empty_state(cap)
    s_plain = bottomk.empty_state(cap)
    for step in range(3):
        base = rng.integers(0, 4 ** 21, size=b // 64, dtype=np.uint64)
        pk = np.tile(base, 64)
        rc = np.tile(rng.integers(0, 2, size=b // 64, dtype=np.uint8), 64)
        nv = jnp.uint32(b)
        s_agg, _ = bottomk.sketch_step(
            s_agg, jnp.asarray(pk), jnp.asarray(rc), nv, jnp.uint64(0),
            k=21, seed=0, has_max_hash=False, xla_aggregate=True)
        s_plain, _ = bottomk.sketch_step(
            s_plain, jnp.asarray(pk), jnp.asarray(rc), nv, jnp.uint64(0),
            k=21, seed=0, has_max_hash=False)
    f1, _ = bottomk.flush_state(s_agg, jnp.uint64(0), k=21, seed=0)
    f2, _ = bottomk.flush_state(s_plain, jnp.uint64(0), k=21, seed=0)
    for a, b2 in zip(f1[:4], f2[:4]):
        assert np.array_equal(np.asarray(a), np.asarray(b2))
    # counts really reflect the 64x duplication
    counts = np.asarray(f1[1])
    assert counts.max() >= 64


def test_spill_compaction_end_to_end_extreme_duplication():
    """A 4096x-duplicate stream (32 distinct composites per 128k batch,
    cold cap so the admission threshold never tightens) overflows the
    spill every step; compaction-on-overflow must absorb the bursts into
    weighted heads WITHOUT state merges, stay bit-exact vs the plain
    path, and leave a visibly compacted spill (few entries, run weights
    far above what per-page tier-B aggregation alone could produce)."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    rng = np.random.default_rng(77)
    cap, b, ndist = 2000, 1 << 17, 32
    s_c = bottomk.empty_state(cap)
    s_plain = bottomk.empty_state(cap)
    base = rng.integers(0, 4 ** 21, size=ndist, dtype=np.uint64)
    rcb = rng.integers(0, 2, size=ndist, dtype=np.uint8)
    for step in range(4):
        pk = np.tile(base, b // ndist)
        rc = np.tile(rcb, b // ndist)
        nv = jnp.uint32(b)
        s_c, _ = bottomk.sketch_step(
            s_c, jnp.asarray(pk), jnp.asarray(rc), nv, jnp.uint64(0),
            k=21, seed=0, has_max_hash=False, xla_aggregate=True)
        s_plain, _ = bottomk.sketch_step(
            s_plain, jnp.asarray(pk), jnp.asarray(rc), nv, jnp.uint64(0),
            k=21, seed=0, has_max_hash=False)
    # engagement proof: compaction leaves heads whose run weights span
    # MANY pages (per-page tier aggregation alone is bounded by the
    # stage-2 row width, 63 here), plus at most the pages appended since
    # the last compaction
    spill = np.asarray(s_c[4])
    real = spill[spill != U64_MAX]
    shift = bottomk._spill_weight_shift(21)
    assert len(real) <= ndist + (1 << 17) // 8
    assert int((real >> np.uint64(shift)).max()) + 1 >= 4096
    f1, _ = bottomk.flush_state(s_c, jnp.uint64(0), k=21, seed=0)
    f2, _ = bottomk.flush_state(s_plain, jnp.uint64(0), k=21, seed=0)
    for a, b2 in zip(f1[:4], f2[:4]):
        assert np.array_equal(np.asarray(a), np.asarray(b2))
    counts = np.asarray(f1[1])
    assert counts.max() >= 4 * (b // ndist)


def test_spill_compaction_scaled_path_exact_and_bound_valid():
    """Scaled sketching (has_max_hash) under duplicate bursts: compaction
    must keep the final state bit-exact AND the per-step below-bound an
    upper bound of the true distinct-below-max_hash count (the grow
    rail's exactness precondition)."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    rng = np.random.default_rng(31)
    cap, b, ndist = 2000, 1 << 17, 512
    max_hash = jnp.uint64(int(0.25 * 2 ** 64))
    s_c = bottomk.empty_state(cap)
    s_plain = bottomk.empty_state(cap)
    base = rng.integers(0, 4 ** 21, size=ndist, dtype=np.uint64)
    rcb = rng.integers(0, 2, size=ndist, dtype=np.uint8)
    below_c = below_p = None
    for step in range(4):
        pk = np.tile(base, b // ndist)
        rc = np.tile(rcb, b // ndist)
        nv = jnp.uint32(b)
        s_c, below_c = bottomk.sketch_step(
            s_c, jnp.asarray(pk), jnp.asarray(rc), nv, max_hash,
            k=21, seed=0, has_max_hash=True, xla_aggregate=True)
        s_plain, below_p = bottomk.sketch_step(
            s_plain, jnp.asarray(pk), jnp.asarray(rc), nv, max_hash,
            k=21, seed=0, has_max_hash=True)
    f1, _ = bottomk.flush_state(s_c, max_hash, k=21, seed=0)
    f2, _ = bottomk.flush_state(s_plain, max_hash, k=21, seed=0)
    for a, b2 in zip(f1[:4], f2[:4]):
        assert np.array_equal(np.asarray(a), np.asarray(b2))
    # true distinct below-threshold count from the flushed state
    h, c = np.asarray(f1[0]), np.asarray(f1[1])
    true_below = int(((h <= np.uint64(int(max_hash))) & (c > 0)).sum())
    assert int(below_c) >= true_below
    # compaction only tightens the bound (fewer spill entries), never
    # below the truth
    assert int(below_c) <= int(below_p)


def test_tier_switch_chunk_overflow_forces_tier_c(monkeypatch):
    """covf=1 with aovf=0 (a chunk column overflowed while the
    accumulator never did) must route to tier C: both cand and slab are
    inexact in that state, and paging either would silently drop
    survivors. The kernel is stubbed to return garbage cand/slab with
    correct hash planes and exactly that flag combination; the final
    state must still equal the pure-XLA path bit for bit."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    k, cap, b = 21, 509, pe.COLH * pe.CHUNK_W  # distinctive cap: the jit cache must never leak this stubbed trace to other tests
    rng = np.random.default_rng(13)
    pk = rng.integers(0, 4 ** k, size=b, dtype=np.uint64)
    pk[: b // 4] = pk[b // 4: b // 2]  # duplicates
    rc = rng.integers(0, 2, size=b, dtype=np.uint8)
    hashes = murmur3_packed(pk, k, 0)

    def stub(vlo, vhi, th_hi, th_lo, *, k, seed, interpret=False):
        nchunks = vlo.shape[0] // (pe.COLH * pe.CHUNK_W)
        garbage = jnp.zeros((pe.ACC_H * pe.CHUNK_W,), jnp.uint64)
        gslab = jnp.zeros((nchunks * pe.ROWS_OUT * pe.CHUNK_W,),
                          jnp.uint64)
        return (garbage, gslab,
                jnp.asarray((hashes & np.uint64(0xFFFFFFFF))
                            .astype(np.uint32)),
                jnp.asarray((hashes >> np.uint64(32)).astype(np.uint32)),
                jnp.int32(1), jnp.int32(0))

    monkeypatch.setattr(bottomk.pallas_extract, "extract_candidates", stub)
    monkeypatch.setattr(bottomk.pallas_extract, "supports",
                        lambda kk, bb: True)

    s_kern = bottomk.empty_state(cap)
    s_ref = bottomk.empty_state(cap)
    nv = jnp.uint32(b)
    s_kern, _ = bottomk.sketch_step(
        s_kern, jnp.asarray(pk), jnp.asarray(rc), nv, jnp.uint64(0),
        k=k, seed=0, has_max_hash=False, use_kernel=True)
    s_ref, _ = bottomk.sketch_step(
        s_ref, jnp.asarray(pk), jnp.asarray(rc), nv, jnp.uint64(0),
        k=k, seed=0, has_max_hash=False, use_kernel=False)
    f1, _ = bottomk.flush_state(s_kern, jnp.uint64(0), k=k, seed=0)
    f2, _ = bottomk.flush_state(s_ref, jnp.uint64(0), k=k, seed=0)
    for a, b2 in zip(f1[:4], f2[:4]):
        assert np.array_equal(np.asarray(a), np.asarray(b2))


def _dedup_decode(cand, k):
    """spill-encoded weighted heads -> {composite: count} (real entries)."""
    shift = np.uint64(2 * k + 2)
    mask = (np.uint64(1) << shift) - np.uint64(1)
    out = {}
    for e in cand[cand != U64_MAX]:
        comp = int(e & mask)
        w = int(e >> shift)
        assert comp not in out, "duplicate head emitted"
        out[comp] = w + 1
    return out


@pytest.mark.parametrize("k", [21, 15, 25])
def test_extract_candidates_weighted_absorb(k):
    """Weighted (duplicate-absorbing) accumulator: cross-chunk copies of
    a survivor add to its head's weight instead of occupying accumulator
    rows, in-chunk same-column duplicates collapse into weighted run
    heads, and the decoded {composite: count} map equals the bruteforce
    ground truth. The raw per-chunk slab must be byte-identical to the
    unweighted kernel's (tiers B/D2 are unaffected by weighted mode)."""
    import jax.numpy as jnp

    seed = 0
    nchunks = 2
    chunk = pe.COLH * pe.CHUNK_W
    b = nchunks * chunk
    assert pe.supports_weighted(k)
    rng = np.random.default_rng(7)
    # cross-chunk duplication: both chunks hold the same distinct values
    vals = rng.integers(0, 4 ** k, size=chunk, dtype=np.uint64)
    v = np.tile(vals, nchunks)
    rc = v & np.uint64(1)
    comp = (v << np.uint64(1)) | rc
    # in-chunk same-column duplicates (lanes i and i + CHUNK_W of chunk 0
    # share a lane column): run-collapse coverage
    comp[pe.CHUNK_W: pe.CHUNK_W + 100] = comp[:100]
    comp[-29:] = U64_MAX  # padding lanes
    vlo = jnp.asarray((comp & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    vhi = jnp.asarray((comp >> np.uint64(32)).astype(np.uint32))
    thresh = np.uint64(int(0.05 * 2 ** 64))
    th = jnp.uint32(int(thresh >> np.uint64(32)))
    tl = jnp.uint32(int(thresh & np.uint64(0xFFFFFFFF)))

    cw, slab_w, _hl, _hh, covf, aovf = pe.extract_candidates(
        vlo, vhi, th, tl, k=k, seed=seed, interpret=True, weighted=True)
    assert int(covf) == 0 and int(aovf) == 0
    cu, slab_u, _hl2, _hh2, covfu, aovfu = pe.extract_candidates(
        vlo, vhi, th, tl, k=k, seed=seed, interpret=True, weighted=False)
    assert np.array_equal(np.asarray(slab_w), np.asarray(slab_u))

    real = comp != U64_MAX
    hashes = murmur3_packed((comp >> np.uint64(1))[real], k, seed)
    want = {}
    for cc in (comp[real][hashes <= thresh] + np.uint64(1)).tolist():
        want[cc] = want.get(cc, 0) + 1
    got = _dedup_decode(np.asarray(cw), k)
    assert got == want
    # the unweighted kernel's per-occurrence multiset agrees too
    if int(aovfu) == 0:
        cu = np.asarray(cu)
        got_u = {}
        for e in cu[cu != U64_MAX].tolist():
            got_u[e] = got_u.get(e, 0) + 1
        assert got_u == want


def test_extract_candidates_weighted_distinct_matches_unweighted():
    """On duplicate-free input the weighted kernel must emit exactly the
    unweighted kernel's candidates (weight fields all zero)."""
    import jax.numpy as jnp

    b = pe.COLH * pe.CHUNK_W
    rng = np.random.default_rng(19)
    packed = rng.permutation(np.arange(b, dtype=np.uint64)
                             * np.uint64(65537)) % np.uint64(4 ** 21)
    # make values certainly distinct: multiply-by-odd permutation may
    # collide after the modulo, so dedup explicitly
    packed = np.unique(packed)
    v = np.full(b, U64_MAX, dtype=np.uint64)
    v[: len(packed)] = packed << np.uint64(1)
    rng.shuffle(v)
    thresh = np.uint64(int(0.01 * 2 ** 64))
    vlo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    vhi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    th = jnp.uint32(int(thresh >> np.uint64(32)))
    tl = jnp.uint32(int(thresh & np.uint64(0xFFFFFFFF)))
    cw, _s, _a, _b, covf, aovf = pe.extract_candidates(
        vlo, vhi, th, tl, k=21, seed=0, interpret=True, weighted=True)
    cu, _s2, _a2, _b2, covf2, aovf2 = pe.extract_candidates(
        vlo, vhi, th, tl, k=21, seed=0, interpret=True, weighted=False)
    assert (int(covf), int(aovf)) == (int(covf2), int(aovf2)) == (0, 0)
    cw = np.asarray(cw)
    cu = np.asarray(cu)
    assert np.array_equal(np.sort(cw), np.sort(cu))
    shift = np.uint64(2 * 21 + 2)
    assert np.all((cw[cw != U64_MAX] >> shift) == 0)


@pytest.mark.parametrize("nchunks,dup,k", [
    (1, 16, 21), (2, 64, 21),
    (1, 16, 15),   # wshift == 32: weight sits exactly at the hi word
    (1, 16, 25),   # minimum 12-bit weight field (supports_dedup bound)
])
def test_dedup_candidates_matches_bruteforce(nchunks, dup, k):
    """Tier-D kernel: weighted heads must equal the survivor multiset
    grouped by composite, under heavy tiled duplication (the adversarial
    dup-burst shape) and across chunks."""
    import jax.numpy as jnp

    seed = 0
    assert pe.supports_dedup(k, nchunks * pe.COLH * pe.CHUNK_W)
    b = nchunks * pe.COLH * pe.CHUNK_W
    rng = np.random.default_rng(23)
    distinct = rng.integers(0, 4 ** k, size=b // dup, dtype=np.uint64)
    packed = np.tile(distinct, dup)
    rc = np.tile(rng.integers(0, 2, size=b // dup, dtype=np.uint64), dup)
    v = (packed << np.uint64(1)) | rc
    v[-17:] = U64_MAX  # padding lanes
    thresh = np.uint64(int(0.3 * 2 ** 64))

    vlo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    vhi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    th = jnp.uint32(int(thresh >> np.uint64(32)))
    tl = jnp.uint32(int(thresh & np.uint64(0xFFFFFFFF)))
    _c, _s, khl, khh, _covf, _aovf = pe.extract_candidates(
        vlo, vhi, th, tl, k=k, seed=seed, interpret=True)
    cand, dovf = pe.dedup_candidates(vlo, vhi, khl, khh, th, tl,
                                     k=k, seed=seed, interpret=True)
    assert int(dovf) == 0

    real = v != U64_MAX
    hashes = murmur3_packed(packed, k, seed)
    keep = real & (hashes <= thresh)
    want = {}
    for comp in (v[keep] + np.uint64(1)).tolist():
        want[comp] = want.get(comp, 0) + 1
    got = _dedup_decode(np.asarray(cand), k)
    assert got == want


def test_dedup_candidates_overflow_on_distinct_flood():
    """All-distinct lanes at a high threshold exceed DUP_ACC_H heads per
    column: the kernel must flag dovf (callers fall back), never drop
    silently."""
    import jax.numpy as jnp

    k, seed = 21, 0
    b = pe.COLH * pe.CHUNK_W
    rng = np.random.default_rng(3)
    packed = rng.permutation(
        np.arange(b, dtype=np.uint64) * np.uint64(997)) % np.uint64(4 ** k)
    v = (packed << np.uint64(1))
    vlo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    vhi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    th = jnp.uint32(0xFFFFFFFF)
    tl = jnp.uint32(0xFFFFFFFF)  # keep everything: 32 distinct per column
    _c, _s, khl, khh, _covf, _aovf = pe.extract_candidates(
        vlo, vhi, th, tl, k=k, seed=seed, interpret=True)
    cand, dovf = pe.dedup_candidates(vlo, vhi, khl, khh, th, tl,
                                     k=k, seed=seed, interpret=True)
    # 32 survivors + fresh holes per column cannot all fit DUP_ACC_H=32
    # after the first chunk of a 1-chunk batch... a single chunk CAN fit
    # exactly 32 distinct per column, so use the exactness contract
    # instead: either dovf, or the multiset is exact
    if int(dovf) == 0:
        hashes = murmur3_packed(packed, k, seed)
        want = {}
        for comp in (v + np.uint64(1)).tolist():
            want[comp] = want.get(comp, 0) + 1
        got = _dedup_decode(np.asarray(cand), k)
        assert got == want


def _state_tuples(state, k, seed):
    from finch_tpu.ops import bottomk

    import jax.numpy as jnp

    st, _ = bottomk.flush_state(state, jnp.uint64(0), k=k, seed=seed)
    sh, sc, se, spk = (np.asarray(a) for a in st[:4])
    real = sc > 0
    return list(zip(sh[real].tolist(), sc[real].tolist(),
                    se[real].tolist(), spk[real].tolist()))


@pytest.mark.parametrize("pattern", ["full_dup", "mixed"])
@pytest.mark.parametrize("absorb", [True, False])
def test_sketch_step_tier_d_integration(pattern, absorb):
    """Full sketch_step through the kernel path (interpret mode) on
    duplicate-burst batches: with the weighted accumulator (absorb=True)
    the burst stays on tier A; with it disabled the dedup tiers D2/D
    carry it. Both must fold into a state identical to NumpyEngine's."""
    import jax.numpy as jnp

    from finch_tpu.models.engine import NumpyEngine
    from finch_tpu.models.params import SketchParams
    from finch_tpu.ops import bottomk

    k, seed, size = 21, 0, 256
    b = 2 * pe.COLH * pe.CHUNK_W  # 131072: two chunks, two-stage eligible
    rng = np.random.default_rng(31)
    if pattern == "full_dup":
        distinct = rng.integers(0, 4 ** k, size=b // 64, dtype=np.uint64)
        packed = np.tile(distinct, 64)
        rc = np.tile(rng.integers(0, 2, size=b // 64, dtype=np.uint8), 64)
    else:
        # half heavy duplicates, half unique
        d1 = rng.integers(0, 4 ** k, size=b // 32, dtype=np.uint64)
        packed = np.concatenate(
            [np.tile(d1, 16),
             rng.integers(0, 4 ** k, size=b // 2, dtype=np.uint64)])
        rc = rng.integers(0, 2, size=b, dtype=np.uint8)

    state = bottomk.empty_state(size)
    state, _ = bottomk.sketch_step(
        state, jnp.asarray(packed), jnp.asarray(rc), jnp.uint32(b),
        jnp.uint64(0), k=k, seed=seed, has_max_hash=False,
        use_kernel=True, kernel_interpret=True, absorb=absorb)
    # second batch against a warmed threshold exercises the masked path
    packed2 = packed ^ np.uint64(0x155)
    state, _ = bottomk.sketch_step(
        state, jnp.asarray(packed2), jnp.asarray(rc), jnp.uint32(b),
        jnp.uint64(0), k=k, seed=seed, has_max_hash=False,
        use_kernel=True, kernel_interpret=True, absorb=absorb)
    got = _state_tuples(state, k, seed)

    eng = NumpyEngine(SketchParams.mash(kmers_to_sketch=size,
                                        final_size=size, no_strict=True))
    eng.update(packed, rc)
    eng.update(packed2, rc)
    want = list(zip(eng.h.tolist(), eng.c.tolist(), eng.e.tolist(),
                    eng.pks[0].tolist()))
    assert got == want


def test_sketch_step_tier_a_direct_paging(monkeypatch):
    """TIERA_DIRECT pages the accumulator output without the re-sort;
    the folded state must stay identical to NumpyEngine's (pads inside
    pages are ignored by every consumer)."""
    import jax.numpy as jnp

    from finch_tpu.models.engine import NumpyEngine
    from finch_tpu.models.params import SketchParams
    from finch_tpu.ops import bottomk

    k, seed, size = 21, 0, 512
    b = 2 * pe.COLH * pe.CHUNK_W
    rng = np.random.default_rng(41)
    packed = rng.integers(0, 4 ** k, size=b, dtype=np.uint64)
    rc = rng.integers(0, 2, size=b, dtype=np.uint8)

    monkeypatch.setattr(bottomk, "TIERA_DIRECT", True)
    bottomk._sketch_step.clear_cache()  # the knob is read at trace time
    try:
        state = bottomk.empty_state(size)
        for xor in (0, 0x3F1):
            p = packed ^ np.uint64(xor)
            state, _ = bottomk.sketch_step(
                state, jnp.asarray(p), jnp.asarray(rc), jnp.uint32(b),
                jnp.uint64(0), k=k, seed=seed, has_max_hash=False,
                use_kernel=True, kernel_interpret=True)
        got = _state_tuples(state, k, seed)
    finally:
        monkeypatch.undo()
        bottomk._sketch_step.clear_cache()

    eng = NumpyEngine(SketchParams.mash(kmers_to_sketch=size,
                                        final_size=size, no_strict=True))
    for xor in (0, 0x3F1):
        eng.update(packed ^ np.uint64(xor), rc)
    want = list(zip(eng.h.tolist(), eng.c.tolist(), eng.e.tolist(),
                    eng.pks[0].tolist()))
    assert got == want


@pytest.mark.parametrize("absorb", [True, False])
def test_sketch_step_tier_d_scaled(absorb):
    """Duplicate burst under the scaled scheme (has_max_hash): weighted
    heads (tier A absorbed or tier D re-selected) + the spill-occupancy
    below bound must match NumpyEngine."""
    import jax.numpy as jnp

    from finch_tpu.models.engine import NumpyEngine
    from finch_tpu.models.params import SketchParams
    from finch_tpu.ops import bottomk

    k, seed = 21, 0
    b = 2 * pe.COLH * pe.CHUNK_W
    rng = np.random.default_rng(53)
    distinct = rng.integers(0, 4 ** k, size=b // 64, dtype=np.uint64)
    packed = np.tile(distinct, 64)
    rc = np.tile(rng.integers(0, 2, size=b // 64, dtype=np.uint8), 64)

    params = SketchParams.scaled(kmers_to_sketch=64, scale=0.01)
    max_hash = np.uint64(params.max_hash())
    cap = 4096
    state = bottomk.empty_state(cap)
    state, below = bottomk.sketch_step(
        state, jnp.asarray(packed), jnp.asarray(rc), jnp.uint32(b),
        jnp.asarray(max_hash), k=k, seed=seed, has_max_hash=True,
        use_kernel=True, kernel_interpret=True, absorb=absorb)
    assert int(below) + 64 <= cap  # no grow needed at this scale
    st, _ = bottomk.flush_state(state, jnp.asarray(max_hash), k=k,
                                seed=seed)
    sh, sc, se, spk = (np.asarray(a) for a in st[:4])
    real = sc > 0
    got = list(zip(sh[real].tolist(), sc[real].tolist(),
                   se[real].tolist(), spk[real].tolist()))

    eng = NumpyEngine(params)
    eng.update(packed, rc)
    want = list(zip(eng.h.tolist(), eng.c.tolist(), eng.e.tolist(),
                    eng.pks[0].tolist()))
    # the device state retains at least the engine's retention set; after
    # the scheme retention both must agree
    keep = min(len(want), len(got))
    from finch_tpu.models.engine import _retention_keep
    keep_n = _retention_keep(params, np.array([t[0] for t in got],
                                              dtype=np.uint64))
    assert got[:keep_n] == want[:keep_n]
    assert len(want) >= keep_n


def test_sketch_step_tier_d_composite_inputs():
    """Tier D driven through composite (lo, hi) u32 planes — the
    production parser/bench operand layout — must match the classic
    operand result bit for bit."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    k, seed, size = 21, 0, 256
    b = 2 * pe.COLH * pe.CHUNK_W
    rng = np.random.default_rng(61)
    distinct = rng.integers(0, 4 ** k, size=b // 64, dtype=np.uint64)
    packed = np.tile(distinct, 64)
    rc = np.tile(rng.integers(0, 2, size=b // 64, dtype=np.uint8), 64)
    comp = (packed << np.uint64(1)) | rc
    clo = (comp & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    chi = (comp >> np.uint64(32)).astype(np.uint32)

    s_classic = bottomk.empty_state(size)
    s_classic, _ = bottomk.sketch_step(
        s_classic, jnp.asarray(packed), jnp.asarray(rc), jnp.uint32(b),
        jnp.uint64(0), k=k, seed=seed, has_max_hash=False,
        use_kernel=True, kernel_interpret=True)
    s_comp = bottomk.empty_state(size)
    s_comp, _ = bottomk.sketch_step(
        s_comp, jnp.asarray(clo), jnp.asarray(chi), jnp.uint32(b),
        jnp.uint64(0), k=k, seed=seed, has_max_hash=False,
        use_kernel=True, composite=True, kernel_interpret=True)
    assert _state_tuples(s_classic, k, seed) == \
        _state_tuples(s_comp, k, seed)


@pytest.mark.parametrize("nchunks,dup,frac", [
    (4, 4, 0.02), (8, 8, 0.02), (4, 1, 0.01),
])
def test_dedup_slab_candidates_matches_bruteforce(nchunks, dup, frac):
    """Tier-D2 kernel: weighted heads straight from the slab must equal
    the survivor multiset grouped by composite, for burst patterns whose
    copies spread across chunks (covf == 0 regime)."""
    import jax.numpy as jnp

    k, seed = 21, 0
    b = nchunks * pe.COLH * pe.CHUNK_W
    assert pe.supports_dedup_slab(k, b)
    rng = np.random.default_rng(5)
    distinct = rng.integers(0, 4 ** k, size=b // dup, dtype=np.uint64)
    packed = np.tile(distinct, dup)
    rc = np.tile(rng.integers(0, 2, size=b // dup, dtype=np.uint64), dup)
    v = (packed << np.uint64(1)) | rc
    v[-9:] = U64_MAX
    thresh = np.uint64(int(frac * 2 ** 64))
    vlo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    vhi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    th = jnp.uint32(int(thresh >> np.uint64(32)))
    tl = jnp.uint32(int(thresh & np.uint64(0xFFFFFFFF)))
    _c, slab, _hl, _hh, covf, _aovf = pe.extract_candidates(
        vlo, vhi, th, tl, k=k, seed=seed, interpret=True)
    assert int(covf) == 0  # precondition of the D2 contract
    cand, d2ovf = pe.dedup_slab_candidates(slab, k=k, interpret=True)
    assert int(d2ovf) == 0

    real = v != U64_MAX
    hashes = murmur3_packed(packed, k, seed)
    keep = real & (hashes <= thresh)
    want = {}
    for comp in (v[keep] + np.uint64(1)).tolist():
        want[comp] = want.get(comp, 0) + 1
    got = _dedup_decode(np.asarray(cand), k)
    assert got == want


def test_dedup_slab_gate():
    """supports_dedup_slab: group divisibility and tier-D bounds."""
    unit = pe.COLH * pe.CHUNK_W
    assert pe.supports_dedup_slab(21, pe.DUP_GROUP * unit)
    assert not pe.supports_dedup_slab(21, (pe.DUP_GROUP - 1) * unit)
    assert not pe.supports_dedup_slab(27, pe.DUP_GROUP * unit)  # wbits


@pytest.mark.parametrize("n_copies,expect_d2", [(5, True), (1, False)])
def test_sketch_step_tier_d2_integration(n_copies, expect_d2):
    """aovf-without-covf through a full sketch_step: one column floods
    the accumulator with spread-out copies (<= ROWS_OUT per chunk, so
    the slab stays exhaustive) while the rest of the batch is sparse.
    n_copies=5 x 8 chunks = 40 copies of ONE value -> tier D2 collapses
    them to a weighted head; n_copies=1 with > DUP_ACC_H distinct values
    in one column -> D2's head rows overflow (d2ovf) and the step falls
    back (tier B when the slab is complete) — both must fold into a
    state identical to NumpyEngine's."""
    import jax.numpy as jnp

    from finch_tpu.models.engine import NumpyEngine
    from finch_tpu.models.params import SketchParams
    from finch_tpu.ops import bottomk

    k, seed, size = 21, 0, 256
    if n_copies == 5:
        nchunks = 8
        rows_per_chunk = 5
        flood_n = 40  # 40 copies of ONE value, 5 rows/chunk, column 0
    else:
        # enough DISTINCT heads in one column to overflow the
        # DUP_ACC_H-row D2 accumulator: ROWS_OUT per chunk (the covf
        # bound) x enough chunks, rounded up to the staging group
        need = pe.DUP_ACC_H // pe.ROWS_OUT + 2
        nchunks = ((need + pe.DUP_GROUP - 1)
                   // pe.DUP_GROUP) * pe.DUP_GROUP
        rows_per_chunk = pe.ROWS_OUT
        flood_n = nchunks * rows_per_chunk
        assert flood_n > pe.DUP_ACC_H
    b = nchunks * pe.COLH * pe.CHUNK_W
    assert pe.supports_dedup_slab(k, b)
    rng = np.random.default_rng(77)

    # batch 1: uniform warm-up (decays the admission threshold)
    p1 = rng.integers(0, 4 ** k, size=b, dtype=np.uint64)
    rc1 = rng.integers(0, 2, size=b, dtype=np.uint8)

    # batch 2: sparse uniform background + a column-0 flood of surviving
    # values placed 5 rows per chunk (rows 0..4, column 0 of each chunk)
    p2 = rng.integers(0, 4 ** k, size=b, dtype=np.uint64)
    rc2 = rng.integers(0, 2, size=b, dtype=np.uint8)
    h1 = murmur3_packed(p1, k, seed)
    order = np.argsort(h1, kind="stable")
    thresh = h1[order[size - 1]]  # the warmed admission threshold
    # flood values = batch-1 k-mers with the smallest hashes: guaranteed
    # below the warmed threshold (duplicates against the state are fine
    # and exactly what a burst is)
    surv = np.unique(p1[order[:size - 8]])[:flood_n]
    assert len(surv) >= flood_n
    flood = (np.repeat(surv[:1], flood_n) if n_copies == 5
             else surv[:flood_n])
    i = 0
    for c in range(nchunks):
        for r in range(rows_per_chunk):
            lane = c * (pe.COLH * pe.CHUNK_W) + r * pe.CHUNK_W
            p2[lane] = flood[i]
            rc2[lane] = 0
            i += 1

    # confirm the crafted regime: dirty, covf==0, d2ovf as expected.
    # The tier-D2 regime only exists with the weighted accumulator off
    # (absorb collapses the flood in-kernel and aovf never fires), so
    # this test pins weighted=False / absorb=False throughout.
    comp = (p2 << np.uint64(1)) | rc2
    vlo = jnp.asarray((comp & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    vhi = jnp.asarray((comp >> np.uint64(32)).astype(np.uint32))
    th32 = jnp.uint32(int(thresh >> np.uint64(32)))
    tl32 = jnp.uint32(int(thresh & np.uint64(0xFFFFFFFF)))
    _c, slab, _hl, _hh, covf, aovf = pe.extract_candidates(
        vlo, vhi, th32, tl32, k=k, seed=seed, interpret=True,
        weighted=False)
    assert int(covf) == 0
    assert int(aovf) == 1
    # the weighted accumulator absorbs a DUPLICATE flood without
    # overflow (n_copies=5: 40 copies of one value collapse to a
    # weighted head); 40 DISTINCT values still legitimately overflow
    # the 32-row column (n_copies=1) and must trip aovf
    _cw, _sw, _hlw, _hhw, covf_w, aovf_w = pe.extract_candidates(
        vlo, vhi, th32, tl32, k=k, seed=seed, interpret=True,
        weighted=True)
    assert int(covf_w) == 0
    assert int(aovf_w) == (0 if n_copies == 5 else 1)
    _cand, d2ovf = pe.dedup_slab_candidates(slab, k=k, interpret=True)
    assert int(d2ovf) == (0 if expect_d2 else 1)

    state = bottomk.empty_state(size)
    for p, rc in ((p1, rc1), (p2, rc2)):
        state, _ = bottomk.sketch_step(
            state, jnp.asarray(p), jnp.asarray(rc), jnp.uint32(b),
            jnp.uint64(0), k=k, seed=seed, has_max_hash=False,
            use_kernel=True, kernel_interpret=True, absorb=False)
    got = _state_tuples(state, k, seed)

    eng = NumpyEngine(SketchParams.mash(kmers_to_sketch=size,
                                        final_size=size, no_strict=True))
    eng.update(p1, rc1)
    eng.update(p2, rc2)
    want = list(zip(eng.h.tolist(), eng.c.tolist(), eng.e.tolist(),
                    eng.pks[0].tolist()))
    assert got == want


def test_adaptive_absorb_hint_lifecycle():
    """The adaptive-absorb hint (state element 7) must (a) stay 0 through
    a cold batch (covf fires), (b) flip to 1 when the dedup tiers engage
    with a complete slab (duplicate pressure), and (c) drop back to 0
    after a weighted batch that absorbed nothing co-column."""
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    k, seed, size = 21, 0, 256
    nchunks = 8
    b = nchunks * pe.COLH * pe.CHUNK_W
    rng = np.random.default_rng(5)

    p1 = rng.integers(0, 4 ** k, size=b, dtype=np.uint64)
    rc1 = rng.integers(0, 2, size=b, dtype=np.uint8)

    state = bottomk.empty_state(size)
    assert int(np.asarray(state[6])[0]) == 0

    def step(state, p, rc):
        state, _ = bottomk.sketch_step(
            state, jnp.asarray(p), jnp.asarray(rc), jnp.uint32(b),
            jnp.uint64(0), k=k, seed=seed, has_max_hash=False,
            use_kernel=True, kernel_interpret=True, absorb=True)
        return state

    # (a) cold batch: every lane survives the MAX threshold, chunk
    # columns overflow (covf=1), hint must not engage
    state = step(state, p1, rc1)
    assert int(np.asarray(state[6])[0]) == 0

    # (b) duplicate flood with a complete slab: 40 copies of ONE
    # surviving value, 5 rows per chunk in column 0 (covf stays 0, the
    # accumulator overflows, D2 collapses 39/40 = 97.5% >= the 1/4
    # worth-it bar). Background lanes recycle ABOVE-threshold values so
    # the flood dominates the survivor mass.
    h1 = murmur3_packed(p1, k, seed)
    order = np.argsort(h1, kind="stable")
    surv = np.unique(p1[order[:80]])[:40]
    above = p1[order[4 * size:]]
    p2 = np.tile(above, 2)[:b].copy()
    rc2 = rng.integers(0, 2, size=b, dtype=np.uint8)
    for c in range(nchunks):
        for r in range(5):
            lane = c * (pe.COLH * pe.CHUNK_W) + r * pe.CHUNK_W
            p2[lane] = surv[0]  # 40 copies of ONE surviving value
            rc2[lane] = 0
    state = step(state, p2, rc2)
    assert int(np.asarray(state[6])[0]) == 1

    # (c) a batch with no survivors at all: the weighted kernel runs
    # (hint==1) but absorbs nothing, so the hint must drop
    # use values whose hashes exceed the warmed threshold: recycle p1's
    # LARGEST-hash values (they were truncated out of the 256-state)
    p3 = p1[order[-b // 4:]]
    p3 = np.tile(p3, 4)[:b]
    rc3 = np.zeros(b, dtype=np.uint8)
    state = step(state, p3, rc3)
    assert int(np.asarray(state[6])[0]) == 0
