"""Distance engine pins from /root/reference/lib/src/distance.rs tests."""

import random

import numpy as np

from finch_tpu.core.distance import (distance, old_distance_arrays,
                                     raw_distance_arrays)
from finch_tpu.core.sketch import KmerCount, Sketch
from finch_tpu.models.params import FilterParams, SketchParams


def raw(q, r, scale=0.0):
    return raw_distance_arrays(np.array(q, np.uint64),
                               np.array(r, np.uint64), scale)


def test_raw_distance():
    """distance.rs:187-209."""
    assert raw([0, 1, 2], [1, 2]) == (1.0, 2 / 3, 2, 3)
    assert raw([0, 2], [1, 2]) == (0.5, 1 / 3, 1, 3)
    assert raw([0, 1], [2, 3]) == (0.0, 0.0, 0, 2)
    assert raw([], []) == (0.0, 1.0, 0, 0)
    assert raw([], [5]) == (0.0, 1.0, 0, 0)


def test_raw_distance_scaled():
    """distance.rs:212-242 (scale 1e-18 -> max_hash 18)."""
    assert raw([10, 15, 20], [15, 20], 1e-18) == (1.0, 2 / 3, 2, 3)
    assert raw([5, 10, 15], [5, 10], 1e-18) == (1.0, 2 / 3, 2, 3)
    assert raw([5, 10, 15, 20], [5, 10], 1e-18) == (1.0, 2 / 3, 2, 3)
    assert raw([5, 10], [5, 10, 15, 20], 1e-18) == (2 / 3, 2 / 3, 2, 3)


def _two_pointer_reference(q, r):
    """Literal transcription of distance.rs:82-95 for property testing."""
    i = j = common = 0
    while i < len(q) and j < len(r):
        if q[i] < r[j]:
            i += 1
        elif q[i] > r[j]:
            j += 1
        else:
            common += 1
            i += 1
            j += 1
    return i, j, common


def test_raw_distance_matches_two_pointer_property():
    random.seed(3)
    for _ in range(200):
        q = sorted(random.sample(range(50), random.randint(0, 20)))
        r = sorted(random.sample(range(50), random.randint(0, 20)))
        i, j, common = _two_pointer_reference(q, r)
        cont, jac, com, total = raw(q, r)
        assert com == common
        assert total == i - common + j
        exp_cont = 0.0 if j == 0 else common / j
        assert cont == exp_cont


def test_raw_distance_commutes():
    """distance.rs:176-185 proptest."""
    random.seed(4)
    for _ in range(100):
        q = sorted(random.sample(range(10**6), random.randint(0, 30)))
        r = sorted(random.sample(range(10**6), random.randint(0, 30)))
        assert raw(q, r) == tuple(raw(r, q)[i] for i in (0, 1, 2, 3))


def test_old_distance():
    cont, jac, com, total = old_distance_arrays(
        np.array([0, 1, 2], np.uint64), np.array([1, 2], np.uint64))
    assert (com, total) == (2, 2)
    assert cont == 1.0
    assert jac == 2 / (2 + 2 * 0)


def _mk_sketch(name, hashes, params):
    return Sketch(name=name, seq_length=0, num_valid_kmers=0, comment="",
                  hashes=[KmerCount(hash=h, kmer=b"", count=1, extra_count=0)
                          for h in hashes],
                  filter_params=FilterParams(), sketch_params=params)


def test_distance_full():
    """distance.rs:312-337 style: identical sketches -> jaccard=1, dist=0."""
    p = SketchParams.mash(kmers_to_sketch=3, final_size=3, kmer_length=2)
    s1 = _mk_sketch("a", [1, 2, 3], p)
    s2 = _mk_sketch("b", [1, 2, 3], p)
    d = distance(s1, s2)
    assert d.jaccard == 1.0
    assert d.containment == 1.0
    assert d.common_hashes == 3
    assert d.mash_distance == 0.0

    d2 = distance(_mk_sketch("a", [1, 2], p), _mk_sketch("b", [3, 4], p))
    assert d2.jaccard == 0.0
    assert d2.mash_distance == 1.0  # clamped from +inf


def test_distance_scaled_min_scale():
    """distance.rs:23-28: min_scale only when both sketches are scaled."""
    ps = SketchParams.scaled(kmers_to_sketch=0, kmer_length=2, scale=1e-18)
    pm = SketchParams.mash(kmers_to_sketch=4, final_size=4, kmer_length=2)
    s_scaled = _mk_sketch("s", [5, 10, 15, 20], ps)
    r_scaled = _mk_sketch("r", [5, 10], ps)
    d = distance(s_scaled, r_scaled)
    assert (d.common_hashes, d.total_hashes) == (2, 3)  # scaled tail applied
    s_mash = _mk_sketch("s", [5, 10, 15, 20], pm)
    r_mash = _mk_sketch("r", [5, 10], pm)
    d = distance(s_mash, r_mash)
    assert (d.common_hashes, d.total_hashes) == (2, 2)  # no tail


def test_batched_cli_distances_match_serial():
    """cli.calc_sketch_distances batched (device-tiled) path == serial loop."""
    import numpy as np

    from finch_tpu.cli import calc_sketch_distances, _calc_distances_batched
    from finch_tpu.core.sketch import KmerCount, Sketch
    from finch_tpu.models.params import FilterParams, SketchParams

    rng = np.random.default_rng(2)

    def mk(name, n):
        hashes = np.sort(rng.choice(2 ** 40, size=n, replace=False)
                         .astype(np.uint64))
        kcs = [KmerCount(hash=int(h), kmer=b"A" * 21, count=1, extra_count=0)
               for h in hashes]
        return Sketch(name=name, seq_length=0, num_valid_kmers=0, comment="",
                      hashes=kcs, filter_params=FilterParams(),
                      sketch_params=SketchParams.mash(kmers_to_sketch=n,
                                                      final_size=n))

    queries = [mk(f"q{i}", 64) for i in range(4)]
    refs = [mk(f"r{i}", 64) for i in range(5)] + [queries[0]]

    serial = calc_sketch_distances(queries, refs, False, 1.0)
    batched = _calc_distances_batched(queries, refs, 1.0)
    assert [(d.query, d.reference, d.common_hashes, d.total_hashes,
             d.containment, d.jaccard, d.mash_distance) for d in serial] == \
           [(d.query, d.reference, d.common_hashes, d.total_hashes,
             d.containment, d.jaccard, d.mash_distance) for d in batched]


def test_batched_routing_through_calc_sketch_distances():
    """>=4096 pairs with uniform params actually routes through the batched
    engine (cli.py:362-366) and matches a serial re-run."""
    import numpy as np

    from finch_tpu.cli import calc_sketch_distances
    from finch_tpu.core.sketch import KmerCount, Sketch
    from finch_tpu.models.params import FilterParams, SketchParams

    rng = np.random.default_rng(4)

    def mk(name):
        hashes = np.sort(rng.choice(2 ** 40, size=16, replace=False)
                         .astype(np.uint64))
        kcs = [KmerCount(hash=int(h), kmer=b"A" * 21, count=1,
                         extra_count=0) for h in hashes]
        return Sketch(name=name, seq_length=0, num_valid_kmers=0,
                      comment="", hashes=kcs,
                      filter_params=FilterParams(),
                      sketch_params=SketchParams.mash(kmers_to_sketch=16,
                                                      final_size=16))

    queries = [mk(f"q{i}") for i in range(8)]
    refs = [mk(f"r{i}") for i in range(520)]  # 8 x 520 = 4160 >= 4096
    batched = calc_sketch_distances(queries, refs, False, 1.0,
                                    use_device=True)
    serial = calc_sketch_distances(queries, refs, False, 1.0,
                                   use_device=False)
    assert len(batched) == len(serial) == 8 * 520
    assert [(d.query, d.reference, d.common_hashes, d.jaccard)
            for d in batched] == \
           [(d.query, d.reference, d.common_hashes, d.jaccard)
            for d in serial]


def test_old_distance_empty_ref_is_nan():
    """distance.rs:150-155: empty ref leaves total == 0 and the 0/0 f64
    divisions yield NaN (not a crash)."""
    import math

    from finch_tpu.core.distance import old_distance_arrays

    c, j, common, total = old_distance_arrays(
        np.array([1, 2, 3], dtype=np.uint64), np.array([], dtype=np.uint64))
    assert math.isnan(c) and math.isnan(j)
    assert (common, total) == (0, 0)


def test_old_distance_empty_query_raises_finch_error():
    """Rust would panic on query_sketch[0] (distance.rs:142); we raise the
    unified FinchError so the CLI exits cleanly."""
    import pytest

    from finch_tpu.core.distance import old_distance_arrays
    from finch_tpu.errors import FinchError

    with pytest.raises(FinchError):
        old_distance_arrays(np.array([], dtype=np.uint64),
                            np.array([7], dtype=np.uint64))


def test_nan_jaccard_clamps_mash_distance_to_zero():
    """f64::max(0, NaN) -> 0 in Rust (distance.rs:41); Python's
    min(1, max(0, nan)) happens to agree — pin it."""
    from finch_tpu.core.distance import mash_distance_from_jaccard

    assert mash_distance_from_jaccard(float("nan"), 21.0) == 0.0


def test_error_taxonomy_unified():
    """errors.rs:5-25 parity: one FinchError across native/core/CLI."""
    from finch_tpu.cli import CliError
    from finch_tpu.errors import (FinchError, FinchMessageError,
                                  FinchSchemaError)
    from finch_tpu.native import NativeError
    from finch_tpu.serialization.capnp_lite import CapnpError

    for sub in (CliError, NativeError, CapnpError, FinchMessageError,
                FinchSchemaError):
        assert issubclass(sub, FinchError)
    # backward-compatible Python idioms
    assert issubclass(FinchMessageError, ValueError)
    assert issubclass(FinchSchemaError, ValueError)


def test_gram_cli_path_fuzz_vs_serial():
    """Randomized pairwise workloads through _calc_distances_gram
    (survivors + candidate mask + lazy rows) must match the serial
    per-pair engine on every field, across random max-dist cuts, scales,
    sketch-size skews, and duplicate names."""
    from hypothesis import given, settings, strategies as st

    from finch_tpu.cli import _calc_distances_gram
    from finch_tpu.core.distance import distance
    from finch_tpu.core.sketch import LazyKmerCounts, Sketch
    from finch_tpu.models.params import FilterParams, SketchParams

    def mk_db(seed, n, overlap_pool, scale):
        rng = np.random.default_rng(seed)
        if scale > 0:
            params = SketchParams.scaled(kmers_to_sketch=8, scale=scale)
        else:
            params = SketchParams.mash(kmers_to_sketch=16, final_size=16,
                                       no_strict=True)
        pool = rng.choice(1 << 44, size=overlap_pool,
                          replace=False).astype(np.uint64)
        sks = []
        for i in range(n):
            m = int(rng.integers(0, 16))
            hs = np.sort(rng.choice(pool, size=m, replace=False)) if m \
                else np.empty(0, dtype=np.uint64)
            c = rng.integers(1, 4, size=m, dtype=np.uint32)
            nm = f"s{i % max(1, n - 1)}"  # forces some duplicate names
            sks.append(Sketch(
                name=nm, seq_length=3, num_valid_kmers=5, comment="",
                hashes=LazyKmerCounts(hs, [b""] * m, c, c // 2),
                filter_params=FilterParams(filter_on=False),
                sketch_params=params))
        return sks

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 10 ** 6), st.integers(3, 9),
           st.sampled_from([24, 200]),
           st.sampled_from([0.0, 1e-13]),
           st.sampled_from([0.05, 0.3, 0.99, 1.0]))
    def run(seed, n, pool, scale, max_dist):
        sks = mk_db(seed, n, pool, scale)
        k = float(sks[0].sketch_params.k)
        got = [(d.query, d.reference, d.containment, d.jaccard,
                d.mash_distance, d.common_hashes, d.total_hashes)
               for d in _calc_distances_gram(sks, scale, k, max_dist)]
        want = []
        for ref in sks:
            for q in sks:
                if q == ref:
                    continue
                d = distance(q, ref)
                if d.mash_distance <= max_dist:
                    want.append((d.query, d.reference, d.containment,
                                 d.jaccard, d.mash_distance,
                                 d.common_hashes, d.total_hashes))
        assert got == want

    run()


def test_batched_query_db_fuzz_vs_serial():
    """Randomized query-vs-DB workloads through _calc_distances_batched
    (vectorized chunked path, lazy rows) vs the serial per-pair loop."""
    from hypothesis import given, settings, strategies as st

    from finch_tpu.cli import _calc_distances_batched
    from finch_tpu.core.distance import distance
    from finch_tpu.core.sketch import LazyKmerCounts, Sketch
    from finch_tpu.models.params import FilterParams, SketchParams

    params = SketchParams.mash(kmers_to_sketch=12, final_size=12,
                               no_strict=True)

    def mk(rng, nm, pool):
        m = int(rng.integers(0, 12))
        hs = np.sort(rng.choice(pool, size=m, replace=False)) if m \
            else np.empty(0, dtype=np.uint64)
        c = rng.integers(1, 4, size=m, dtype=np.uint32)
        return Sketch(name=nm, seq_length=2, num_valid_kmers=4, comment="",
                      hashes=LazyKmerCounts(hs, [b""] * m, c, c // 2),
                      filter_params=FilterParams(filter_on=False),
                      sketch_params=params)

    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 10 ** 6), st.integers(1, 4), st.integers(2, 7),
           st.sampled_from([0.2, 0.8, 1.0]))
    def run(seed, nq, nr, max_dist):
        rng = np.random.default_rng(seed)
        pool = rng.choice(1 << 44, size=40, replace=False).astype(np.uint64)
        queries = [mk(rng, f"q{i}", pool) for i in range(nq)]
        refs = [mk(rng, f"r{i}", pool) for i in range(nr)]
        # a query placed into the DB under the same name: self-skip path
        refs.append(queries[0])
        got = [(d.query, d.reference, d.containment, d.jaccard,
                d.mash_distance, d.common_hashes, d.total_hashes)
               for d in _calc_distances_batched(queries, refs, max_dist)]
        want = []
        for ref in refs:
            for q in queries:
                if q.name == ref.name and q == ref:
                    continue
                d = distance(q, ref)
                if d.mash_distance <= max_dist:
                    want.append((d.query, d.reference, d.containment,
                                 d.jaccard, d.mash_distance,
                                 d.common_hashes, d.total_hashes))
        assert got == want

    run()


# ---------------------------------------------------------------------------
# Mash-paper compatibility oracle (VERDICT r3 item 6)
# ---------------------------------------------------------------------------

def _mash_paper_distance(sketch2, sketch1):
    """Transcription of the reference's own transcription of Mash's
    distance calculation (distance.rs:244-283, `mash_paper_distance`) —
    an independently-derived second opinion on the merge-walk counting.
    Arguments keep the reference's (sketch2, sketch1) order; sketch1 is
    the query whose length sets sketch_size."""
    i = j = 0
    common = 0
    total = 0
    sketch_size = len(sketch1)
    while total < sketch_size and i < len(sketch1) and j < len(sketch2):
        if sketch1[i] < sketch2[j]:
            i += 1
        elif sketch2[j] < sketch1[i]:
            j += 1
        else:
            i += 1
            j += 1
            common += 1
        total += 1
    if total < sketch_size:
        if i < len(sketch1):
            total += len(sketch1) - 1
        if j < len(sketch2):
            total += len(sketch2) - 1
        total = min(total, sketch_size)
    containment = common / i if i else float("nan")
    jaccard = common / total if total else float("nan")
    return containment, jaccard, common, total


def test_mash_paper_distance_pins():
    """distance.rs:285-310 `test_mash_compatibility` assertions."""
    cont, _jac, _com, _total = _mash_paper_distance([0, 1, 2], [1, 2])
    assert cont == 2.0 / 2.0
    _cont, jac, com, total = _mash_paper_distance([0, 1], [2, 3])
    assert jac == 0.0
    assert com == 0
    assert total == 2


def test_distance_vs_mash_paper_oracle_property():
    """Property-test distance() against the Mash-paper oracle on random
    sketch pairs (incl. scaled-style truncation).

    The two formulas differ only in WHERE the merge walk stops (Mash caps
    at sketch_size union positions; finch runs to one side's exhaustion,
    distance.rs:82-115) and in the containment denominator. Invariants
    that must hold on every pair:
      * common_mash <= common_finch (a capped walk can only see fewer)
      * when the full union fits the cap (i + j - common <= sketch_size
        at finch's stop point and neither list is the capped remainder),
        both walks see the same prefix -> common and the union-position
        count agree
      * identical lists -> (1, 1, n, n) from both
      * Mash's common equals an independent set-based derivation: shared
        positions among the first sketch_size rows of the sorted union
        walk (computed with numpy set ops, no pointer walk).
    """
    rng = random.Random(7)
    for trial in range(300):
        n1 = rng.randint(1, 24)
        n2 = rng.randint(1, 24)
        universe = range(60)
        q = sorted(rng.sample(universe, n1))
        r = sorted(rng.sample(universe, n2))

        cont_m, jac_m, com_m, tot_m = _mash_paper_distance(r, q)
        cont_f, jac_f, com_f, tot_f = raw(q, r)

        assert com_m <= com_f

        # independent set-based derivation of Mash's walk: rank union
        # members by value; the walk consumes one union member per step
        # (a common hash is one step), so the first sketch_size steps
        # cover the sketch_size smallest union values
        union = np.union1d(np.array(q, np.uint64), np.array(r, np.uint64))
        walk = union[: min(len(q), tot_m if tot_m else 0) or None]
        cap = union[:tot_m]
        set_common = len(np.intersect1d(
            cap, np.intersect1d(np.array(q, np.uint64),
                                np.array(r, np.uint64))))
        # the cap can split a (i-advance, j-advance) pair mid-step only
        # for non-common values, so common among the first tot_m union
        # values == the walk's common
        assert com_m == set_common, (trial, q, r)

        # full-union agreement regime
        i_f = j_f = c_f = 0
        while i_f < len(q) and j_f < len(r):
            if q[i_f] < r[j_f]:
                i_f += 1
            elif q[i_f] > r[j_f]:
                j_f += 1
            else:
                i_f += 1
                j_f += 1
                c_f += 1
        if i_f + j_f - c_f <= len(q):
            assert com_m == com_f

    # identical lists (incl. through the Sketch-level distance())
    p = SketchParams.mash(kmers_to_sketch=5, final_size=5, kmer_length=2)
    hs = [3, 7, 11, 19, 23]
    cont_m, jac_m, com_m, tot_m = _mash_paper_distance(hs, hs)
    assert (cont_m, jac_m, com_m, tot_m) == (1.0, 1.0, 5, 5)
    d = distance(_mk_sketch("a", hs, p), _mk_sketch("b", hs, p))
    assert (d.containment, d.jaccard, d.common_hashes) == (1.0, 1.0, 5)


def test_mash_paper_oracle_scaled_bounds():
    """Scaled sketches: apply the oracle to the <=max_hash prefixes (what
    raw_distance's scaled-tail rule reduces the lists to,
    distance.rs:99-115) — the two walks must then agree exactly whenever
    the truncated union fits the cap."""
    rng = random.Random(11)
    max_hash = 40
    for _ in range(200):
        q = sorted(rng.sample(range(100), rng.randint(1, 30)))
        r = sorted(rng.sample(range(100), rng.randint(1, 30)))
        qt = [h for h in q if h <= max_hash]
        rt = [h for h in r if h <= max_hash]
        if not qt or not rt:
            continue
        _, _, com_m, _ = _mash_paper_distance(rt, qt)
        # scale that yields max_hash = 40: scale_recip_max_hash uses
        # u64::MAX / (1/scale); pick scale = 41 / 2**64 -> max_hash 40
        cont_f, jac_f, com_f, tot_f = raw(q, r, 41 / 2 ** 64)
        # finch's merge loop runs over the FULL lists to one side's
        # exhaustion and therefore counts every shared value, including
        # those above max_hash (the scaled-tail rule only adjusts the
        # total, distance.rs:99-115); the Mash walk over the truncated
        # lists can only see shared values <= max_hash
        shared_t = len(set(qt) & set(rt))
        assert com_m <= com_f
        union_t = sorted(set(qt) | set(rt))
        if len(union_t) <= len(qt):
            # the capped walk covers the whole truncated union
            assert com_m == shared_t
