"""Sketcher semantics: golden k-mer lists + unit pins from the reference's
in-module tests + batch-vs-streaming property checks."""

import random

import numpy as np
import pytest

from finch_tpu import FilterParams, SketchParams, sketch_files
from finch_tpu.core.sketching import sketch_bytes
from finch_tpu.models.oracle import (OracleMashSketcher, OracleScaledSketcher,
                                     hash_f)

GOLDEN_KMERS = [
    "ATGCTAGCTACGTAACGTCGC", "CAGTCGATCGATCGTAGCTGA",
    "CTCAGATGCTGAGCCGGTCTA", "GCTAGCTAGCATCGCTAGCTA",
    "GACTAGCTAGCTAGCTAGCGA", "CGCTAGCTACGATCGATCGAC",
    "TAATTTATACGGGCCTATTAA", "GCATCAGCTAGCATCGCTGTA",
    "AGCCGGTCTACTACTACACAT", "AAGGCCTAACTTAATAGGCCC",
]


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
def test_golden_mash(query_fa_path, backend):
    """cli/tests/test_cli.rs:117-149 (finch_sketch_mash golden kmers)."""
    params = SketchParams.mash(kmers_to_sketch=10, final_size=10,
                               kmer_length=21, hash_seed=0)
    s = sketch_files([query_fa_path], params,
                     FilterParams(filter_on=None, err_filter=0.21,
                                  strand_filter=0.1),
                     backend=backend, batch_size=128)[0]
    assert [kc.kmer.decode() for kc in s.hashes] == GOLDEN_KMERS
    assert s.seq_length == 405
    assert s.num_valid_kmers == 339


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
def test_golden_scaled(query_fa_path, backend):
    """cli/tests/test_cli.rs:81-114 (finch_sketch_scaled golden kmers)."""
    params = SketchParams.scaled(kmers_to_sketch=10, kmer_length=21,
                                 scale=0.001, hash_seed=0)
    s = sketch_files([query_fa_path], params,
                     FilterParams(filter_on=None, err_filter=0.21,
                                  strand_filter=0.1), backend=backend)[0]
    assert [kc.kmer.decode() for kc in s.hashes] == GOLDEN_KMERS


def _push_kmers(sketcher, kmer_flags):
    for kmer, flag in kmer_flags:
        sketcher.push(kmer, flag)


def test_oracle_minhash_pins():
    """mash.rs:115-134 test_minhashkmers."""
    q = OracleMashSketcher(3, 2, 42)
    _push_kmers(q, [(b"ca", 0), (b"cc", 1), (b"ac", 0), (b"ac", 1)])
    arr = q.to_vec()
    assert [a[1] for a in arr] == [b"cc", b"ca", b"ac"]
    assert [(a[2], a[3]) for a in arr] == [(1, 1), (1, 0), (2, 1)]
    assert arr[0][0] < arr[1][0] < arr[2][0]


def test_oracle_scaled_pins():
    """scaled.rs:118-200 unit tests."""
    for scale in (1.0, 0.001):
        q = OracleScaledSketcher(3, scale, 2, 42)
        _push_kmers(q, [(b"ca", 0), (b"cc", 1), (b"ac", 0), (b"ac", 1)])
        arr = q.to_vec()
        assert [a[1] for a in arr] == [b"cc", b"ca", b"ac"]
        assert [(a[2], a[3]) for a in arr] == [(1, 1), (1, 0), (2, 1)]

    q = OracleScaledSketcher(1, 0.01, 4, 42)
    _push_kmers(q, [(b"AAAA", 0), (b"AGTA", 0), (b"CCCC", 1), (b"ATAA", 0)])
    arr = q.to_vec()
    assert len(arr) == 3
    assert all(a[1] != b"AAAA" for a in arr)

    q = OracleScaledSketcher(0, 0.001, 2, 42)
    _push_kmers(q, [(b"ca", 0), (b"cc", 1), (b"ac", 0), (b"ac", 1)])
    assert q.to_vec() == []


def test_scaled_invariant_pure():
    """scaled.rs:202-213 proptest: size=0 keeps only hashes <= max_hash."""
    random.seed(1)
    seq = "".join(random.choice("ACGT") for _ in range(600)).encode()
    q = OracleScaledSketcher(0, 1.0 / 100.0, 2, 42)
    for i in range(len(seq) - 3):
        q.push(seq[i : i + 4], 0)
    max_hash = ((1 << 64) - 1) // 100
    assert all(a[0] <= max_hash for a in q.to_vec())


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
@pytest.mark.parametrize("scheme", ["mash", "scaled"])
def test_batch_equals_streaming_property(backend, scheme):
    """Batched engines are hash/count/extra-identical to the streaming heap."""
    random.seed(12345)
    for trial in range(6):
        nrec = random.randint(1, 6)
        seqs = [
            "".join(random.choice("ACGTNacgtu")
                    for _ in range(random.randint(20, 500)))
            for _ in range(nrec)
        ]
        fa = "".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)).encode()
        k = random.choice([3, 5, 11, 21])
        if scheme == "mash":
            size = random.choice([1, 7, 50])
            params = SketchParams.mash(kmers_to_sketch=size, final_size=size,
                                       no_strict=True, kmer_length=k)
            o = OracleMashSketcher(size, k, 0)
        else:
            size = random.choice([0, 3, 20])
            scale = random.choice([0.5, 0.01, 0.001])
            params = SketchParams.scaled(kmers_to_sketch=size, kmer_length=k,
                                         scale=scale)
            o = OracleScaledSketcher(size, scale, k, 0)
        for s in seqs:
            o.process(s.encode())
        expected = o.to_vec()
        got = sketch_bytes(fa, "t", params, FilterParams(filter_on=False),
                           backend=backend)
        got_t = [(kc.hash, kc.kmer, kc.count, kc.extra_count)
                 for kc in got.hashes]
        assert got_t == expected
        assert got.num_valid_kmers == o.total_kmers
        assert got.seq_length == o.total_bases


def test_strict_mode_raises(query_fa_path):
    """mod.rs:115-128: fewer kmers than final_size errors unless no_strict."""
    params = SketchParams.mash(kmers_to_sketch=1000, final_size=1000,
                               kmer_length=21)
    with pytest.raises(ValueError, match="too few kmers"):
        sketch_files([query_fa_path], params, FilterParams(filter_on=False))
    params = params.replace(no_strict=True)
    s = sketch_files([query_fa_path], params, FilterParams(filter_on=False))[0]
    # all distinct canonical 21-mers survive (fewer than final_size)
    from finch_tpu.models.oracle import canonical_kmers, normalize
    recs = []
    cur = None
    for line in open(query_fa_path, "rb"):
        if line.startswith(b">"):
            cur = bytearray()
            recs.append(cur)
        else:
            cur += line
    distinct = set()
    for raw in recs:
        for kmer, _ in canonical_kmers(normalize(bytes(raw)), 21):
            distinct.add(kmer)
    assert len(s.hashes) == len(distinct)


def test_allcounts_scheme():
    """counts.rs semantics: forward bit-kmers, RC folding, zero seq_length."""
    fa = b">x\nACGTAC\n"
    params = SketchParams.all_counts(kmer_length=2)
    s = sketch_bytes(fa, "t", params, FilterParams(filter_on=False))
    # forward 2-mers: AC CG GT TA AC ; table: AC:2 CG:1 GT:1 TA:1
    # to_vec walks indices ascending: AC(1) folds rc GT(11): count 3, extra 1
    # CG(6) folds rc CG (palindrome): count 2, extra 1
    # TA(12) folds rc TA (palindrome): count 2, extra 1
    by_kmer = {kc.kmer: kc for kc in s.hashes}
    assert set(by_kmer) == {b"AC", b"CG", b"TA"}
    assert (by_kmer[b"AC"].count, by_kmer[b"AC"].extra_count) == (3, 1)
    assert (by_kmer[b"CG"].count, by_kmer[b"CG"].extra_count) == (2, 1)
    assert (by_kmer[b"TA"].count, by_kmer[b"TA"].extra_count) == (2, 1)
    assert s.seq_length == 0
    assert s.num_valid_kmers == 5


def test_hybrid_engine_matches_numpy():
    """HybridEngine migrates host state to the device engine mid-stream and
    stays bit-identical (engine.py HybridEngine)."""
    import numpy as np

    from finch_tpu.models.engine import HybridEngine, NumpyEngine
    from finch_tpu.models.params import SketchParams

    rng = np.random.default_rng(7)
    batches = [
        (rng.integers(0, 4 ** 21, size=n, dtype=np.uint64),
         rng.integers(0, 2, size=n, dtype=np.uint8))
        for n in (1500, 2000, 3000, 1000)
    ]
    for params in (SketchParams.mash(kmers_to_sketch=64, final_size=64),
                   SketchParams.scaled(scale=0.01, kmers_to_sketch=16)):
        ref = NumpyEngine(params)
        hyb = HybridEngine(params, switch_after=2048)  # migrate mid-stream
        for pk, rc in batches:
            ref.update(pk, rc)
            hyb.update(pk, rc)
        assert hyb._dev is not None, "migration did not happen"
        a = [(k.hash, k.kmer, k.count, k.extra_count) for k in ref.finalize()]
        b = [(k.hash, k.kmer, k.count, k.extra_count) for k in hyb.finalize()]
        assert a == b


def test_spill_flush_boundary_and_duplicates():
    """JaxEngine crosses spill-flush boundaries and digests duplicate-heavy
    batches exactly (ops/bottomk.py spill machinery)."""
    import numpy as np

    from finch_tpu.models.engine import JaxEngine, NumpyEngine
    from finch_tpu.models.params import SketchParams

    params = SketchParams.mash(kmers_to_sketch=32, final_size=32)
    ref = NumpyEngine(params)
    jx = JaxEngine(params, batch_size=4096)
    # tiny capacity -> tiny spill; many batches force repeated flushes
    rng = np.random.default_rng(5)
    for i in range(20):
        if i % 3 == 2:  # duplicate-heavy batch (poly-run analog)
            pk = np.full(3000, rng.integers(0, 4 ** 21), dtype=np.uint64)
            rc = np.zeros(3000, dtype=np.uint8)
        else:
            pk = rng.integers(0, 4 ** 21, size=3000, dtype=np.uint64)
            rc = rng.integers(0, 2, size=3000, dtype=np.uint8)
        ref.update(pk, rc)
        jx.update(pk, rc)
    a = [(x.hash, x.count, x.extra_count) for x in ref.finalize()]
    b = [(x.hash, x.count, x.extra_count) for x in jx.finalize()]
    assert a == b


def test_scaled_below_bound_grow():
    """Scaled capacity growth with the spill-occupancy upper bound stays
    exact across many growth events."""
    import numpy as np

    from finch_tpu.models.engine import JaxEngine, NumpyEngine
    from finch_tpu.models.params import SketchParams

    # scale admitting ~25% of hashes forces repeated growth
    params = SketchParams.scaled(scale=0.25, kmers_to_sketch=8)
    ref = NumpyEngine(params)
    jx = JaxEngine(params, batch_size=4096)
    rng = np.random.default_rng(9)
    for _ in range(6):
        pk = rng.integers(0, 4 ** 21, size=5000, dtype=np.uint64)
        rc = rng.integers(0, 2, size=5000, dtype=np.uint8)
        ref.update(pk, rc)
        jx.update(pk, rc)
    a = [(x.hash, x.count, x.extra_count) for x in ref.finalize()]
    b = [(x.hash, x.count, x.extra_count) for x in jx.finalize()]
    assert a == b


def test_native_fold_equals_numpy_property():
    """NativeEngine (C++ fold) is bit-identical to NumpyEngine across
    random streams, duplicate bursts, and both schemes — including the
    adaptive-threshold compaction path (small sizes force many
    compactions)."""
    from finch_tpu.models.engine import NativeEngine, NumpyEngine

    rng = np.random.default_rng(77)
    for scheme, size, scale in [("mash", 16, None), ("mash", 500, None),
                                ("scaled", 8, 0.01), ("scaled", 0, 0.05)]:
        if scheme == "mash":
            params = SketchParams.mash(kmers_to_sketch=size,
                                       final_size=max(size, 1),
                                       no_strict=True)
        else:
            params = SketchParams.scaled(kmers_to_sketch=size, scale=scale)
        ne, npy = NativeEngine(params), NumpyEngine(params)
        for _ in range(6):
            n = int(rng.integers(1, 4000))
            pk = rng.integers(0, 1 << 42, size=n, dtype=np.uint64)
            # duplicate bursts: repeat a slice
            if n > 10:
                pk[: n // 3] = pk[n // 3: 2 * (n // 3)]
            rc = rng.integers(0, 2, size=n, dtype=np.uint8)
            ne.update(pk, rc)
            npy.update(pk, rc)
        a = ne.finalize_arrays()
        b = npy.finalize_arrays()
        for x, y in zip(a, b):
            assert np.array_equal(x, y), (scheme, size)


def test_array_filter_path_equals_object_path():
    """filter_counts_arrays + array process_post_filter produce the same
    final sketch as the KmerCount-object pipeline."""
    from finch_tpu.core.sketch import KmerCount
    from finch_tpu.models.engine import kmercounts_from_arrays

    rng = np.random.default_rng(99)
    n = 5000
    h = np.sort(rng.choice(1 << 50, size=n, replace=False).astype(np.uint64))
    c = rng.integers(1, 40, size=n, dtype=np.uint32)
    e = (c * rng.random(n)).astype(np.uint32)
    pk = rng.integers(0, 1 << 42, size=n, dtype=np.uint64)
    params = SketchParams.mash(kmers_to_sketch=n, final_size=800,
                               no_strict=True)

    fp1 = FilterParams(filter_on=True, err_filter=0.21, strand_filter=0.1)
    arrays = fp1.filter_counts_arrays(h, c, e, pk)
    arrays = params.process_post_filter(arrays, "x")
    got = kmercounts_from_arrays(params, *arrays)

    objs = kmercounts_from_arrays(params, h, c, e, pk)
    fp2 = FilterParams(filter_on=True, err_filter=0.21, strand_filter=0.1)
    want = params.process_post_filter(fp2.filter_counts(objs), "x")
    assert got == want
    assert fp1.abun_filter == fp2.abun_filter


def test_allcounts_sparse_matches_dense():
    """The k>15 sparse counts path must produce exactly what the dense
    4^k table produces (cross-checked at a k where both run)."""
    from finch_tpu.models.allcounts import AllCountsEngine

    rng = np.random.default_rng(21)
    k = 8
    params = SketchParams.all_counts(kmer_length=k)
    dense = AllCountsEngine(params)
    sparse = AllCountsEngine(params)
    sparse.counts = None
    from finch_tpu.native import NativeFold

    sparse._fold = NativeFold(2, k, 0, 0, 0)
    for _ in range(4):
        pk = rng.integers(0, 4 ** k, size=3000, dtype=np.uint64)
        z = np.zeros(len(pk), dtype=np.uint8)
        dense.update(pk, z)
        sparse.update(pk, z)
    d = [(x.hash, x.kmer, x.count, x.extra_count) for x in dense.finalize()]
    s = [(x.hash, x.kmer, x.count, x.extra_count) for x in sparse.finalize()]
    assert d == s
    assert dense.num_valid_kmers() == sparse.num_valid_kmers()


def test_allcounts_large_k_end_to_end():
    """sketch-type none with k=21 (reference would need a 4^21 table,
    ~17 TB; counts.rs:14-21): the sparse path handles it."""
    from finch_tpu import FilterParams, SketchParams
    from finch_tpu.core.sketching import sketch_bytes

    fa = b">r\nACGTACGTTGCAACGTACGTACGTTGCAACGGATCCAGTCAGTACAGT\n"
    params = SketchParams.all_counts(kmer_length=21)
    s = sketch_bytes(fa, "x", params, FilterParams(filter_on=False))
    assert len(s.hashes) > 0
    assert s.seq_length == 0          # counts.rs:8: never updated
    # forward-strand k-mer of the record must appear with its packed code
    kmers = {kc.kmer for kc in s.hashes}
    assert b"ACGTACGTTGCAACGTACGTA" in kmers or len(kmers) >= 20


def test_fused_pipeline_matches_numpy_all_sources(tmp_path):
    """The fused C++ parse+fold path (backend native, path sources) is
    bit-identical to the NumpyEngine across formats, compression, many
    small chunks, and both schemes."""
    import gzip
    import os

    from finch_tpu.core.sketching import sketch_stream

    rng = np.random.default_rng(33)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []
    for i in range(3000):
        seq = bases[rng.integers(0, 4, size=120)].tobytes()
        reads.append(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * 120))
    fq = b"".join(reads)
    p_fq = tmp_path / "r.fastq"
    p_fq.write_bytes(fq)
    p_gz = tmp_path / "r.fastq.gz"
    p_gz.write_bytes(gzip.compress(fq))

    os.environ["FINCH_TPU_CHUNK"] = str(1 << 14)  # force many chunks
    try:
        for path in (p_fq, p_gz):
            for params in (
                    SketchParams.mash(kmers_to_sketch=500, final_size=100,
                                      no_strict=True),
                    SketchParams.scaled(kmers_to_sketch=20, scale=0.001),
            ):
                fused = sketch_stream(str(path), "x", params,
                                      FilterParams(filter_on=False),
                                      backend="native", parser_threads=4)
                ref = sketch_stream(str(path), "x", params,
                                    FilterParams(filter_on=False),
                                    backend="numpy", parser_threads=1)
                assert [(k.hash, k.kmer, k.count, k.extra_count)
                        for k in fused.hashes] == \
                       [(k.hash, k.kmer, k.count, k.extra_count)
                        for k in ref.hashes], (path, params.sketch_type)
                assert fused.seq_length == ref.seq_length
                assert fused.num_valid_kmers == ref.num_valid_kmers
    finally:
        del os.environ["FINCH_TPU_CHUNK"]


def test_fused_pipeline_error_paths(tmp_path):
    import pytest

    from finch_tpu.core.sketching import sketch_stream
    from finch_tpu.errors import FinchError

    bad = tmp_path / "bad.fastq"
    bad.write_bytes(b"@r1\nACGT\n+\n")  # truncated record
    with pytest.raises(FinchError):
        sketch_stream(str(bad), "x",
                      SketchParams.mash(kmers_to_sketch=4, final_size=4,
                                        no_strict=True),
                      FilterParams(filter_on=False), backend="native")
    empty = tmp_path / "empty.fa"
    empty.write_bytes(b"")
    with pytest.raises(FinchError):
        sketch_stream(str(empty), "x",
                      SketchParams.mash(kmers_to_sketch=4, final_size=4,
                                        no_strict=True),
                      FilterParams(filter_on=False), backend="native")
