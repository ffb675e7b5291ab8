"""Native parser conformance: canonical k-mer enumeration, raw lengths,
format detection, gz, FASTQ."""

import gzip

import numpy as np
import pytest

from finch_tpu.models import oracle
from finch_tpu.native import (FORMAT_FASTA, FORMAT_FASTQ, KmerReader,
                              NativeError, unpack_kmers)


def read_all(source, k=21, canonical=True, batch_size=1 << 16):
    r = KmerReader(source, k=k, canonical=canonical, batch_size=batch_size)
    packed, rc = [], []
    for pk, flags in r:
        packed.append(pk)
        rc.append(flags)
    packed = np.concatenate(packed) if packed else np.empty(0, np.uint64)
    rc = np.concatenate(rc) if rc else np.empty(0, np.uint8)
    return r, packed, rc


def oracle_kmers(records, k):
    out = []
    for raw in records:
        for kmer, is_rc in oracle.canonical_kmers(oracle.normalize(raw), k):
            out.append((kmer, is_rc))
    return out


def check(source, records, k=21):
    r, packed, rc = read_all(source, k=k)
    exp = oracle_kmers(records, k)
    assert len(packed) == len(exp)
    got = unpack_kmers(packed, k)
    for i, (kmer, is_rc) in enumerate(exp):
        assert bytes(got[i]) == kmer
        assert bool(rc[i]) == is_rc
    return r


def test_query_fa(query_fa_path):
    recs = []
    cur = None
    for line in open(query_fa_path, "rb"):
        if line.startswith(b">"):
            cur = bytearray()
            recs.append(cur)
        else:
            cur += line
    raws = [bytes(x[:-1]) if x.endswith(b"\n") else bytes(x) for x in recs]
    r = check(query_fa_path, raws)
    bases, kmers, n = r.totals
    assert (bases, kmers, n) == (405, 339, 3)
    assert r.format == FORMAT_FASTA


def test_small_batches_resume(query_fa_path):
    _, packed1, rc1 = read_all(query_fa_path, batch_size=7)
    _, packed2, rc2 = read_all(query_fa_path, batch_size=1 << 16)
    np.testing.assert_array_equal(packed1, packed2)
    np.testing.assert_array_equal(rc1, rc2)


def test_fastq_and_gz():
    fq = b"@r1\nACGTACGTNACGT\n+\nIIIIIIIIIIIII\n@r2\nacgtacgtacgt\n+\nJJJJJJJJJJJJ\n"
    r = check(fq, [b"ACGTACGTNACGT", b"acgtacgtacgt"], k=4)
    assert r.format == FORMAT_FASTQ
    assert r.totals[0] == 13 + 12
    r2 = check(gzip.compress(fq), [b"ACGTACGTNACGT", b"acgtacgtacgt"], k=4)
    assert r2.totals == r.totals


def test_lowercase_u_and_invalid():
    fa = b">x\nacGuUtNRYacgt-acg.t\n"
    # normalize: acGuUt -> ACGTTT; N,R,Y -> N; '-'/'.' break windows
    check(fa, [b"acGuUtNRYacgt-acg.t"], k=3)


def test_multiline_kmers_span_lines():
    fa = b">x\nACGTA\nCGT\n>y\nTTTT\n"
    r = check(fa, [b"ACGTA\nCGT", b"TTTT"], k=6)
    # seq_length counts raw bytes incl. internal newline, minus trailing
    assert r.totals[0] == 9 + 4
    assert r.totals[2] == 2


def test_missing_file():
    with pytest.raises(NativeError, match="No such file"):
        KmerReader("/does/not/exist.fa", k=21)


def test_empty_input_errors():
    r = KmerReader(b"", k=21)
    with pytest.raises(NativeError):
        list(r)


def test_bad_format_errors():
    r = KmerReader(b"not a fasta", k=21)
    with pytest.raises(NativeError):
        list(r)


def test_noncanonical_bit_kmers():
    fa = b">x\nACGTNAC\n"
    r, packed, rc = read_all(fa, k=2, canonical=False)
    got = [bytes(row) for row in unpack_kmers(packed, 2)]
    assert got == [b"AC", b"CG", b"GT", b"AC"]
    assert not rc.any()


def test_parser_fuzz_no_crash():
    """Random byte soup must parse or raise cleanly — never crash the C++
    layer (memory safety stands in for Rust's, paper.md:28)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from finch_tpu.native import KmerReader, NativeError

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=400))
    def run(data):
        try:
            total = 0
            for packed, rc in KmerReader(data, k=21, batch_size=256):
                assert len(packed) == len(rc)
                total += len(packed)
                assert np.all(packed < np.uint64(4 ** 21))
        except NativeError:
            pass

    run()


def test_parser_fuzz_wellformed_fasta_totals():
    """Random well-formed FASTA: totals must be consistent with content."""
    from hypothesis import given, settings, strategies as st

    from finch_tpu.native import KmerReader

    rec = st.tuples(
        st.just("r"),
        st.text(alphabet="ACGTN", min_size=0, max_size=120))

    @settings(max_examples=100, deadline=None)
    @given(st.lists(rec, min_size=1, max_size=5))
    def run(recs):
        data = b"".join(
            b">" + n.encode() + b"\n" + s.encode() + b"\n" for n, s in recs)
        reader = KmerReader(data, k=5, batch_size=64)
        total = sum(len(p) for p, _ in reader)
        bases, kmers, records = reader.totals
        # expected kmers: per record, windows of 5 with no N
        exp = 0
        for _, s in recs:
            for run_ in s.split("N"):
                exp += max(0, len(run_) - 4)
        assert kmers == exp == total
        assert records == len(recs)
        assert bases == sum(len(s) for _, s in recs)
        reader.close()

    run()


def test_parallel_reader_matches_serial():
    """ParallelKmerReader's stream and totals are identical to the serial
    reader for FASTA and FASTQ, at any thread count."""
    import numpy as np

    from finch_tpu.native import KmerReader, ParallelKmerReader

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    # FASTQ: many records
    parts = []
    for i in range(2000):
        L = int(rng.integers(30, 90))
        seq = bases[rng.integers(0, 4, size=L)].tobytes()
        parts.append(b"@r%d\n" % i + seq + b"\n+\n" + b"F" * L + b"\n")
    fq = b"".join(parts)
    # FASTA: multi-line records with Ns
    parts = [b">c%d\nACGTN" % i
             + bases[rng.integers(0, 4, size=200)].tobytes() + b"\nACGT\n"
             for i in range(500)]
    fa = b"".join(parts)

    for data in (fq, fa):
        serial = KmerReader(data, k=21, batch_size=777)
        s_pk = np.concatenate([p for p, _ in serial] or [np.empty(0)])
        s_totals = serial.totals
        for threads in (2, 5):
            par = ParallelKmerReader(data, k=21, batch_size=777,
                                     threads=threads)
            p_pk = np.concatenate([p for p, _ in par] or [np.empty(0)])
            assert np.array_equal(s_pk, p_pk)
            assert par.totals == s_totals


def test_parallel_reader_gz():
    """Gzipped inputs decompress once and split identically."""
    import gzip

    import numpy as np

    from finch_tpu.native import KmerReader, ParallelKmerReader

    rng = np.random.default_rng(8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    parts = [b">c%d\n" % i + bases[rng.integers(0, 4, size=500)].tobytes()
             + b"\n" for i in range(300)]
    fa = b"".join(parts)
    gz = gzip.compress(fa)
    serial = KmerReader(fa, k=21, batch_size=999)
    s_pk = np.concatenate([p for p, _ in serial])
    par = ParallelKmerReader(gz, k=21, batch_size=999, threads=3)
    p_pk = np.concatenate([p for p, _ in par])
    assert np.array_equal(s_pk, p_pk)
    assert par.totals == serial.totals
