"""Wide k-mer sketching (32 <= k <= 63) — VERDICT r2 missing #1.

The reference hashes the ASCII bytes of canonical k-mers with no upper
bound on k (hashing.rs:9-12; needletail canonical_kmers works on byte
slices of any k, mash.rs:73-79). These tests pin `finch sketch -k 51`
(mash + scaled) against the heap-faithful streaming oracle on both fixture
files and both backends, plus boundary k values and golden hashes.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from finch_tpu import FilterParams, SketchParams
from finch_tpu.core.sketching import sketch_bytes
from finch_tpu.models.oracle import (OracleMashSketcher,
                                     OracleScaledSketcher)

QUERY_FA = "tests/data/query.fa"
READS_FQ = "tests/data/reads.fastq"


def _records(path):
    """Raw sequence regions, as the reference's record loop sees them
    (FASTA: includes internal newlines; FASTQ: the sequence line)."""
    data = open(path, "rb").read()
    if data.startswith(b">"):
        recs = []
        for block in data.split(b">")[1:]:
            _header, _, seq = block.partition(b"\n")
            recs.append(seq.rstrip(b"\n"))
        return recs
    lines = data.split(b"\n")
    return [lines[i + 1] for i in range(0, len(lines) - 3, 4)]


def _oracle_vec(path, k, scheme, size=16, scale=0.01):
    if scheme == "mash":
        orc = OracleMashSketcher(size, k, 0)
    else:
        orc = OracleScaledSketcher(size, scale, k, 0)
    for rec in _records(path):
        orc.process(rec)
    return [(h, km, c, e) for (h, km, c, e) in orc.to_vec()]


@pytest.mark.parametrize("path", [QUERY_FA, READS_FQ])
@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
def test_wide_mash_k51_matches_oracle(path, backend):
    params = SketchParams.mash(kmers_to_sketch=16, final_size=16,
                               kmer_length=51, no_strict=True)
    s = sketch_bytes(open(path, "rb").read(), "t", params,
                     FilterParams(filter_on=False), backend=backend)
    got = [(k.hash, k.kmer, k.count, k.extra_count) for k in s.hashes]
    assert got == _oracle_vec(path, 51, "mash")[:16]


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_wide_scaled_k51_matches_oracle(backend):
    params = SketchParams.scaled(kmers_to_sketch=8, scale=0.05,
                                 kmer_length=51)
    s = sketch_bytes(open(QUERY_FA, "rb").read(), "t", params,
                     FilterParams(filter_on=False), backend=backend)
    got = [(k.hash, k.kmer, k.count, k.extra_count) for k in s.hashes]
    exp = _oracle_vec(QUERY_FA, 51, "scaled", size=8, scale=0.05)
    # scaled retention: all <= max_hash topped up to size
    mh = params.max_hash()
    below = sum(1 for h, *_ in exp if h <= mh)
    exp = exp[: below + max(0, 8 - below)]
    assert got == exp


@pytest.mark.parametrize("k", [32, 33, 47, 63])
def test_wide_boundary_k_matches_oracle(k):
    params = SketchParams.mash(kmers_to_sketch=12, final_size=12,
                               kmer_length=k, no_strict=True)
    s = sketch_bytes(open(QUERY_FA, "rb").read(), "t", params,
                     FilterParams(filter_on=False), backend="numpy")
    got = [(kc.hash, kc.kmer, kc.count, kc.extra_count) for kc in s.hashes]
    assert got == _oracle_vec(QUERY_FA, k, "mash", size=12)[:12]
    assert all(len(kc.kmer) == k for kc in s.hashes)


def test_wide_k51_golden_pinned():
    """Frozen first-hashes golden for k=51 on query.fa (both backends)."""
    params = SketchParams.mash(kmers_to_sketch=4, final_size=4,
                               no_strict=True, kmer_length=51)
    for backend in ("numpy", "jax"):
        s = sketch_bytes(open(QUERY_FA, "rb").read(), "t", params,
                         FilterParams(filter_on=False), backend=backend)
        got = [(k.hash, k.kmer) for k in s.hashes]
        exp_first = (35002788879755192,
                     b"CTACAGCTAGCTAGCTAGCATCGCTAGCTACGATCGATCGACTAGCATGAC")
        assert got[0] == exp_first, backend
        assert [h for h, _ in got] == sorted(h for h, _ in got)
        # cross-check every retained kmer's hash with the byte oracle
        from finch_tpu.native import murmur3_x64_128

        for h, km in got:
            assert murmur3_x64_128(km, 0)[0] == h


def test_k_64_routes_to_xwide():
    # k >= 64 is no longer rejected: it routes to the xwide byte-window
    # path (tests/test_xwide.py pins its semantics)
    params = SketchParams.mash(kmers_to_sketch=4, final_size=4,
                               no_strict=True, kmer_length=64)
    s = sketch_bytes(b">r\n" + b"ACGT" * 40 + b"\n", "t", params,
                     FilterParams(filter_on=False), backend="numpy")
    # the period-4 repeat has exactly 3 distinct canonical 64-mers
    assert len(s.hashes) == 3 and len(s.hashes[0].kmer) == 64
    assert sum(kc.count for kc in s.hashes) == s.num_valid_kmers == 97


def test_wide_cli_sketch_and_dist(tmp_path):
    """CLI end-to-end: finch sketch -k 51 writes a valid .sk; dist of the
    file against itself is 0."""
    env_cmd = [sys.executable, "-m", "finch_tpu.cli"]
    out = subprocess.run(
        env_cmd + ["sketch", "-k", "51", "--n-hashes", "10", "-N", "-O",
                   "--backend", "numpy", QUERY_FA],
        capture_output=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    doc = json.loads(out.stdout)
    assert doc["kmer"] == 51
    assert len(doc["sketches"][0]["kmers"][0]) == 51
    # round-trip through the .sk reader + dist
    skp = tmp_path / "q51.sk"
    skp.write_bytes(out.stdout)
    out2 = subprocess.run(
        env_cmd + ["dist", "-p", str(skp), str(skp)],
        capture_output=True, cwd="/root/repo")
    assert out2.returncode == 0, out2.stderr
    assert json.loads(out2.stdout) == []  # self-pairs skipped


def test_wide_reader_roundtrip_unpack():
    """Parser two-word codes decode back to the exact window bytes."""
    from finch_tpu.native import KmerReader, unpack_kmers_w

    fa = b">r\n" + b"ACGTTGCAGTACGTACCGGTTAACGTACGATCGATCCGTACGTAACGTAC" * 3 \
        + b"\n"
    k = 51
    reader = KmerReader(fa, k=k, canonical=False, batch_size=1024)
    [(pk, _rc)] = list(reader)
    plo, phi = pk
    seq = fa.split(b"\n")[1]
    kmers = unpack_kmers_w(plo, phi, k)
    exp = [seq[i:i + k] for i in range(len(seq) - k + 1)]
    assert [bytes(r) for r in kmers] == exp
    bases, nkmers, nrecs = reader.totals
    assert (bases, nkmers, nrecs) == (len(seq), len(exp), 1)
