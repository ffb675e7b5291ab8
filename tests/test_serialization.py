"""Serialization round-trips: .sk JSON, .bsk, .msh."""

import json

import pytest

from finch_tpu import FilterParams, SketchParams, sketch_files
from finch_tpu.core.sketch import KmerCount, Sketch
from finch_tpu.serialization.finch_bsk import read_finch_file, write_finch_file
from finch_tpu.serialization.json_sk import (format_f64,
                                             multisketch_to_json_bytes,
                                             read_sk_file)
from finch_tpu.serialization.mash_msh import read_mash_file, write_mash_file


@pytest.fixture(scope="module")
def sketch10(query_fa_path):
    params = SketchParams.mash(kmers_to_sketch=10, final_size=10,
                               kmer_length=21, hash_seed=0)
    return sketch_files([query_fa_path], params,
                        FilterParams(filter_on=None, err_filter=0.21,
                                     strand_filter=0.1))[0]


def test_sk_json_shape(sketch10):
    """test_cli.rs:21-37 assertions + exact field order."""
    data = multisketch_to_json_bytes([sketch10])
    doc = json.loads(data)
    assert doc["kmer"] == 21
    assert doc["alphabet"] == "ACGT"
    assert doc["sketchSize"] == 10
    assert doc["hashSeed"] == 0
    assert list(doc.keys()) == [
        "kmer", "alphabet", "preserveCase", "canonical", "sketchSize",
        "hashType", "hashBits", "hashSeed", "scale", "sketches"]
    assert list(doc["sketches"][0].keys()) == [
        "name", "seqLength", "numValidKmers", "comment", "filters", "hashes",
        "kmers", "counts"]
    # hashes are decimal strings (json.rs:73)
    assert all(isinstance(h, str) for h in doc["sketches"][0]["hashes"])
    # compact (serde_json) formatting: no spaces
    assert b" " not in data.replace(b'"name":"', b"").split(b'"')[0]
    assert b": " not in data and b", " not in data


def test_sk_roundtrip(sketch10):
    data = multisketch_to_json_bytes([sketch10])
    back = read_sk_file(data)
    assert len(back) == 1
    b = back[0]
    assert [k.hash for k in b.hashes] == [k.hash for k in sketch10.hashes]
    assert [k.kmer for k in b.hashes] == [k.kmer for k in sketch10.hashes]
    assert [k.count for k in b.hashes] == [k.count for k in sketch10.hashes]
    # deserialize quirk: extra_count = count/2 (json.rs:126)
    assert all(k.extra_count == k.count // 2 for k in b.hashes)
    assert b.sketch_params.no_strict is True  # json mash params (json.rs:174)
    assert b.seq_length == sketch10.seq_length


def test_bsk_roundtrip(sketch10):
    """test_cli.rs:40-57 analog: full fidelity."""
    data = write_finch_file([sketch10])
    back = read_finch_file(data)
    assert len(back) == 1
    b = back[0]
    assert b.sketch_params.k == 21
    assert b.sketch_params.expected_size() == 10
    assert b.hashes == sketch10.hashes
    assert b.name == sketch10.name
    assert b.seq_length == sketch10.seq_length
    assert b.num_valid_kmers == sketch10.num_valid_kmers
    assert b.filter_params.filter_on == sketch10.filter_params.filter_on
    assert b.filter_params.err_filter == sketch10.filter_params.err_filter


def test_bsk_label_and_filters():
    fp = FilterParams(filter_on=True, abun_filter=(3, 77), err_filter=0.5,
                      strand_filter=0.25)
    s = Sketch(name="n", seq_length=5, num_valid_kmers=6, comment="c",
               hashes=[KmerCount(hash=1, kmer=b"AA", count=2, extra_count=1,
                                 label=b"lbl")],
               filter_params=fp,
               sketch_params=SketchParams.scaled(kmers_to_sketch=7,
                                                 kmer_length=2, scale=0.5,
                                                 hash_seed=9))
    back = read_finch_file(write_finch_file([s]))[0]
    assert back.hashes[0].label == b"lbl"
    assert back.filter_params.abun_filter == (3, 77)
    assert back.sketch_params.sketch_type == "scaled"
    assert back.sketch_params.scale == 0.5
    assert back.sketch_params.hash_seed == 9


def test_msh_roundtrip(sketch10):
    """test_cli.rs:60-78 analog + mash.rs quirks."""
    data = write_mash_file([sketch10])
    back = read_mash_file(data)
    assert len(back) == 1
    b = back[0]
    assert b.sketch_params.k == 21
    assert len(b.hashes) == 10
    assert [k.hash for k in b.hashes] == [k.hash for k in sketch10.hashes]
    # counts survive; extra_count becomes count/2; kmers are dropped
    assert [k.count for k in b.hashes] == [k.count for k in sketch10.hashes]
    assert all(k.extra_count == k.count // 2 for k in b.hashes)
    assert all(k.kmer == b"" for k in b.hashes)
    assert b.sketch_params.no_strict is True
    assert b.seq_length == sketch10.seq_length
    assert b.num_valid_kmers == sketch10.num_valid_kmers


def test_format_f64():
    assert format_f64(0.001) == "0.001"
    assert format_f64(1.0) == "1.0"
    assert format_f64(0.3333333333333333) == "0.3333333333333333"
    assert format_f64(1e-18) == "1e-18"
    assert format_f64(1e16) == "1e16"


def test_bsk_empty_label_and_missing_filterparams_quirks():
    """b'' labels round-trip as present-but-empty (mod.rs:178-182), and
    count saturation matches the sketcher's saturating u32 adds."""
    from finch_tpu.core.sketch import KmerCount, Sketch
    from finch_tpu.models.params import FilterParams, SketchParams
    from finch_tpu.serialization.finch_bsk import (read_finch_file,
                                                   write_finch_file)

    s = Sketch(
        name="x", seq_length=10, num_valid_kmers=5, comment="",
        hashes=[
            KmerCount(hash=1, kmer=b"A", count=2, extra_count=1, label=b""),
            KmerCount(hash=2, kmer=b"C", count=2 ** 40, extra_count=3,
                      label=None),
        ],
        filter_params=FilterParams(),
        sketch_params=SketchParams.mash(kmers_to_sketch=4, final_size=4),
    )
    [back] = read_finch_file(write_finch_file([s]))
    assert back.hashes[0].label == b""
    assert back.hashes[1].label is None
    assert back.hashes[1].count == 0xFFFFFFFF  # saturated, not crashed


def test_open_sketch_file_garbage_is_clean_error(tmp_path):
    """Corrupt/truncated sketch files raise clean errors, never crash
    (capnp_lite bounds checks, json errors)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from finch_tpu.serialization import open_sketch_file

    @settings(max_examples=150, deadline=None)
    @given(st.binary(min_size=0, max_size=200), st.sampled_from(
        [".sk", ".bsk", ".msh", ".json"]))
    def run(data, ext):
        p = tmp_path / ("f" + ext)
        p.write_bytes(data)
        try:
            open_sketch_file(str(p))
        except Exception as e:
            # any *clean* Python exception is fine; segfaults/aborts not
            assert isinstance(e, Exception)

    run()


def test_truncated_real_files_are_clean_errors(tmp_path):
    """Truncations of VALID files at every prefix length stay clean."""
    from finch_tpu.core.sketch import KmerCount, Sketch
    from finch_tpu.models.params import FilterParams, SketchParams
    from finch_tpu.serialization import open_sketch_file
    from finch_tpu.serialization.finch_bsk import write_finch_file
    from finch_tpu.serialization.mash_msh import write_mash_file

    s = Sketch(name="x", seq_length=5, num_valid_kmers=3, comment="",
               hashes=[KmerCount(hash=7, kmer=b"ACA", count=2,
                                 extra_count=1)],
               filter_params=FilterParams(),
               sketch_params=SketchParams.mash(kmers_to_sketch=4,
                                               final_size=4, kmer_length=3))
    for ext, data in ((".bsk", write_finch_file([s])),
                      (".msh", write_mash_file([s]))):
        for cut in range(0, len(data), 7):
            p = tmp_path / ("t" + ext)
            p.write_bytes(data[:cut])
            try:
                open_sketch_file(str(p))
            except Exception:
                pass  # clean error path


def test_lazy_sk_load_serves_arrays_without_materializing():
    """DB loads hand the distance paths SoA views without building
    KmerCount objects; element access materializes transparently with
    identical objects to the eager path."""
    import numpy as np

    from finch_tpu.core.sketch import KmerCount, LazyKmerCounts, Sketch
    from finch_tpu.models.params import FilterParams, SketchParams
    from finch_tpu.serialization.json_sk import (multisketch_to_json_bytes,
                                                 read_sk_file)

    rng = np.random.default_rng(3)
    params = SketchParams.mash(kmers_to_sketch=50, final_size=50,
                               no_strict=True)
    hs = np.sort(rng.choice(1 << 50, size=50, replace=False)
                 .astype(np.uint64))
    kcs = [KmerCount(hash=int(h), kmer=b"A" * 21, count=3, extra_count=1)
           for h in hs]
    src = Sketch(name="x", seq_length=1, num_valid_kmers=1, comment="",
                 hashes=kcs, filter_params=FilterParams(),
                 sketch_params=params)
    data = multisketch_to_json_bytes([src])

    [loaded] = read_sk_file(data)
    assert isinstance(loaded.hashes, LazyKmerCounts)
    # SoA views must not materialize
    assert np.array_equal(loaded.hash_array(), hs)
    assert (loaded.count_array() == 3).all()
    assert len(loaded.hashes) == 50
    assert loaded.hashes._soa is not None, "SoA access materialized"
    # element access materializes with exact eager-path equality
    # (serialization round-trip sets extra_count = count // 2)
    assert loaded.hashes[0].hash == int(hs[0])
    assert loaded.hashes._soa is None
    assert [k.astuple() for k in loaded.hashes] == [
        (int(h), b"A" * 21, 3, 1, None) for h in hs]
    # equality against a plain list works in both orders
    plain = list(read_sk_file(data)[0].hashes)
    [again] = read_sk_file(data)
    assert again.hashes == plain
    [again2] = read_sk_file(data)
    assert plain == again2.hashes
