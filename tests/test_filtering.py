"""Filtering pins from /root/reference/lib/src/filtering.rs in-module tests."""

from finch_tpu.core.filtering import (filter_abundance, filter_strands,
                                      guess_filter_threshold)
from finch_tpu.core.sketch import KmerCount
from finch_tpu.models.params import FilterParams


def kc(hash_, count, extra=0):
    return KmerCount(hash=hash_, kmer=b"", count=count, extra_count=extra)


def test_guess_filter_threshold():
    """filtering.rs:197-327."""
    assert guess_filter_threshold([], 0.2) == 1
    assert guess_filter_threshold([kc(1, 1)], 0.2) == 1
    assert guess_filter_threshold([kc(1, 1), kc(2, 1)], 0.2) == 1
    assert guess_filter_threshold([kc(1, 1), kc(2, 9)], 0.2) == 8
    assert guess_filter_threshold(
        [kc(1, 1), kc(2, 10), kc(3, 10), kc(4, 9)], 0.1) == 8
    assert guess_filter_threshold(
        [kc(1, 1), kc(2, 1), kc(3, 2), kc(4, 4)], 0.1) == 1
    assert guess_filter_threshold([kc(2, 2)], 1.0) == 2  # overflow guard


def test_filter_abundance():
    """filtering.rs:345-407."""
    sketch = [kc(1, 1), kc(2, 1)]
    assert [k.hash for k in filter_abundance(sketch, 1, None)] == [1, 2]
    sketch = [kc(1, 1), kc(2, 10), kc(3, 10), kc(4, 9)]
    assert [k.hash for k in filter_abundance(sketch, 9, None)] == [2, 3, 4]
    assert [k.hash for k in filter_abundance(sketch, 2, 9)] == [4]


def test_filter_strands():
    """filtering.rs:434-505 (count<16 bypass, min-strand ratio)."""
    sketch = [kc(1, 10, 1), kc(2, 10, 2), kc(3, 10, 8), kc(4, 10, 9)]
    assert [k.hash for k in filter_strands(sketch, 0.15)] == [1, 2, 3, 4]
    sketch = [kc(1, 16, 1), kc(2, 16, 2), kc(3, 16, 8), kc(4, 16, 9)]
    assert [k.hash for k in filter_strands(sketch, 0.15)] == [3, 4]


def test_filter_counts_pipeline_order():
    """filtering.rs:60-87: strand -> err(sets min abun) -> abundance."""
    fp = FilterParams(filter_on=True, abun_filter=(None, None),
                      err_filter=0.2, strand_filter=0.0)
    hashes = [kc(1, 1), kc(2, 9)]
    out = fp.filter_counts(hashes)
    assert fp.abun_filter[0] == 8
    assert [k.hash for k in out] == [2]

    # an existing stricter filter is kept
    fp = FilterParams(filter_on=True, abun_filter=(9, None),
                      err_filter=0.2, strand_filter=0.0)
    out = fp.filter_counts(hashes)
    assert fp.abun_filter[0] == 9
    assert [k.hash for k in out] == [2]


def test_filter_sketch_metadata_only():
    """filtering.rs:20-54 quirk: filter_sketch leaves hashes untouched."""
    from finch_tpu.core.sketch import Sketch
    from finch_tpu.models.params import SketchParams

    sketch = Sketch(name="x", seq_length=0, num_valid_kmers=0, comment="",
                    hashes=[kc(1, 1), kc(2, 9)],
                    filter_params=FilterParams(),
                    sketch_params=SketchParams.mash())
    fp = FilterParams(filter_on=True, abun_filter=(5, 100),
                      err_filter=0.3, strand_filter=0.2)
    fp.filter_sketch(sketch)
    assert len(sketch.hashes) == 2  # unchanged!
    assert sketch.filter_params.filter_on is True
    assert sketch.filter_params.abun_filter == (5, 100)
    assert sketch.filter_params.err_filter == 0.3
    assert sketch.filter_params.strand_filter == 0.2


def test_serialized_filter_map():
    fp = FilterParams(filter_on=True, abun_filter=(8, None),
                      err_filter=0.21, strand_filter=0.1)
    assert fp.to_serialized() == {
        "strandFilter": "0.1", "errFilter": "0.21", "minCopies": "8"}
    assert FilterParams(filter_on=False).to_serialized() == {}
    rt = FilterParams.from_serialized(fp.to_serialized())
    assert rt.filter_on is True
    assert rt.abun_filter == (8, None)
    assert rt.err_filter == 0.21
    assert rt.strand_filter == 0.1
