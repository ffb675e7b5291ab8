"""Statistics pins from /root/reference/lib/src/statistics.rs tests."""

from finch_tpu.core.sketch import KmerCount
from finch_tpu.core.statistics import cardinality, hist


def kc(hash_, count):
    return KmerCount(hash=hash_, kmer=b"", count=count, extra_count=0)


def test_hist():
    """statistics.rs:49-129 (incl. issue #63 regression)."""
    data = hist([kc(1, 1), kc(2, 1), kc(3, 1)])
    assert data == [3]

    data = hist([kc(1, 4), kc(2, 2), kc(3, 4), kc(4, 3), kc(3, 126497)])
    assert len(data) == 126497
    assert data[0] == 0
    assert data[1] == 1
    assert data[2] == 1
    assert data[3] == 2
    assert data[126497 - 1] == 1


def test_cardinality():
    assert cardinality([]) == 0
    # KMV estimate with f32 math: (len-1) / (last_hash/ u64::MAX)
    sketch = [kc((1 << 63), 1)]
    assert cardinality(sketch) == 0  # (1-1)/0.5
    sketch = [kc(1, 1), kc((1 << 63), 1)]
    assert cardinality(sketch) == 2  # 1 / 0.5
