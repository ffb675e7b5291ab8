"""Sketch containers.

Mirrors the reference's in-memory model (/root/reference/lib/src/serialization/mod.rs:45-65
`Sketch`, /root/reference/lib/src/sketch_schemes/mod.rs:15-22 `KmerCount`) with
a NumPy struct-of-arrays view for the device/distance paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from finch_tpu.models.params import FilterParams, SketchParams


@dataclass
class KmerCount:
    hash: int
    kmer: bytes
    count: int
    extra_count: int
    label: Optional[bytes] = None

    def astuple(self):
        return (self.hash, self.kmer, self.count, self.extra_count, self.label)


@dataclass
class Sketch:
    name: str
    seq_length: int
    num_valid_kmers: int
    comment: str
    hashes: List[KmerCount]
    filter_params: FilterParams
    sketch_params: SketchParams

    def __len__(self) -> int:
        return len(self.hashes)

    def is_empty(self) -> bool:
        return not self.hashes

    # --- struct-of-arrays views (device/distance paths) ---

    def hash_array(self) -> np.ndarray:
        return np.asarray([kc.hash for kc in self.hashes], dtype=np.uint64)

    def count_array(self) -> np.ndarray:
        return np.asarray([kc.count for kc in self.hashes], dtype=np.uint32)

    def extra_count_array(self) -> np.ndarray:
        return np.asarray([kc.extra_count for kc in self.hashes],
                          dtype=np.uint32)



def kmer_counts_from_arrays(hashes, kmers, counts, extras,
                            labels=None) -> List[KmerCount]:
    """Assemble KmerCount list from SoA arrays (kmers: list[bytes] or
    (n,k) uint8 array)."""
    out = []
    n = len(hashes)
    if hasattr(kmers, "shape") and getattr(kmers, "ndim", 1) == 2:
        kmer_list = [bytes(row) for row in kmers]
    else:
        kmer_list = list(kmers)
    for i in range(n):
        out.append(KmerCount(
            hash=int(hashes[i]),
            kmer=kmer_list[i],
            count=int(counts[i]),
            extra_count=int(extras[i]),
            label=None if labels is None else labels[i],
        ))
    return out
