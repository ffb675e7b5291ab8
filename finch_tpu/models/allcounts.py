"""AllCounts ("sketch-type none") — dense 4^k k-mer spectrum.

Contract: /root/reference/lib/src/sketch_schemes/counts.rs. Quirks faithfully
reproduced:
  * counts use forward-strand (non-canonical) bit_kmers (counts.rs:30)
  * total_bases is never updated — stays 0 (counts.rs:8)
  * to_vec folds reverse-complement counts into the first-encountered
    orientation with wrapping u32 addition; for even-k palindromes the count
    doubles (counts.rs:42-63)
"""

from __future__ import annotations

import numpy as np

from finch_tpu.core.sketch import KmerCount
from finch_tpu.models.params import SketchParams
from finch_tpu.native import unpack_kmers


def revcomp_codes(k: int) -> np.ndarray:
    """Reverse-complement index table for all 4^k packed codes."""
    idx = np.arange(4 ** k, dtype=np.uint64)
    rc = np.zeros_like(idx)
    v = idx.copy()
    for _ in range(k):
        rc = (rc << np.uint64(2)) | (np.uint64(3) - (v & np.uint64(3)))
        v >>= np.uint64(2)
    return rc


class AllCountsEngine:
    def __init__(self, params: SketchParams):
        if params.kmer_length > 15:
            raise ValueError("sketch-type none supports k <= 15 (4^k table)")
        self.params = params
        self.k = params.kmer_length
        self.counts = np.zeros(4 ** self.k, dtype=np.uint64)

    def update(self, packed: np.ndarray, rc: np.ndarray) -> None:
        # forward-strand codes; rc unused by this scheme
        np.add.at(self.counts, np.asarray(packed, dtype=np.int64), 1)

    def finalize(self):
        # saturating u32 per-index counts (counts.rs:31 saturating_add)
        counts = np.minimum(self.counts, 0xFFFFFFFF).astype(np.uint32)
        orig = counts.copy()
        rc_tab = revcomp_codes(self.k)
        out = []
        for ix in range(len(counts)):
            count = int(counts[ix])
            if count == 0:
                continue
            rci = int(rc_tab[ix])
            extra = int(orig[rci])
            counts[rci] = 0
            count = (count + extra) & 0xFFFFFFFF  # wrapping u32 add
            kmer = bytes(unpack_kmers(
                np.array([ix], dtype=np.uint64), self.k)[0])
            out.append(KmerCount(hash=ix, kmer=kmer, count=count,
                                 extra_count=extra))
        return out
