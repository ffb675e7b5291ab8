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


def revcomp_packed(idx: np.ndarray, k: int) -> np.ndarray:
    """Reverse-complement of packed 2-bit codes (vectorized)."""
    idx = np.asarray(idx, dtype=np.uint64)
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
        self.counts += np.bincount(
            np.asarray(packed, dtype=np.int64),
            minlength=len(self.counts)).astype(np.uint64)

    def finalize(self):
        # saturating u32 per-index counts (counts.rs:31 saturating_add)
        counts = np.minimum(self.counts, 0xFFFFFFFF).astype(np.uint32)
        nz = np.flatnonzero(counts).astype(np.uint64)
        if len(nz) == 0:
            return []
        rc = revcomp_packed(nz, self.k)
        # the reference's ascending scan emits index ix unless its RC
        # partner was emitted earlier (rc < ix with a nonzero count), in
        # which case the partner already folded ix's count (counts.rs:42-63)
        partner_first = (rc < nz) & (counts[rc] > 0)
        emit = nz[~partner_first]
        erc = rc[~partner_first]
        base = counts[emit].astype(np.uint64)
        extra = counts[erc].astype(np.uint64)
        total = (base + extra) & np.uint64(0xFFFFFFFF)  # wrapping u32 add
        kmers = unpack_kmers(emit, self.k)
        return [
            KmerCount(hash=int(ix), kmer=bytes(kmers[i]),
                      count=int(total[i]), extra_count=int(extra[i]))
            for i, ix in enumerate(emit)
        ]
