"""Batched bottom-k sketch selection with count tracking.

Replaces the reference's serial streaming heap
(/root/reference/lib/src/sketch_schemes/mash.rs:34-63) with an
order-equivalent batched reduction. Equivalence (provable from the heap's
monotone max): the final streaming sketch is exactly the K smallest distinct
hash values with count = total stream occurrences and extra_count = total
reverse-complement occurrences. The scaled variant (scaled.rs:37-61) is
"all distinct hashes <= max_hash, topped up with the smallest above-threshold
hashes to `size` total". Both are computed here as sort → segment-dedup →
truncate over fixed-capacity state, which is exactly what TPUs like.

State layout (all u64, fixed capacity C, sorted ascending by hash):
    hashes[C]  — u64::MAX in empty slots
    counts[C]  — 0 in empty slots (saturating to u32 at finalization)
    extras[C]  — reverse-complement occurrence counts
    packed[C]  — 2-bit packed canonical k-mer codes (payload)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from finch_tpu.ops.murmur3 import hash_packed_kmers

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def empty_state(capacity: int):
    return (
        jnp.full((capacity,), U64_MAX, dtype=jnp.uint64),
        jnp.zeros((capacity,), dtype=jnp.uint64),
        jnp.zeros((capacity,), dtype=jnp.uint64),
        jnp.zeros((capacity,), dtype=jnp.uint64),
    )


def _dedup_sorted(h, c, e, pk):
    """Segment-reduce runs of equal hashes in a sorted array.

    Produces same-length arrays where slot i holds the i-th distinct hash
    (ascending) with summed counts; unused slots have hash=U64_MAX, count=0.
    Zero-count (pad) entries never contribute (their h is already U64_MAX).
    """
    n = h.shape[0]
    boundary = jnp.concatenate(
        [jnp.ones((1,), dtype=jnp.int32),
         (h[1:] != h[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(boundary) - 1
    uh = jax.ops.segment_min(h, seg, num_segments=n, indices_are_sorted=True)
    uc = jax.ops.segment_sum(c, seg, num_segments=n, indices_are_sorted=True)
    ue = jax.ops.segment_sum(e, seg, num_segments=n, indices_are_sorted=True)
    upk = jax.ops.segment_min(pk, seg, num_segments=n, indices_are_sorted=True)
    # unused segments: segment_min identity is dtype max -> U64_MAX; sums -> 0
    # pad runs (h==U64_MAX, c==0) reduce to (U64_MAX, 0) and a real U64_MAX
    # hash (astronomically unlikely) keeps its true count.
    return uh, uc, ue, upk


@partial(jax.jit, static_argnames=("k", "seed", "has_max_hash"))
def sketch_step(state, batch_packed, batch_rc, nvalid, max_hash,
                *, k: int, seed: int, has_max_hash: bool):
    """Fold one batch of packed canonical k-mers into the sketch state.

    batch_packed: u64[B] codes; batch_rc: u8/u64[B] is-revcomp flags;
    nvalid: number of real entries (rest is padding);
    max_hash: u64 scalar (scaled scheme) — only read when has_max_hash.

    Returns (new_state, below_count) where below_count = number of distinct
    hashes <= max_hash seen in the merged (pre-truncation) view; the driver
    uses it to grow capacity for the scaled scheme.
    """
    sh, sc, se, spk = state
    cap = sh.shape[0]
    b = batch_packed.shape[0]

    h = hash_packed_kmers(batch_packed, k=k, seed=seed)

    valid = jnp.arange(b, dtype=jnp.uint32) < nvalid.astype(jnp.uint32)
    # admission prefilter: current Kth-smallest (state max slot; U64_MAX while
    # unfilled) — occurrences of any surviving hash always pass (see module
    # docstring); everything above can never enter the final sketch.
    thresh = sh[-1]
    if has_max_hash:
        thresh = jnp.maximum(thresh, max_hash.astype(jnp.uint64))
    keep = valid & (h <= thresh)
    h = jnp.where(keep, h, U64_MAX)
    w = keep.astype(jnp.uint64)
    e = batch_rc.astype(jnp.uint64) * w
    pk = jnp.where(keep, batch_packed.astype(jnp.uint64), U64_MAX)

    mh = jnp.concatenate([sh, h])
    mc = jnp.concatenate([sc, w])
    me = jnp.concatenate([se, e])
    mpk = jnp.concatenate([spk, pk])
    mh, mc, me, mpk = jax.lax.sort((mh, mc, me, mpk), num_keys=1)
    mh, mc, me, mpk = _dedup_sorted(mh, mc, me, mpk)

    if has_max_hash:
        below = jnp.sum(((mh <= max_hash) & (mc > 0)).astype(jnp.uint32))
    else:
        below = jnp.zeros((), dtype=jnp.uint32)

    new_state = (mh[:cap], mc[:cap], me[:cap], mpk[:cap])
    return new_state, below


@jax.jit
def grow_state(state, new_capacity_template):
    """Copy state into a larger capacity buffer (scaled scheme growth)."""
    nh, nc, ne, npk = new_capacity_template
    sh, sc, se, spk = state
    n = sh.shape[0]
    return (
        nh.at[:n].set(sh),
        nc.at[:n].set(sc),
        ne.at[:n].set(se),
        npk.at[:n].set(spk),
    )


def merge_states(states):
    """Associative merge of per-shard sketch states (same capacity).

    Used by the multi-device path: partial bottom-k states from different
    data shards merge exactly (counts add on equal hashes) — the distributed
    analog of rayon's per-file parallelism (lib.rs:34-47) but *within* a
    single logical stream.
    """
    h = jnp.concatenate([s[0] for s in states])
    c = jnp.concatenate([s[1] for s in states])
    e = jnp.concatenate([s[2] for s in states])
    pk = jnp.concatenate([s[3] for s in states])
    h, c, e, pk = jax.lax.sort((h, c, e, pk), num_keys=1)
    h, c, e, pk = _dedup_sorted(h, c, e, pk)
    cap = states[0][0].shape[0]
    return (h[:cap], c[:cap], e[:cap], pk[:cap])
