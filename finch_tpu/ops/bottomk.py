"""Batched bottom-k sketch selection with count tracking.

Replaces the reference's serial streaming heap
(/root/reference/lib/src/sketch_schemes/mash.rs:34-63) with an
order-equivalent batched reduction. Equivalence (provable from the heap's
monotone max): the final streaming sketch is exactly the K smallest distinct
hash values with count = total stream occurrences and extra_count = total
reverse-complement occurrences. The scaled variant (scaled.rs:37-61) is
"all distinct hashes <= max_hash, topped up with the smallest above-threshold
hashes to `size` total".

TPU mapping (chosen from measured primitive costs on v5e):
  * NO scatter / segment_* / cumsum ops — all pathological on TPU.
  * dedup of sorted runs = log-shift segmented scans (Hillis-Steele).
  * admission prefilter: batch hashes above the current Kth-smallest can
    never enter the final sketch, and all occurrences of surviving hashes
    pass the filter, so counts stay exact.
  * fast path: survivors are extracted with a per-group partial top-k
    (grouped by hi-32 bits; valid whenever every group has <= GROUP_CAP
    survivors and the threshold is warm), giving a small candidate set to
    sort. A lax.cond falls back to the exact full-sort path in-dispatch when
    the fast-path preconditions fail (cold state, survivor bursts), so the
    result is always exact with no host round-trip.

State layout (all u64, fixed capacity C, sorted ascending by hash):
    hashes[C] — u64::MAX in empty slots
    counts[C] — 0 in empty slots (saturated to u32 at finalization)
    extras[C] — reverse-complement occurrence counts
    packed[C] — 2-bit packed canonical k-mer codes (payload)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from finch_tpu.ops.murmur3 import hash_packed_kmers

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

GROUP = 4096      # batch elements per extraction group
GROUP_CAP = 128   # max survivors extracted per group on the fast path


def empty_state(capacity: int):
    return (
        jnp.full((capacity,), U64_MAX, dtype=jnp.uint64),
        jnp.zeros((capacity,), dtype=jnp.uint64),
        jnp.zeros((capacity,), dtype=jnp.uint64),
        jnp.zeros((capacity,), dtype=jnp.uint64),
    )


def _shift_down(x, d, fill):
    pad = jnp.full((d,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[:-d]])


def _dedup_truncate(h, c, e, pk, out_len: int):
    """h sorted ascending (duplicate runs adjacent; pads have h=U64_MAX,c=0).

    Returns (h, c, e, pk) of length out_len holding the distinct hashes in
    ascending order with summed counts; unused slots (U64_MAX, 0).
    Scatter-free: Hillis-Steele segmented scans + one compaction sort.
    """
    n = h.shape[0]
    start = jnp.concatenate(
        [jnp.ones((1,), bool), h[1:] != h[:-1]])
    is_end = jnp.concatenate(
        [h[1:] != h[:-1], jnp.ones((1,), bool)])

    # segmented inclusive scans: sums for counts, min for the kmer payload
    open_ = ~start
    cs, es, pks = c, e, pk
    d = 1
    while d < n:
        cs = cs + jnp.where(open_, _shift_down(cs, d, np.uint64(0)), 0)
        es = es + jnp.where(open_, _shift_down(es, d, np.uint64(0)), 0)
        pks = jnp.where(open_,
                        jnp.minimum(pks, _shift_down(pks, d, U64_MAX)), pks)
        open_ = open_ & _shift_down(open_, d, False)
        d <<= 1

    real = is_end & (cs > 0)
    kh = jnp.where(real, h, U64_MAX)
    pad_rank = (~real).astype(jnp.uint64)  # real u64::MAX hashes sort first
    kc = jnp.where(real, cs, 0)
    ke = jnp.where(real, es, 0)
    kpk = jnp.where(real, pks, U64_MAX)
    kh, pad_rank, kc, ke, kpk = jax.lax.sort(
        (kh, pad_rank, kc, ke, kpk), num_keys=2)
    return (kh[:out_len], kc[:out_len], ke[:out_len], kpk[:out_len]), (
        kh, kc)


def _merge_candidates(state, ch, cc, ce, cpk, max_hash):
    """Merge candidates into the state: sort + dedup + truncate.

    Returns (new_state, below) where below counts distinct hashes
    <= max_hash in the PRE-truncation merged view — the exact signal the
    scaled driver needs to grow capacity before anything is lost.
    """
    sh, sc, se, spk = state
    cap = sh.shape[0]
    mh = jnp.concatenate([sh, ch])
    mc = jnp.concatenate([sc, cc])
    me = jnp.concatenate([se, ce])
    mpk = jnp.concatenate([spk, cpk])
    mh, mc, me, mpk = jax.lax.sort((mh, mc, me, mpk), num_keys=1)
    new_state, (full_h, full_c) = _dedup_truncate(mh, mc, me, mpk, cap)
    below = jnp.sum(((full_h <= max_hash) & (full_c > 0)).astype(jnp.uint32))
    return new_state, below


@partial(jax.jit, static_argnames=("k", "seed", "has_max_hash"))
def sketch_step(state, batch_packed, batch_rc, nvalid, max_hash,
                *, k: int, seed: int, has_max_hash: bool):
    """Fold one batch of packed canonical k-mers into the sketch state.

    Exact for any input; internally picks the fast extraction path when the
    state is warm and survivor density is low. Returns
    (new_state, below_count) — below_count is the number of distinct hashes
    <= max_hash in the new state (scaled capacity-growth signal; the count
    is exact unless the state overflowed, which the driver prevents).
    """
    sh, sc, se, spk = state
    cap = sh.shape[0]
    b = batch_packed.shape[0]

    h = hash_packed_kmers(batch_packed, k=k, seed=seed)

    valid = jnp.arange(b, dtype=jnp.uint32) < nvalid.astype(jnp.uint32)
    thresh = sh[-1]
    if has_max_hash:
        thresh = jnp.maximum(thresh, max_hash.astype(jnp.uint64))
    keep = valid & (h <= thresh)
    hm = jnp.where(keep, h, U64_MAX)
    w = keep.astype(jnp.uint64)
    e = batch_rc.astype(jnp.uint64) * w
    pk = jnp.where(keep, batch_packed.astype(jnp.uint64), U64_MAX)

    use_fast = b >= 2 * GROUP and b % GROUP == 0
    if use_fast:
        ngroups = b // GROUP
        keep_g = keep.reshape(ngroups, GROUP)
        per_group = jnp.sum(keep_g.astype(jnp.uint32), axis=1)
        # fast path valid iff no group overflows its extraction quota and
        # the threshold is warm (hi-32 strictly below the masked sentinel)
        fast_ok = (jnp.max(per_group) <= GROUP_CAP) & (
            (thresh >> jnp.uint64(32)) < jnp.uint64(0xFFFFFFFF))

        def fast_branch(args):
            hm_, w_, e_, pk_ = args
            hi = (hm_.reshape(ngroups, GROUP) >> jnp.uint64(32)).astype(
                jnp.uint32)
            # order-preserving u32 -> i32 descending key for top_k
            key32 = jax.lax.bitcast_convert_type(
                (~hi) ^ jnp.uint32(0x80000000), jnp.int32)
            _, idx = jax.lax.top_k(key32, GROUP_CAP)
            base = (jnp.arange(ngroups, dtype=jnp.int32) * GROUP)[:, None]
            flat = (idx.astype(jnp.int32) + base).ravel()
            return (hm_[flat], w_[flat], e_[flat], pk_[flat])

        mh_arg = (max_hash.astype(jnp.uint64) if has_max_hash
                  else jnp.uint64(0))

        def full_merge(_):
            return _merge_candidates(state, hm, w, e, pk, mh_arg)

        def fast_merge(_):
            ch, cc, ce, cpk = fast_branch((hm, w, e, pk))
            return _merge_candidates(state, ch, cc, ce, cpk, mh_arg)

        new_state, below = jax.lax.cond(fast_ok, fast_merge, full_merge,
                                        None)
    else:
        mh_arg = (max_hash.astype(jnp.uint64) if has_max_hash
                  else jnp.uint64(0))
        new_state, below = _merge_candidates(state, hm, w, e, pk, mh_arg)

    if not has_max_hash:
        below = jnp.zeros((), dtype=jnp.uint32)
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
    data shards merge exactly (counts add on equal hashes).
    """
    h = jnp.concatenate([s[0] for s in states])
    c = jnp.concatenate([s[1] for s in states])
    e = jnp.concatenate([s[2] for s in states])
    pk = jnp.concatenate([s[3] for s in states])
    h, c, e, pk = jax.lax.sort((h, c, e, pk), num_keys=1)
    cap = states[0][0].shape[0]
    merged, _ = _dedup_truncate(h, c, e, pk, cap)
    return merged
