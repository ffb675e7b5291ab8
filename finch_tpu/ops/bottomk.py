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
  * NO scatter / segment_* ops — pathological on TPU.
  * dedup of sorted runs = log-shift segmented scans (Hillis-Steele).
  * admission prefilter: batch hashes above the current Kth-smallest can
    never enter the final sketch, and all occurrences of surviving hashes
    pass the filter, so counts stay exact.
  * survivor extraction = row-sort + column paging (no gathers, no cumsum,
    no scatter — all measured pathological or RPC-bound on v5e). The batch
    is reshaped to (rows, G) lanes of a composite key
    (packed_kmer << 1 | is_rc) + 1, with pre-filtered lanes set to
    u64::MAX; each row is sorted independently (a (B/G, G) row-sort costs
    about one HBM-tile pass — measured cheaper than a same-size top_k),
    putting every row's survivors in its leading columns. A lax.while_loop
    then merges fixed-width column pages [p*C, (p+1)*C) — static-stride
    dynamic slices — into the state until the leading column of the next
    page is entirely MAX (all rows exhausted). Hashes are recomputed from
    the composite payload per page, so the full-batch hash fuses into the
    keep-mask pass and is never materialized.
    One code path handles cold start, survivor bursts, duplicate-heavy
    batches (duplicates sort adjacent and the merge dedups them into
    counts) and the warm steady state — exactly, with no fallback branch:
    page-wise merging is exact because a hash truncated from the state can
    never re-enter (the state is always full of smaller hashes from then
    on), so its later occurrences are pre-filtered out.

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

ROW = 4096        # lanes per row-sort row
PAGE = 128        # columns merged per while_loop page


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

    Exact for any input (cold state, survivor bursts, duplicates) via
    row-sort + column-page extraction — see the module docstring. Returns
    (new_state, below_count) — below_count is the max, over chunk merges,
    of the number of distinct hashes <= max_hash in the pre-truncation
    merged view (scaled capacity-growth signal: any truncation loss forces
    below_count > capacity, so the driver's grow-and-redo rail always
    fires before data is lost).
    """
    sh, sc, se, spk = state
    b = batch_packed.shape[0]
    g = min(ROW, b)
    rows = b // g
    page = min(PAGE, g)
    npages = g // page

    # Fused pass: hash + prefilter + composite key. XLA fuses the hash into
    # the row-sort input, so the hash lanes are never materialized.
    h = hash_packed_kmers(batch_packed, k=k, seed=seed)
    valid = jnp.arange(b, dtype=jnp.uint32) < nvalid.astype(jnp.uint32)
    thresh = sh[-1]
    if has_max_hash:
        thresh = jnp.maximum(thresh, max_hash.astype(jnp.uint64))
    keep = valid & (h <= thresh)
    comp = jnp.where(
        keep,
        ((batch_packed.astype(jnp.uint64) << jnp.uint64(1))
         | batch_rc.astype(jnp.uint64)) + jnp.uint64(1),
        U64_MAX)
    comp = jax.lax.sort(comp.reshape(rows, g), dimension=1)
    mh_arg = (max_hash.astype(jnp.uint64) if has_max_hash
              else jnp.uint64(0))

    def body(carry):
        st, below, p = carry
        vals = jax.lax.dynamic_slice(
            comp, (jnp.int32(0), p * page), (rows, page)).ravel()
        slot_ok = vals != U64_MAX
        cpk_raw = (vals - jnp.uint64(1)) >> jnp.uint64(1)
        crc = (vals - jnp.uint64(1)) & jnp.uint64(1)
        ch = jnp.where(slot_ok, hash_packed_kmers(cpk_raw, k=k, seed=seed),
                       U64_MAX)
        cc = slot_ok.astype(jnp.uint64)
        ce = crc * cc
        cpk = jnp.where(slot_ok, cpk_raw, U64_MAX)
        nst, nb = _merge_candidates(st, ch, cc, ce, cpk, mh_arg)
        return (nst, jnp.maximum(below, nb.astype(jnp.uint32)),
                p + jnp.int32(1))

    def cond(carry):
        _, _, p = carry
        # continue while the next page's leading column still has survivors
        # anywhere (rows are sorted ascending, so an all-MAX leading column
        # means every row is exhausted)
        more = jnp.any(
            jax.lax.dynamic_slice(comp, (jnp.int32(0), p * page),
                                  (rows, 1)) != U64_MAX)
        return (p < npages) & more

    # derive the zero init from the data so it carries the same sharding
    # varying-axes as the body outputs under shard_map
    below0 = (comp[0, 0] - comp[0, 0]).astype(jnp.uint32)
    new_state, below, _ = jax.lax.while_loop(
        cond, body, (state, below0, jnp.int32(0)))

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
