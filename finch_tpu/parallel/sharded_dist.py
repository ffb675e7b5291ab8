"""Sharded all-vs-all / query-vs-DB distance.

The reference computes distances in a serial double loop of two-pointer
merges (/root/reference/cli/src/main.rs:315-334, lib/src/distance.rs:66-126).
Here each (query, ref) pair's integer statistics (common, i, j) are computed
on-device with vectorized sorted-set intersection (searchsorted), vmapped
over pairs and sharded over the reference axis of a device mesh; the f64
distance formula is applied on host for exact JSON parity.

Exactness: for sorted distinct hash arrays the pointer-merge end state is
closed-form (see core/distance.py); this computes the same integers.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from finch_tpu.ops.bottomk import U64_MAX


def _pair_stats(q, nq, r, nr, max_hash):
    """(common, i, j) for one (query, ref) pair of padded sorted u64 arrays.

    Pads are U64_MAX with positions >= nq/nr. max_hash: 0 = no scaled tail.
    """
    # membership of q's elements in r (both sorted)
    pos = jnp.searchsorted(r, q)
    pos = jnp.minimum(pos, r.shape[0] - 1)
    qvalid = jnp.arange(q.shape[0], dtype=jnp.uint32) < nq
    common = jnp.sum((r[pos] == q) & qvalid
                     & (pos < nr)).astype(jnp.uint64)

    qmax = jnp.where(nq > 0, q[jnp.maximum(nq, 1) - 1], jnp.uint64(0))
    rmax = jnp.where(nr > 0, r[jnp.maximum(nr, 1) - 1], jnp.uint64(0))
    m = jnp.minimum(qmax, rmax)
    both = (nq > 0) & (nr > 0)
    i = jnp.where(both,
                  jnp.minimum(jnp.searchsorted(q, m, side="right"),
                              nq.astype(jnp.int64)),
                  0)
    j = jnp.where(both,
                  jnp.minimum(jnp.searchsorted(r, m, side="right"),
                              nr.astype(jnp.int64)),
                  0)
    # scaled tail (distance.rs:99-115): advance past hashes < max_hash
    tail_i = jnp.minimum(jnp.searchsorted(q, max_hash, side="left"),
                         nq.astype(jnp.int64))
    tail_j = jnp.minimum(jnp.searchsorted(r, max_hash, side="left"),
                         nr.astype(jnp.int64))
    use_tail = max_hash > 0
    i = jnp.where(use_tail, jnp.maximum(i, tail_i), i)
    j = jnp.where(use_tail, jnp.maximum(j, tail_j), j)
    return common, i.astype(jnp.uint64), j.astype(jnp.uint64)


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _all_pairs_stats(queries, nq, refs, nr, max_hash, *, mesh=None,
                     axis="refs"):
    """queries: (Q, K) u64; refs: (R, K) u64 (sharded over R when mesh).

    Returns (common, i, j) with shape (Q, R).
    """
    if mesh is not None:
        qsh = NamedSharding(mesh, P())
        rsh = NamedSharding(mesh, P(axis))
        queries = jax.lax.with_sharding_constraint(queries, qsh)
        refs = jax.lax.with_sharding_constraint(refs, rsh)
    f = jax.vmap(jax.vmap(_pair_stats, in_axes=(None, None, 0, 0, None)),
                 in_axes=(0, 0, None, None, None))
    return f(queries, nq, refs, nr, max_hash)


def pad_hashes(sketch_hashes: List[np.ndarray],
               k_pad: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-length sorted hash arrays into (N, K) with U64_MAX
    padding; returns (padded, lengths)."""
    n = len(sketch_hashes)
    k_pad = k_pad or max((len(h) for h in sketch_hashes), default=1)
    k_pad = max(k_pad, 1)
    out = np.full((n, k_pad), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    lens = np.zeros(n, dtype=np.uint32)
    for i, h in enumerate(sketch_hashes):
        out[i, : len(h)] = h
        lens[i] = len(h)
    return out, lens


def all_vs_all_arrays(query_hashes: List[np.ndarray],
                      ref_hashes: List[np.ndarray],
                      scale: float = 0.0,
                      mesh: Optional[Mesh] = None,
                      axis: Optional[str] = None):
    """Integer distance stats for all (query, ref) pairs.

    Returns (common, i, j) uint64 arrays of shape (Q, R). Callers apply the
    f64 containment/jaccard/mash formula on host (core/distance.py).
    """
    from finch_tpu.core.distance import scale_recip_max_hash

    if mesh is not None and axis is None:
        axis = mesh.axis_names[0]
    kq = max((len(h) for h in query_hashes), default=1)
    kr = max((len(h) for h in ref_hashes), default=1)
    kpad = max(kq, kr, 1)
    q, nq = pad_hashes(query_hashes, kpad)
    r, nr = pad_hashes(ref_hashes, kpad)
    max_hash = scale_recip_max_hash(scale) if scale > 0.0 else 0
    common, i, j = _all_pairs_stats(
        jnp.asarray(q), jnp.asarray(nq), jnp.asarray(r), jnp.asarray(nr),
        jnp.uint64(max_hash), mesh=mesh, axis=axis)
    return np.asarray(common), np.asarray(i), np.asarray(j)
