"""Distance engine throughput: (query, ref) pairs/s on one chip.

Prints one JSON line like bench.py. Uses the bitonic-merge tile engine
(parallel/sharded_dist.py)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from finch_tpu.parallel.sharded_dist import (_pairs_stats_tiled,
                                                 _pick_tile)

    Q, R, K = 16, 4096, 1024
    rng = np.random.default_rng(0)
    qs = np.sort(rng.choice(2 ** 63, size=(Q, K)).astype(np.uint64), axis=1)
    rs = np.sort(rng.choice(2 ** 63, size=(R, K)).astype(np.uint64), axis=1)
    nq = jnp.asarray(np.full(Q, K, dtype=np.uint32))
    nr = jnp.asarray(np.full(R, K, dtype=np.uint32))
    qj, rj = jnp.asarray(qs), jnp.asarray(rs)
    tile = _pick_tile(Q, K)

    @jax.jit
    def run(qj, nq, rj, nr, n):
        def body(i, acc):
            c, _, _ = _pairs_stats_tiled(qj ^ i.astype(jnp.uint64), nq, rj,
                                         nr, jnp.uint64(0), tile=tile)
            return acc ^ c
        return jax.lax.fori_loop(jnp.uint64(0), n, body,
                                 jnp.zeros((Q, R), dtype=jnp.uint64))

    r = run(qj, nq, rj, nr, jnp.uint64(2))
    np.asarray(r[:1, :2])  # ground-truth sync (host fetch)
    t0 = time.perf_counter()
    r = run(qj, nq, rj, nr, jnp.uint64(2))
    np.asarray(r[:1, :2])
    t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = run(qj, nq, rj, nr, jnp.uint64(6))
    np.asarray(r[:1, :2])
    t6 = time.perf_counter() - t0
    dt = (t6 - t2) / 4
    print(json.dumps({
        "metric": "dist_pairs_per_sec_per_chip",
        "value": round(Q * R / dt, 1),
        "unit": "pairs/s/chip (K=1024)",
    }))


if __name__ == "__main__":
    main()
