"""Benchmark: k-mers hashed + bottom-k-sketched per second per chip.

Runs the device pipeline (vectorized murmur3 + batched bottom-k merge) on
one chip and prints ONE JSON line. vs_baseline compares against the
reference's derived single-core throughput: finch-rs sketches a 4.8 GB FASTQ
in 99 s on a 2015 MacBook Pro (~4e7 k-mers/s; /root/reference/README.md:112-121,
BASELINE.md).
"""

import json
import sys
import time

BASELINE_KMERS_PER_SEC = 4.0e7  # single-core finch-rs (BASELINE.md)


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    k = 21
    size = 1000
    oversketch_state = size * 200  # filtered-mash working state (cli.rs:287)
    batch = 1 << 22  # 4M k-mers per device step

    # synthetic packed k-mer lanes, generated on device (uniform codes)
    key = jax.random.PRNGKey(0)
    lo = jax.random.bits(key, (batch,), dtype=jnp.uint32)
    hi = jax.random.bits(jax.random.fold_in(key, 1), (batch,),
                         dtype=jnp.uint32)
    packed = ((hi.astype(jnp.uint64) << jnp.uint64(32))
              | lo.astype(jnp.uint64)) % jnp.uint64(4**k)
    rc = (lo & jnp.uint32(1)).astype(jnp.uint8)
    nvalid = jnp.uint32(batch)
    mh = jnp.uint64(0)

    state = bottomk.empty_state(oversketch_state)

    def step(st):
        new_state, _ = bottomk.sketch_step(
            st, packed, rc, nvalid, mh, k=k, seed=0, has_max_hash=False)
        return new_state

    # warm-up / compile (cold full-path batches + fast-path trace)
    for _ in range(3):
        state = step(state)
    _ = jnp.sum(state[1]).block_until_ready()

    # per-step timing with forced completion each iteration; median is
    # robust against pool contention hiccups on shared TPU endpoints
    times = []
    for _ in range(12):
        t0 = time.perf_counter()
        state = step(state)
        _ = jnp.sum(state[1]).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    kmers_per_sec = batch / dt
    print(json.dumps({
        "metric": "kmers_sketched_per_sec_per_chip",
        "value": round(kmers_per_sec, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
