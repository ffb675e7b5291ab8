"""Round-3 ablation: where does the v2-kernel sketch step spend its time?

Variants, each timed with the differential protocol (N vs 3N steps inside
single dispatches, best-of-2) on a realistically warmed admission
threshold:

  A  kernel only            (extract_candidates + xor-fold consume)
  B  kernel + stage2 sort   (sort the candidate slab, consume)
  C  full sketch_step       (kernel + stage2_pages + spill/flush)
  D  full sketch_step, dup64 stream (adversarial duplicates)

Prints one JSON line per variant. Run on the real TPU.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from finch_tpu.ops import bottomk
    from finch_tpu.ops import pallas_extract as pe

    k = 21
    cap = 200000
    batch = 1 << 22
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
    warm = 8
    n_small = 32

    key = jax.random.PRNGKey(0)
    lo = jax.random.bits(key, (batch,), dtype=jnp.uint32)
    hi = jax.random.bits(jax.random.fold_in(key, 1), (batch,),
                         dtype=jnp.uint32)
    pool = ((hi.astype(jnp.uint64) << jnp.uint64(32))
            | lo.astype(jnp.uint64)) & jnp.uint64(4 ** k - 1)
    rc = (lo & jnp.uint32(1)).astype(jnp.uint8)
    comp = (pool << jnp.uint64(1)) | rc.astype(jnp.uint64)
    plo = (comp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    phi = (comp >> jnp.uint64(32)).astype(jnp.uint32)

    def perturb(i, x_lo, x_hi):
        mask = (i.astype(jnp.uint64)
                * jnp.uint64(0x9E3779B97F4A7C15)) & jnp.uint64(4 ** k - 1)
        m = mask << jnp.uint64(1)
        return (x_lo ^ (m & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                x_hi ^ (m >> jnp.uint64(32)).astype(jnp.uint32))

    # ---- warm a real state to get a steady-state threshold ----
    def warm_step(i, state, x_lo, x_hi):
        ns, _ = bottomk.sketch_step(
            state, x_lo, x_hi, jnp.uint32(batch), jnp.uint64(0), k=k,
            seed=0, has_max_hash=False, use_kernel=True, composite=True)
        return ns

    @jax.jit
    def warm_run(state, x_lo, x_hi, n):
        return jax.lax.fori_loop(
            0, n, lambda i, s: warm_step(jnp.uint32(i), s, *perturb(
                jnp.uint32(i), x_lo, x_hi)), state)

    state = bottomk.empty_state(cap)
    state = warm_run(state, plo, phi, jnp.int32(warm))
    np.asarray(state[0][:2])
    thresh = jnp.uint64(np.asarray(state[0][-1]))
    th_hi = (thresh >> jnp.uint64(32)).astype(jnp.uint32)
    th_lo = thresh.astype(jnp.uint32)

    def timed(fn, carry0, args):
        nonlocal_best = [float("inf"), float("inf")]
        start = 0
        for rep in range(2):
            for j, nsteps in enumerate((n_small, 3 * n_small)):
                t0 = time.perf_counter()
                out = fn(carry0, jnp.int32(start), jnp.int32(nsteps), *args)
                np.asarray(out[0] if isinstance(out, tuple) else out)[:2]
                dt = time.perf_counter() - t0
                start += nsteps
                nonlocal_best[j] = min(nonlocal_best[j], dt)
        per_step = (nonlocal_best[1] - nonlocal_best[0]) / (2 * n_small)
        return per_step

    # ---- A: kernel only ----
    @jax.jit
    def run_a(acc, start, nsteps, x_lo, x_hi):
        def body(i, acc):
            pl, ph = perturb(i.astype(jnp.uint32), x_lo, x_hi)
            cand, slab, _khl, _khh, covf, aovf = pe.extract_candidates(
                pl, ph, th_hi, th_lo, k=k, seed=0)
            return (acc ^ cand[:128] ^ slab[:128]
                    ^ jnp.uint64(covf) ^ jnp.uint64(aovf))
        return jax.lax.fori_loop(start, start + nsteps, body, acc)

    acc0 = jnp.zeros(128, dtype=jnp.uint64)
    t_a = timed(run_a, acc0, (plo, phi))

    # ---- B: kernel + stage2-style sort of the compacted accumulator ----
    @jax.jit
    def run_b(acc, start, nsteps, x_lo, x_hi):
        def body(i, acc):
            pl, ph = perturb(i.astype(jnp.uint32), x_lo, x_hi)
            cand, slab, _khl, _khh, covf, aovf = pe.extract_candidates(
                pl, ph, th_hi, th_lo, k=k, seed=0)
            w2 = cand.shape[0] // 256
            s2 = jax.lax.sort(cand.reshape(256, w2), dimension=0)
            return acc ^ s2[0, :128] ^ jnp.uint64(covf)
        return jax.lax.fori_loop(start, start + nsteps, body, acc)

    t_b = timed(run_b, acc0, (plo, phi))

    # ---- B2: kernel + tier-B aggregation on the per-chunk slab ----
    from finch_tpu.ops.bottomk import (STAGE2_H, _aggregate_runs,
                                       _spill_weight_shift)

    @jax.jit
    def run_b2(acc, start, nsteps, x_lo, x_hi):
        def body(i, acc):
            pl, ph = perturb(i.astype(jnp.uint32), x_lo, x_hi)
            cand, slab, _khl, _khh, covf, aovf = pe.extract_candidates(
                pl, ph, th_hi, th_lo, k=k, seed=0)
            w2 = slab.shape[0] // STAGE2_H
            s2 = jax.lax.sort(slab.reshape(STAGE2_H, w2), dimension=0)
            s2 = _aggregate_runs(s2, _spill_weight_shift(k))
            return acc ^ s2[0, :128] ^ jnp.uint64(covf)
        return jax.lax.fori_loop(start, start + nsteps, body, acc)

    t_b2 = timed(run_b2, acc0, (plo, phi))

    # ---- C: full sketch_step ----
    @jax.jit
    def run_c(state, start, nsteps, x_lo, x_hi):
        def body(i, s):
            pl, ph = perturb(i.astype(jnp.uint32), x_lo, x_hi)
            ns, _ = bottomk.sketch_step(
                s, pl, ph, jnp.uint32(batch), jnp.uint64(0), k=k, seed=0,
                has_max_hash=False, use_kernel=True, composite=True)
            return ns
        return jax.lax.fori_loop(start, start + nsteps, body, state)

    t_c = timed(run_c, state, (plo, phi))

    # ---- D: full step on the dup64 stream ----
    dup_lo = jnp.tile(plo[: batch // 64], 64)
    dup_hi = jnp.tile(phi[: batch // 64], 64)
    dstate = bottomk.empty_state(cap)
    dstate = warm_run(dstate, dup_lo, dup_hi, jnp.int32(warm))
    np.asarray(dstate[0][:2])
    t_d = timed(run_c, dstate, (dup_lo, dup_hi))

    out = {
        "kernel_ms": round(t_a * 1e3, 3),
        "kernel_plus_sort_ms": round(t_b * 1e3, 3),
        "kernel_plus_agg_ms": round(t_b2 * 1e3, 3),
        "full_step_ms": round(t_c * 1e3, 3),
        "dup64_step_ms": round(t_d * 1e3, 3),
        "post_kernel_ms": round((t_c - t_a) * 1e3, 3),
        "kmers_per_s": round(batch / t_c, 1),
        "dup64_kmers_per_s": round(batch / t_d, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
