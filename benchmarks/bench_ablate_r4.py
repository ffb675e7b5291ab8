"""Round-4 same-session ablation: where does a dup64 dirty step spend
its time?

Times, in one session on the real chip (differential N-vs-3N dispatches
so fixed overheads cancel; every dispatch carries a fresh start offset
so the endpoint's result cache never short-circuits a timing — see the
axon measurement notes in DESIGN.md):
  1. extract_candidates alone (the main kernel)
  2. extract + dedup_candidates chained (both kernels, no paging)
  3. the full sketch_step on the dup64 stream (kernels + paging + flush)
  4. the full sketch_step on the uniform stream (reference point)

The gap (3)-(2) is the host-graph tier-3 paging/flush cost; (2)-(1) is
the dedup kernel's marginal cost. Usage:
    python benchmarks/bench_ablate_r4.py [--steps=16]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from finch_tpu.ops import bottomk, pallas_extract as pe

    k, seed = 21, 0
    cap = 1000 * 200
    batch = 1 << 22
    steps = 16
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])

    key = jax.random.PRNGKey(0)
    lo = jax.random.bits(key, (batch,), dtype=jnp.uint32)
    hi = jax.random.bits(jax.random.fold_in(key, 1), (batch,),
                         dtype=jnp.uint32)
    pool = ((hi.astype(jnp.uint64) << jnp.uint64(32))
            | lo.astype(jnp.uint64)) & jnp.uint64(4 ** k - 1)
    rc = (lo & jnp.uint32(1)).astype(jnp.uint8)
    comp = (pool << jnp.uint64(1)) | rc.astype(jnp.uint64)
    u_lo = (comp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    u_hi = (comp >> jnp.uint64(32)).astype(jnp.uint32)
    d_lo = jnp.tile(u_lo[: batch // 64], 64)
    d_hi = jnp.tile(u_hi[: batch // 64], 64)

    # steady-state-ish admission threshold for the kernel-only loops
    th = jnp.uint32(int(0.005 * 2 ** 32))
    tl = jnp.uint32(0)

    def mask_for(i):
        """Per-step composite xor mask, bench.py's formula: perturbs the
        packed bits (left of the rc bit), fresh values every step."""
        m = ((i.astype(jnp.uint64) * jnp.uint64(0x9E3779B97F4A7C15))
             & jnp.uint64(4 ** k - 1)) << jnp.uint64(1)
        return ((m & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                (m >> jnp.uint64(32)).astype(jnp.uint32))

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:2]

    def make_timed(fn, carry0, *args):
        """Differential timing with a running start offset: every
        dispatch sees fresh step indices, so neither the executable
        cache nor the endpoint result cache can short-circuit it."""
        @jax.jit
        def run(c0, start, nsteps, *a):
            return jax.lax.fori_loop(
                start, start + nsteps,
                lambda i, c: fn(i.astype(jnp.uint32), c, *a), c0)

        state = {"start": 0}

        def timed_once(nsteps):
            t0 = time.perf_counter()
            out = run(carry0, jnp.uint32(state["start"]),
                      jnp.uint32(nsteps), *args)
            sync(out)
            state["start"] += nsteps
            return time.perf_counter() - t0

        sync(run(carry0, jnp.uint32(0), jnp.uint32(steps), *args))
        sync(run(carry0, jnp.uint32(steps), jnp.uint32(3 * steps), *args))
        state["start"] = 4 * steps
        best = 9e9
        for _ in range(2):
            t_small = timed_once(steps)
            t_big = timed_once(3 * steps)
            best = min(best, t_big - t_small)
        return best / (2 * steps)

    # 1. main kernel alone (ovf flags folded into the carry so the loop
    # has a data dependency)
    def main_only(i, c, vl, vh):
        mlo, mhi = mask_for(i)
        _c, _s, _hl, _hh, covf, aovf = pe.extract_candidates(
            vl ^ mlo, vh ^ mhi, th, tl, k=k, seed=seed)
        return c + covf + aovf

    t1u = make_timed(main_only, jnp.int32(0), u_lo, u_hi)
    t1d = make_timed(main_only, jnp.int32(0), d_lo, d_hi)

    # 2. main + dedup chained
    def both(i, c, vl, vh):
        mlo, mhi = mask_for(i)
        vlx, vhx = vl ^ mlo, vh ^ mhi
        _c, _s, hl, hh, covf, aovf = pe.extract_candidates(
            vlx, vhx, th, tl, k=k, seed=seed)
        cand, dovf = pe.dedup_candidates(vlx, vhx, hl, hh, th, tl,
                                         k=k, seed=seed)
        return c + covf + aovf + dovf + cand[0].astype(jnp.int32)

    t2d = make_timed(both, jnp.int32(0), d_lo, d_hi)

    # 3/4. full sketch_step, bench.py's exact protocol
    def step(i, state, vl, vh):
        mlo, mhi = mask_for(i)
        ns, _ = bottomk.sketch_step(
            state, vl ^ mlo, vh ^ mhi, jnp.uint32(batch), jnp.uint64(0),
            k=k, seed=seed, has_max_hash=False,
            use_kernel=True, composite=True)
        return ns

    def warm_state(vl, vh):
        s = bottomk.empty_state(cap)
        run8 = jax.jit(lambda st, a, b: jax.lax.fori_loop(
            0, 8, lambda i, c: step(jnp.uint32(i), c, a, b), st))
        s = run8(s, vl, vh)
        sync(s)
        return s

    su = warm_state(u_lo, u_hi)
    t3u = make_timed(step, su, u_lo, u_hi)
    sd = warm_state(d_lo, d_hi)
    t3d = make_timed(step, sd, d_lo, d_hi)

    print(json.dumps({
        "metric": "dup64_step_breakdown_ms",
        "steps": steps,
        "main_kernel_uniform_ms": round(t1u * 1e3, 3),
        "main_kernel_dup64_ms": round(t1d * 1e3, 3),
        "main_plus_dedup_dup64_ms": round(t2d * 1e3, 3),
        "full_step_uniform_ms": round(t3u * 1e3, 3),
        "full_step_dup64_ms": round(t3d * 1e3, 3),
        "dedup_kernel_marginal_ms": round((t2d - t1d) * 1e3, 3),
        "paging_flush_dup64_ms": round((t3d - t2d) * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
