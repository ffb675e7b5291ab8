"""Same-session A/B: weighted (duplicate-absorbing) accumulator vs the
unweighted round-3 kernel, kernel-only and full-step, uniform and dup64.

Differential N-vs-3N dispatches with running start offsets (endpoint
result-cache safe); one JSON line out.

NOTE (r5): sequential config blocks are PHASE-CONFOUNDED on the shared
endpoint — this script gave opposite verdicts in different sessions.
Use benchmarks/bench_absorb_interleaved.py for the settled number
(always-weighted +71% on uniform); this file is kept for the
kernel-only phase breakdown."""


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
    steps = 8
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

    th = jnp.uint32(int(0.005 * 2 ** 32))
    tl = jnp.uint32(0)

    def mask_for(i):
        m = ((i.astype(jnp.uint64) * jnp.uint64(0x9E3779B97F4A7C15))
             & jnp.uint64(4 ** k - 1)) << jnp.uint64(1)
        return ((m & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                (m >> jnp.uint64(32)).astype(jnp.uint32))

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:2]

    def make_timed(fn, carry0, *args):
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

    out = {"metric": "absorb_ab_ms_per_step", "steps": steps}

    # kernel-only, weighted vs not, uniform and dup64 (each jit program
    # costs ~2.5 min on the remote Mosaic compiler: --full-only skips
    # this phase when only the step-level A/B is needed)
    kernel_phase = "--full-only" not in sys.argv
    for wname, wflag in (("w1", True), ("w0", False)) if kernel_phase \
            else ():
        def kern_only(i, c, vl, vh, _w=wflag):
            mlo, mhi = mask_for(i)
            cand, _s, _hl, _hh, covf, aovf = pe.extract_candidates(
                vl ^ mlo, vh ^ mhi, th, tl, k=k, seed=seed, weighted=_w)
            return c + covf + aovf + cand[0].astype(jnp.int32)

        out[f"kernel_uniform_{wname}_ms"] = round(
            make_timed(kern_only, jnp.int32(0), u_lo, u_hi) * 1e3, 3)
        out[f"kernel_dup64_{wname}_ms"] = round(
            make_timed(kern_only, jnp.int32(0), d_lo, d_hi) * 1e3, 3)

    # full sketch_step, absorb on/off, uniform and dup64
    for aname, aflag in (("a1", True), ("a0", False)):
        def step(i, state, vl, vh, _a=aflag):
            mlo, mhi = mask_for(i)
            ns, _ = bottomk.sketch_step(
                state, vl ^ mlo, vh ^ mhi, jnp.uint32(batch),
                jnp.uint64(0), k=k, seed=seed, has_max_hash=False,
                use_kernel=True, composite=True, absorb=_a)
            return ns

        def warm_state(vl, vh, _a=aflag):
            s = bottomk.empty_state(cap)
            run8 = jax.jit(lambda st, a, b: jax.lax.fori_loop(
                0, 8, lambda i, c: step(jnp.uint32(i), c, a, b), st))
            s = run8(s, vl, vh)
            sync(s)
            return s

        su = warm_state(u_lo, u_hi)
        out[f"step_uniform_{aname}_ms"] = round(
            make_timed(step, su, u_lo, u_hi) * 1e3, 3)
        sd = warm_state(d_lo, d_hi)
        out[f"step_dup64_{aname}_ms"] = round(
            make_timed(step, sd, d_lo, d_hi) * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
