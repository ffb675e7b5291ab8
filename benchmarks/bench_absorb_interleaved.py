"""Interleaved absorb A/B: alternate ON/OFF measurement blocks so
endpoint phase drift hits both configs equally; min over blocks.

This is the measurement that exposed the weighted accumulator's true
uniform-stream cost (r5: ON 1.937 vs OFF 1.134 ms/step = +71%,
results_r5/absorb_interleaved.json) after two sequential A/Bs gave
opposite answers across sessions — sequential configs each sample ONE
endpoint phase; interleaving samples both configs in every phase.
The a1 config pins the state hint to 1 each step so it measures the
ALWAYS-weighted kernel (the adaptive default would immediately drop a
uniform stream back to the unweighted kernel)."""
import json, os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from finch_tpu.ops import bottomk

k, size = 21, 1000
cap = size * 200
batch = 1 << 22
steps = 16

key = jax.random.PRNGKey(0)
lo = jax.random.bits(key, (batch,), dtype=jnp.uint32)
hi = jax.random.bits(jax.random.fold_in(key, 1), (batch,), dtype=jnp.uint32)
pool = ((hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)) & jnp.uint64(4**k - 1)
rc = (lo & jnp.uint32(1)).astype(jnp.uint8)
comp = (pool << jnp.uint64(1)) | rc.astype(jnp.uint64)
plo = (comp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
phi = (comp >> jnp.uint64(32)).astype(jnp.uint32)

def make_run(absorb):
    def one(i, s):
        m = ((i.astype(jnp.uint64) * jnp.uint64(0x9E3779B97F4A7C15)) & jnp.uint64(4**k-1)) << jnp.uint64(1)
        mlo = (m & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        mhi = (m >> jnp.uint64(32)).astype(jnp.uint32)
        ns, _ = bottomk.sketch_step(s, plo ^ mlo, phi ^ mhi, jnp.uint32(batch), jnp.uint64(0),
                                    k=k, seed=0, has_max_hash=False, use_kernel=True,
                                    composite=True, absorb=absorb)
        if absorb:  # pin always-weighted (see module docstring)
            ns = (*ns[:6], jnp.ones_like(ns[6]))
        return ns
    @jax.jit
    def run(s, start, n):
        return jax.lax.fori_loop(start, start + n, lambda i, c: one(i.astype(jnp.uint32), c), s)
    return run

runs = {"a1": make_run(True), "a0": make_run(False)}
states = {}
starts = {"a1": 0, "a0": 0}
def sync(s): return np.asarray(s[0][:2])
for name, run in runs.items():
    s = bottomk.empty_state(cap)
    s = run(s, jnp.int32(0), jnp.int32(8)); sync(s)
    states[name] = s; starts[name] = 8

best = {"a1": 9e9, "a0": 9e9}
for block in range(5):
    for name in ("a1", "a0") if block % 2 == 0 else ("a0", "a1"):
        run = runs[name]; s = states[name]
        t0 = time.perf_counter()
        s = run(s, jnp.int32(starts[name]), jnp.int32(steps)); sync(s)
        t_small = time.perf_counter() - t0
        starts[name] += steps
        t0 = time.perf_counter()
        s = run(s, jnp.int32(starts[name]), jnp.int32(3*steps)); sync(s)
        t_big = time.perf_counter() - t0
        starts[name] += 3*steps
        states[name] = s
        best[name] = min(best[name], (t_big - t_small) / (2*steps))
    print(json.dumps({"block": block, "a1_ms": round(best["a1"]*1e3, 3), "a0_ms": round(best["a0"]*1e3, 3)}))
print(json.dumps({"final_uniform_ms_per_step": {"absorb_on": round(best['a1']*1e3,3), "absorb_off": round(best['a0']*1e3,3)}}))
