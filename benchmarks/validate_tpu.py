"""On-device validation: the real-TPU kernel path vs the host oracle.

CI runs on a virtual CPU mesh where the Pallas kernel is disabled; this
script exercises the fused-kernel sketch path on actual TPU hardware and
asserts bit-identity against NumpyEngine, at a small capacity (the shape
class that once hit a scoped-VMEM lowering failure) and with duplicate-
heavy data. Run manually or from the round driver; exits nonzero on any
divergence."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compile_canary() -> None:
    """AOT-lower + compile every shipped Pallas kernel at production
    shapes on the real backend, BEFORE any numeric section runs. A kernel
    that stops compiling (e.g. the round-3 Mosaic trunci i8->i1 regression
    in the dedup kernel, BENCH_r03) must fail here loudly, not silently
    via a bench retry."""
    import jax
    import jax.numpy as jnp

    from finch_tpu.ops import pallas_extract as pe

    b = 1 << 22  # the bench/engine production batch
    slab_rows = (b // (pe.COLH * pe.CHUNK_W)) * pe.ROWS_OUT * pe.CHUNK_W
    u32v = jax.ShapeDtypeStruct((b,), jnp.uint32)
    u32s = jax.ShapeDtypeStruct((), jnp.uint32)
    u64slab = jax.ShapeDtypeStruct((slab_rows,), jnp.uint64)
    for name, fn, args in (
        ("extract_candidates[weighted]", lambda vl, vh, th, tl:
            pe.extract_candidates(vl, vh, th, tl, k=21, seed=0,
                                  weighted=True),
         (u32v, u32v, u32s, u32s)),
        ("extract_candidates[unweighted]", lambda vl, vh, th, tl:
            pe.extract_candidates(vl, vh, th, tl, k=21, seed=0,
                                  weighted=False),
         (u32v, u32v, u32s, u32s)),
        ("dedup_candidates", lambda vl, vh, hl, hh, th, tl:
            pe.dedup_candidates(vl, vh, hl, hh, th, tl, k=21, seed=0),
         (u32v, u32v, u32v, u32v, u32s, u32s)),
        ("dedup_slab_candidates", lambda s:
            pe.dedup_slab_candidates(s, k=21),
         (u64slab,)),
    ):
        jax.jit(fn).lower(*args).compile()
        print(f"compile canary: {name} @ b={b} OK")


def tier_d_section(rng) -> None:
    """Tier-D dedup kernel on real hardware: a 64x-duplicate-burst stream
    at a steady-state-like admission threshold must (a) keep the overflow
    flag clean and (b) produce weighted heads equal to the numpy
    bruteforce multiset. Matches the duplicate-count contract of the
    reference's streaming heap (mash.rs:34-63: counts exact under any
    duplication)."""
    import jax.numpy as jnp
    import numpy as np

    from finch_tpu.native import murmur3_packed
    from finch_tpu.ops import pallas_extract as pe

    k, seed = 21, 0
    b = 1 << 22  # 64 chunks at COLH=32, CHUNK_W=2048
    assert pe.supports_dedup(k, b), "tier-D preconditions regressed"
    distinct = rng.integers(0, 4 ** k, size=b // 64, dtype=np.uint64)
    packed = np.tile(distinct, 64)
    rc = np.tile(rng.integers(0, 2, size=b // 64, dtype=np.uint64), 64)
    v = (packed << np.uint64(1)) | rc
    v[-17:] = np.uint64(0xFFFFFFFFFFFFFFFF)
    # steady-state-like threshold: ~2.5 expected survivors per column
    # (the bench's dup64 regime after warm-up). Far above it, per-column
    # distinct re-occurring heads legitimately overflow DUP_ACC_H and
    # the flag fires -> tier B/C fallback (covered in interpret tests).
    thresh = np.uint64(int(0.005 * 2 ** 64))
    vlo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    vhi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    th = jnp.uint32(int(thresh >> np.uint64(32)))
    tl = jnp.uint32(int(thresh & np.uint64(0xFFFFFFFF)))
    _c, slab, khl, khh, covf, _aovf = pe.extract_candidates(
        vlo, vhi, th, tl, k=k, seed=seed)
    cand, dovf = pe.dedup_candidates(vlo, vhi, khl, khh, th, tl,
                                     k=k, seed=seed)
    assert int(dovf) == 0, "tier-D overflowed at steady state (dovf=1)"
    assert int(covf) == 0, "chunk-column overflow at steady state"
    cand2, d2ovf = pe.dedup_slab_candidates(slab, k=k)
    assert int(d2ovf) == 0, "tier-D2 overflowed at steady state"

    real = v != np.uint64(0xFFFFFFFFFFFFFFFF)
    hashes = murmur3_packed(packed, k, seed)
    keep = real & (hashes <= thresh)
    want = {}
    for comp in (v[keep] + np.uint64(1)).tolist():
        want[comp] = want.get(comp, 0) + 1
    shift = np.uint64(2 * k + 2)
    mask = (np.uint64(1) << shift) - np.uint64(1)
    for label, arr in (("tier-D", cand), ("tier-D2", cand2)):
        got = {}
        carr = np.asarray(arr)
        for e in carr[carr != np.uint64(0xFFFFFFFFFFFFFFFF)]:
            comp = int(e & mask)
            assert comp not in got, "duplicate head emitted"
            got[comp] = int(e >> shift) + 1
        assert got == want, (
            f"{label} DIVERGENCE: {len(got)} heads vs {len(want)}")
        print(f"{label} dedup kernel: {len(want)} weighted heads exact "
              "on hardware (64x burst, ovf=0)")


def main() -> None:
    import numpy as np

    import finch_tpu  # noqa: F401  (configures JAX)
    from finch_tpu.models.engine import JaxEngine, NumpyEngine
    from finch_tpu.models.params import SketchParams

    compile_canary()
    rng = np.random.default_rng(42)
    tier_d_section(rng)
    for cap, final in ((2000, 500), (200000, 1000)):
        params = SketchParams.mash(kmers_to_sketch=cap, final_size=final,
                                   no_strict=True)
        jx = JaxEngine(params, batch_size=1 << 21)
        npe = NumpyEngine(params)
        for _ in range(4):
            n = 1 << 21
            pk = rng.integers(0, 4 ** 21, size=n, dtype=np.uint64)
            pk[: n // 10] = pk[n // 10: 2 * (n // 10)]  # duplicates
            rc = rng.integers(0, 2, size=n, dtype=np.uint8)
            jx.update(pk, rc)
            npe.update(pk, rc)
        a = [(k.hash, k.count, k.extra_count, k.kmer)
             for k in jx.finalize()]
        b = [(k.hash, k.count, k.extra_count, k.kmer)
             for k in npe.finalize()]
        assert a == b, f"DIVERGENCE at capacity {cap}"
        print(f"capacity {cap}: device == oracle over "
              f"{4 * (1 << 21)} kmers (kernel={jx._use_kernel})")

    # 64x-duplicate-burst stream through the full engine. With the
    # weighted accumulator (round 4) this stays on tier A (in-kernel
    # absorption); counts must stay exact either way
    params = SketchParams.mash(kmers_to_sketch=200000, final_size=1000,
                               no_strict=True)
    jx = JaxEngine(params, batch_size=1 << 21)
    npe = NumpyEngine(params)
    for i in range(4):
        n = 1 << 21
        base = rng.integers(0, 4 ** 21, size=n // 64, dtype=np.uint64)
        pk = np.tile(base, 64)
        rc = np.tile(rng.integers(0, 2, size=n // 64, dtype=np.uint8), 64)
        jx.update(pk, rc)
        npe.update(pk, rc)
    a = [(k.hash, k.count, k.extra_count) for k in jx.finalize()]
    b = [(k.hash, k.count, k.extra_count) for k in npe.finalize()]
    assert a == b, "DIVERGENCE: dup64 weighted tier-A path"
    print(f"dup64 burst: device == oracle ({len(a)} entries, counts exact)")

    # the SCATTERED duplicate adversary: the same 64x multiset with
    # copies randomly permuted across the batch — defeats the column
    # adjacency the tiled burst hands the absorb/D2 collapse, so the
    # wide (DUP_ACC_H) D2 accumulator or the B/C chain carries it.
    # Counts must stay exact whatever tier takes the batch (the
    # reference's heap is exact under any duplication order,
    # mash.rs:34-63).
    jx = JaxEngine(params, batch_size=1 << 21)
    npe = NumpyEngine(params)
    for i in range(4):
        n = 1 << 21
        base = rng.integers(0, 4 ** 21, size=n // 64, dtype=np.uint64)
        pk = np.tile(base, 64)
        rc = np.tile(rng.integers(0, 2, size=n // 64, dtype=np.uint8), 64)
        perm = rng.permutation(n)
        jx.update(pk[perm], rc[perm])
        npe.update(pk[perm], rc[perm])
    a = [(k.hash, k.count, k.extra_count) for k in jx.finalize()]
    b = [(k.hash, k.count, k.extra_count) for k in npe.finalize()]
    assert a == b, "DIVERGENCE: shuffled dup64 path"
    print(f"dup64 shuffled: device == oracle ({len(a)} entries, "
          "counts exact)")

    # same burst with the weighted accumulator DISABLED: the accumulator
    # overflows and the tier-D2/B fallback chain runs for real on
    # hardware (the pre-round-4 duplicate path must stay exact too)
    from finch_tpu.ops import pallas_extract as _pe

    _pe.ABSORB = False
    try:
        jx = JaxEngine(params, batch_size=1 << 21)
        npe = NumpyEngine(params)
        for i in range(2):
            n = 1 << 21
            base = rng.integers(0, 4 ** 21, size=n // 64, dtype=np.uint64)
            pk = np.tile(base, 64)
            rc = np.tile(rng.integers(0, 2, size=n // 64,
                                      dtype=np.uint8), 64)
            jx.update(pk, rc)
            npe.update(pk, rc)
        a = [(k.hash, k.count, k.extra_count) for k in jx.finalize()]
        b = [(k.hash, k.count, k.extra_count) for k in npe.finalize()]
        assert a == b, "DIVERGENCE: dup64 unweighted fallback chain"
        print(f"dup64 burst (absorb off): device == oracle "
              f"({len(a)} entries)")
    finally:
        _pe.ABSORB = True

    # scaled scheme on the kernel path (incl. the grow-and-redo rail)
    sparams = SketchParams.scaled(kmers_to_sketch=256, scale=1e-4)
    js = JaxEngine(sparams, batch_size=1 << 21)
    ns = NumpyEngine(sparams)
    for _ in range(3):
        pk = rng.integers(0, 4 ** 21, size=1 << 21, dtype=np.uint64)
        rc = rng.integers(0, 2, size=1 << 21, dtype=np.uint8)
        js.update(pk, rc)
        ns.update(pk, rc)
    a = [(k.hash, k.count) for k in js.finalize()]
    b = [(k.hash, k.count) for k in ns.finalize()]
    assert a == b, "DIVERGENCE: scaled kernel path"
    print(f"scaled: device == oracle ({len(a)} entries, "
          f"kernel={js._use_kernel})")

    # single-chip "mesh": ShardedSketchEngine machinery on real hardware
    import jax

    from finch_tpu.parallel import ShardedSketchEngine, make_mesh

    mesh = make_mesh(len(jax.devices()))
    params = SketchParams.mash(kmers_to_sketch=2000, final_size=500,
                               no_strict=True)
    se = ShardedSketchEngine(params, mesh, batch_size_per_device=1 << 20)
    ne = NumpyEngine(params)
    for _ in range(2):
        pk = rng.integers(0, 4 ** 21, size=1 << 21, dtype=np.uint64)
        rc = rng.integers(0, 2, size=1 << 21, dtype=np.uint8)
        se.update(pk, rc)
        ne.update(pk, rc)
    a = [(k.hash, k.count) for k in se.finalize()]
    b = [(k.hash, k.count) for k in ne.finalize()]
    assert a == b, "DIVERGENCE: sharded engine on device"
    print(f"sharded engine: device == oracle over {mesh.devices.size} "
          f"device(s)")

    # Gram-matrix distance engine on real hardware vs the serial engine
    from finch_tpu.core.distance import raw_distance_arrays
    from finch_tpu.parallel.mxu_dist import all_pairs_stats, pack_db

    db = [np.sort(rng.choice(1 << 48, size=int(rng.integers(50, 300)),
                             replace=False).astype(np.uint64))
          for _ in range(12)]
    # plant related pairs (~50% shared hashes) so the survivors path
    # below has real candidates to verify, not a vacuous empty set
    db[1] = np.sort(np.unique(np.concatenate(
        [db[0][: len(db[0]) // 2],
         rng.choice(1 << 48, size=len(db[0]) // 2,
                    replace=False).astype(np.uint64)])))
    db[7] = np.sort(np.unique(np.concatenate(
        [db[6][: 2 * len(db[6]) // 3],
         rng.choice(1 << 48, size=len(db[6]) // 3,
                    replace=False).astype(np.uint64)])))
    H, L = pack_db(db)
    common, i_m, j_m = all_pairs_stats(H, L, scale=0.0)
    for qa in range(len(db)):
        for qb in range(len(db)):
            if qa == qb:
                continue
            c0, j0, cm, tot = raw_distance_arrays(db[qa], db[qb], 0.0)
            got_tot = i_m[qa, qb] - common[qa, qb] + j_m[qa, qb]
            assert (common[qa, qb], got_tot) == (cm, tot),                 f"DIVERGENCE: Gram dist at pair {qa},{qb}"
    print("Gram distance engine: device == serial on "
          f"{len(db)}x{len(db)} pairs")

    # the non-default Gram precision (bf16+f32 when int8 is the default,
    # and vice versa): both MXU paths must agree bit-for-bit on hardware
    from finch_tpu.parallel import mxu_dist as _mx

    _saved = _mx.GRAM_INT8
    _mx.GRAM_INT8 = not _saved
    try:
        common8, i8, j8 = all_pairs_stats(H, L, scale=0.0)
    finally:
        _mx.GRAM_INT8 = _saved
    assert (np.array_equal(common8, common) and np.array_equal(i8, i_m)
            and np.array_equal(j8, j_m)), "DIVERGENCE: Gram precision paths"
    print("Gram precision paths (int8 vs bf16/f32): identical on hardware")

    # device-compacted survivors: same candidate stats as the full path
    from finch_tpu.parallel.mxu_dist import all_pairs_survivors

    surv = all_pairs_survivors(H, L, 0.0, 21.0, 0.3)
    assert surv is not None, "survivors path out of contract unexpectedly"
    iq_s, jr_s, c_s, i_s, j_s = surv
    assert len(iq_s) >= 4, (
        "survivors check is vacuous: the planted related pairs must "
        "produce candidates under max-dist 0.3")
    for x in range(len(iq_s)):
        qa, qb = int(iq_s[x]), int(jr_s[x])
        assert (c_s[x], i_s[x], j_s[x]) == \
            (common[qa, qb], i_m[qa, qb], j_m[qa, qb]), \
            f"DIVERGENCE: survivors stats at pair {qa},{qb}"
    print(f"survivor compaction: {len(iq_s)} candidates match the "
          "full-matrix stats on hardware")

    # composite-plane kernel input == classic input (bit-identical)
    import jax.numpy as jnp

    from finch_tpu.ops import bottomk

    s1 = bottomk.empty_state(2000)
    s2 = bottomk.empty_state(2000)
    for _ in range(2):
        pk = rng.integers(0, 4 ** 21, size=1 << 21, dtype=np.uint64)
        rc = rng.integers(0, 2, size=1 << 21, dtype=np.uint8)
        comp = (pk << np.uint64(1)) | rc
        lo = (comp & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (comp >> np.uint64(32)).astype(np.uint32)
        nv = jnp.uint32(len(pk))
        s1, _ = bottomk.sketch_step(
            s1, jnp.asarray(pk), jnp.asarray(rc), nv, jnp.uint64(0),
            k=21, seed=0, has_max_hash=False, use_kernel=True)
        s2, _ = bottomk.sketch_step(
            s2, jnp.asarray(lo), jnp.asarray(hi), nv, jnp.uint64(0),
            k=21, seed=0, has_max_hash=False, use_kernel=True,
            composite=True)
    f1, _ = bottomk.flush_state(s1, jnp.uint64(0), k=21, seed=0)
    f2, _ = bottomk.flush_state(s2, jnp.uint64(0), k=21, seed=0)
    for a, b2 in zip(f1[:4], f2[:4]):
        assert np.array_equal(np.asarray(a), np.asarray(b2)), \
            "DIVERGENCE: composite kernel input"
    print("composite kernel input: bit-identical to classic")
    print("validate_tpu OK")


if __name__ == "__main__":
    main()
