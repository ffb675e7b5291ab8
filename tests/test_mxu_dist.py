"""Exactness of the MXU Gram-matrix all-vs-all distance engine
(parallel/mxu_dist.py) against the serial closed-form engine
(core/distance.py), including the scaled-tail rule, empty sketches, and
the mesh-sharded range partition."""

import numpy as np
import pytest

from finch_tpu.core.distance import raw_distance_arrays
from finch_tpu.parallel.mxu_dist import (all_pairs_common, all_pairs_stats,
                                         pack_db, sharded_common)


def _random_db(rng, n_sketches, pool_size, max_k, with_empty=True):
    pool = rng.choice(1 << 40, size=pool_size, replace=False).astype(np.uint64)
    sketches = []
    for _ in range(n_sketches):
        k = int(rng.integers(1, max_k))
        sketches.append(np.sort(rng.choice(pool, size=min(k, pool_size),
                                           replace=False)))
    if with_empty:
        sketches.append(np.empty(0, dtype=np.uint64))
    return sketches


def _check_exact(sketches, scale, device_ij=False):
    H, L = pack_db(sketches)
    common, i_m, j_m = all_pairs_stats(H, L, scale=scale,
                                       device_ij=device_ij)
    n = len(sketches)
    for a in range(n):
        assert common[a, a] == len(sketches[a])
        for b in range(n):
            if a == b:
                continue
            cont0, jac0, cm0, tot0 = raw_distance_arrays(
                sketches[a], sketches[b], scale)
            cont = 0.0 if j_m[a, b] == 0 else common[a, b] / j_m[a, b]
            tot = i_m[a, b] - common[a, b] + j_m[a, b]
            jac = 1.0 if tot == 0 else common[a, b] / tot
            assert (cont, jac, common[a, b], tot) == (cont0, jac0, cm0, tot0), \
                (a, b, scale)


@pytest.mark.parametrize("scale", [0.0, 0.01])
@pytest.mark.parametrize("overlap", ["high", "low", "none"])
def test_all_pairs_exact_vs_serial(scale, overlap):
    rng = np.random.default_rng(hash((scale, overlap)) % (2 ** 31))
    pool = {"high": 500, "low": 20_000, "none": 10 ** 6}[overlap]
    sketches = _random_db(rng, 20, pool, 150)
    _check_exact(sketches, scale)


@pytest.mark.parametrize("scale", [0.0, 0.01])
def test_all_pairs_device_ij_branch(scale):
    """device_ij=True routes the i/j phase through the on-device batched
    row merge (dispatched before the Gram fetch); same exact results."""
    rng = np.random.default_rng(hash(("dij", scale)) % (2 ** 31))
    sketches = _random_db(rng, 15, 600, 120)
    _check_exact(sketches, scale, device_ij=True)


def test_all_pairs_duplicate_run_spanning_pages():
    """A hash shared by EVERY sketch makes the longest possible run; with
    a tiny run_block the page-cut logic must still keep runs whole."""
    rng = np.random.default_rng(9)
    sketches = _random_db(rng, 30, 5000, 100, with_empty=False)
    shared = np.uint64(12345)
    sketches = [np.sort(np.unique(np.append(s, shared))) for s in sketches]
    H, L = pack_db(sketches)
    common = all_pairs_common(H, L, run_block=4)
    for a in range(len(sketches)):
        for b in range(len(sketches)):
            if a == b:
                continue
            want = len(np.intersect1d(sketches[a], sketches[b],
                                      assume_unique=True))
            assert common[a, b] == want, (a, b)


def test_all_pairs_identical_sketches():
    rng = np.random.default_rng(2)
    s = np.sort(rng.choice(1 << 40, size=80, replace=False).astype(np.uint64))
    H, L = pack_db([s, s.copy(), s.copy()])
    common = all_pairs_common(H, L)
    assert (common == 80).all()


def test_sharded_common_matches_unsharded():
    import jax
    from jax.sharding import Mesh

    rng = np.random.default_rng(31)
    sketches = _random_db(rng, 24, 800, 120)
    H, L = pack_db(sketches)
    want = all_pairs_common(H, L)
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("d",))
    got = sharded_common(H, L, mesh)
    assert np.array_equal(got, want)


def test_below_counts_device_matches_host():
    from finch_tpu.parallel.mxu_dist import (_below_counts,
                                             below_counts_device)

    rng = np.random.default_rng(44)
    sketches = _random_db(rng, 30, 4000, 120)
    H, L = pack_db(sketches)
    maxima = np.array(
        [H[i, L[i] - 1] if L[i] else np.uint64(0) for i in range(len(L))],
        dtype=np.uint64)
    # include duplicate and equal-to-element thresholds
    thresholds = np.concatenate([maxima, maxima[:3],
                                 H[0, : min(4, L[0])].astype(np.uint64)])
    want = _below_counts(H, L, thresholds, side="right")
    got = below_counts_device(H, L, thresholds)
    assert np.array_equal(got, want)


def test_all_pairs_common_u16_fetch_exact_at_full_overlap():
    """The u16 result fetch must stay exact when common counts hit their
    maximum (identical sketches: common == padded length)."""
    import numpy as np

    from finch_tpu.parallel.mxu_dist import all_pairs_common, pack_db

    rng = np.random.default_rng(4)
    hs = np.sort(rng.choice(1 << 50, size=300,
                            replace=False).astype(np.uint64))
    H, L = pack_db([hs, hs.copy(), hs[:150]])
    common = all_pairs_common(H, L)
    assert common[0, 1] == 300 and common[1, 0] == 300
    assert common[0, 2] == 150
    assert common[0, 0] == 300 and common[2, 2] == 150


def test_all_pairs_survivors_matches_full_path():
    """Device-compacted survivors must reproduce the full-matrix
    candidate stats exactly (same c/i/j integers, ref-major order),
    with and without the scaled-tail rule."""
    import numpy as np

    from finch_tpu.parallel.mxu_dist import (all_pairs_stats,
                                             all_pairs_survivors,
                                             candidate_mask_consts,
                                             pack_db)

    rng = np.random.default_rng(9)
    pool = rng.choice(1 << 50, size=300, replace=False).astype(np.uint64)
    dbs = [np.sort(rng.choice(pool, size=80, replace=False))
           for _ in range(12)]
    dbs.append(np.empty(0, dtype=np.uint64))  # empty sketch edge
    H, L = pack_db(dbs)
    k = 21.0
    for scale in (0.0, 2e-14):
        for d in (0.05, 0.3, 0.9):
            surv = all_pairs_survivors(H, L, scale, k, d)
            assert surv is not None
            iq, jr, c, i_v, j_v = surv
            common, i_m, j_m = all_pairs_stats(H, L, scale=scale)
            # rebuild the same conservative mask on host (shared consts)
            j_min_lo, eps = candidate_mask_consts(k, d)
            total32 = (i_m - common + j_m).astype(np.int32)
            keep = (common.astype(np.float32)
                    >= total32.astype(np.float32) * j_min_lo - eps)
            np.fill_diagonal(keep, False)
            jr_w, iq_w = np.nonzero(keep.T)
            assert np.array_equal(iq, iq_w) and np.array_equal(jr, jr_w)
            assert np.array_equal(c, common[iq_w, jr_w])
            assert np.array_equal(i_v, i_m[iq_w, jr_w])
            assert np.array_equal(j_v, j_m[iq_w, jr_w])


def test_all_pairs_survivors_contract_fallbacks():
    import numpy as np

    from finch_tpu.parallel.mxu_dist import all_pairs_survivors, pack_db

    rng = np.random.default_rng(10)
    H, L = pack_db([np.sort(rng.choice(1 << 40, size=8).astype(np.uint64))
                    for _ in range(3)])
    # max_distance >= 1 keeps everything: no survivor advantage
    assert all_pairs_survivors(H, L, 0.0, 21.0, 1.0) is None
    # single sketch: nothing to pair
    H1, L1 = pack_db([np.arange(4, dtype=np.uint64)])
    assert all_pairs_survivors(H1, L1, 0.0, 21.0, 0.5) is None


def test_all_pairs_survivors_int8_gram(monkeypatch):
    """Survivors compaction over the int8-MXU Gram accumulation path."""
    import numpy as np

    from finch_tpu.parallel import mxu_dist as mx

    rng = np.random.default_rng(14)
    pool = rng.choice(1 << 50, size=200, replace=False).astype(np.uint64)
    dbs = [np.sort(rng.choice(pool, size=60, replace=False))
           for _ in range(10)]
    H, L = mx.pack_db(dbs)
    want = mx.all_pairs_survivors(H, L, 0.0, 21.0, 0.2)
    monkeypatch.setattr(mx, "GRAM_INT8", True)
    got = mx.all_pairs_survivors(H, L, 0.0, 21.0, 0.2)
    assert want is not None and got is not None
    for a, b in zip(want, got):
        assert np.array_equal(a, b)
