"""Fused Pallas kernel: murmur3 + prefilter + in-kernel survivor compaction.

Replaces the XLA pipeline's (hash pass + stage-1 transposed sort + stage-2
survivor sort) for the warm path. Per 64k-lane chunk staged through VMEM,
the kernel:

  1. decodes v = (packed << 1 | is_rc) lanes from (lo, hi) u32 pairs,
  2. hashes every k-mer with the pair-arithmetic MurmurHash3_x64_128
     (finch's hash_f contract, hashing.rs:10-12 — bit-exact),
  3. masks lanes whose hash exceeds the admission threshold,
  4. extracts the 8 smallest composites of each 32-lane column with 8
     min-extract rounds (a 5-bit row index is appended to the composite so
     duplicate k-mers stay distinct lanes and counts remain exact); the
     rounds emit an ascending 8-row column,
  5. merges those 8 rows into a column-sorted (ACC_H, CHUNK_W) accumulator
     carried across chunks (one Batcher half-cleaner + a 5-stage bitonic
     merge network — ~90 compare-exchanges on (1, CHUNK_W) row vectors,
     ~35 u32 ops/lane, small next to the ~400-op hash),
  6. after the last chunk, writes the accumulator (+1 spill encoding;
     u64::MAX when empty) and an overflow flag that is set if any column
     held more than ROWS_OUT survivors in one chunk OR the accumulator
     half-cleaner ever dropped a real survivor.

The accumulator is the in-kernel stage-2 compaction: the kernel's candidate
output is a FIXED ACC_H*CHUNK_W entries per call (64k = b/64 at the 4M
batch) instead of the per-chunk slab's b/4, so the caller's XLA survivor
sort disappears and the paging loop runs 1-2 trips. On overflow (cold state or extreme
survivor density) the caller falls back to the exact XLA sort path, so the
kernel never has to handle unbounded densities. Selection beats an in-VMEM
sort here: 8 rounds of a 5-step pair-min tree is ~80 u32 ops/lane versus
~90 for a 32-deep network, is far simpler, and the hash dominates either
way.

The kernel is gridless (single invocation, internal DMA chunk loop): this
endpoint's Mosaic compiler rejects grid-mode pallas_call ("failed to
legalize func.return"), and a fori_loop of double-buffered async copies is
the equivalent structure. All in-kernel constants are explicit jnp.uint32/
int32 — with jax_enable_x64 on, bare Python ints weak-type to 64-bit and
Mosaic rejects mixed-width arithmetic.

Requires k <= 28 (the composite << 5 row-index encoding needs 2k+7 <= 64
bits); callers gate on that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from finch_tpu.ops.murmur3 import (murmur3_x64_u32_words,
                                   packed_pair_to_u32_words)

try:  # pallas is TPU/interpret-only; degrade gracefully elsewhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

U32 = jnp.uint32
U32_MAX = np.uint32(0xFFFFFFFF)

import os

# column height: survivors selected per COLH-lane column. Exactness holds
# for any value (a column with more than ROWS_OUT survivors trips the
# overflow flag -> exact XLA fallback); larger COLH shrinks the candidate
# output (b * ROWS_OUT/COLH) and therefore the stage-2 sort, at the cost
# of one more bit of row-index encoding (k <= (63 - log2(COLH))//2) and
# more frequent fallback on duplicate-dense streams. ROWS_OUT must stay a
# multiple of 8 (Mosaic (8,128) tiling alignment on the output DMA).
COLH = int(os.environ.get("FINCH_TPU_KERNEL_COLH", "32"))
ROWS_OUT = 8
ROW_BITS = (COLH - 1).bit_length()
CHUNK_W = 2048  # lanes per chunk = COLH * CHUNK_W
# cross-chunk accumulator height: each CHUNK_W-lane column keeps the ACC_H
# smallest survivors across ALL chunks of the batch; a real survivor pushed
# out of the accumulator trips the overflow flag (-> exact XLA fallback).
# At steady state survivor density is ~capacity/total-seen, so a column's
# Poisson mean is far below ACC_H after a handful of batches. Must be a
# power of two >= 2*ROWS_OUT and a multiple of 8 (output tiling).
ACC_H = int(os.environ.get("FINCH_TPU_KERNEL_ACCH", "32"))

# weighted (duplicate-absorbing) accumulator: each chunk's slab heads that
# already sit in the accumulator add to a weight plane instead of
# occupying fresh rows, so duplicate bursts never overflow the
# accumulator and the whole batch stays on tier A (one kernel, one paging
# pass). FINCH_TPU_ABSORB=0 compiles the round-3 unweighted accumulator
# instead (kill switch / A/B knob); k > 25 always uses the unweighted
# form (the spill encoding's weight field needs >= 12 bits, matching
# supports_dedup's bound).
ABSORB = os.environ.get("FINCH_TPU_ABSORB", "1") != "0"


def supports_weighted(k: int) -> bool:
    """Weighted-accumulator precondition: the (weight << (2k+2)) spill
    field must hold a worst-case in-column run total (same >= 12-bit
    bound as supports_dedup)."""
    return 64 - (2 * k + 2) >= 12

# the merge networks and DMA tilings assume these shapes; a bad env
# override must fail at import, not corrupt results silently (e.g. a
# non-power-of-two ACC_H breaks the bitonic stages' i^d tile locality
# and survivors can vanish without setting any overflow flag)
if COLH < 8 or (COLH & (COLH - 1)) or COLH % 8:
    raise ValueError("FINCH_TPU_KERNEL_COLH must be a power of two >= 8")
if (ACC_H < 2 * ROWS_OUT or (ACC_H & (ACC_H - 1)) or ACC_H % 8):
    raise ValueError(
        "FINCH_TPU_KERNEL_ACCH must be a power of two >= 2*ROWS_OUT "
        "and a multiple of 8")


def _pair_min_rows(ehi, elo):
    """Lexicographic (hi, lo) minimum over axis 0 via a binary tree."""
    while ehi.shape[0] > 1:
        half = ehi.shape[0] // 2
        ah, al = ehi[:half], elo[:half]
        bh, bl = ehi[half:], elo[half:]
        lt = (ah < bh) | ((ah == bh) & (al <= bl))
        ehi = jnp.where(lt, ah, bh)
        elo = jnp.where(lt, al, bl)
    return ehi, elo


def _lex_lt(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al <= bl))


def _extract_kernel(k: int, seed: int, nchunks: int, weighted: bool,
                    thi_ref, tlo_ref, vlo_hbm, vhi_hbm,
                    out_lo_hbm, out_hi_hbm, slab_lo_hbm, slab_hi_hbm,
                    hash_lo_hbm, hash_hi_hbm, ovf_ref):
    th = thi_ref[0, 0]
    tl = tlo_ref[0, 0]

    def body(slo, shi, nlo, nhi, alo, ahi, awt, ghlo, ghhi,
             sem_in, sem_o0, sem_o1, sem_h0, sem_h1):
        def start_in(ci, slot):
            off = ci * jnp.int32(COLH)
            pltpu.make_async_copy(
                vlo_hbm.at[pl.ds(off, COLH), :], slo.at[slot], sem_in.at[slot, jnp.int32(0)]).start()
            pltpu.make_async_copy(
                vhi_hbm.at[pl.ds(off, COLH), :], shi.at[slot], sem_in.at[slot, jnp.int32(1)]).start()

        def wait_in(ci, slot):
            off = ci * jnp.int32(COLH)
            pltpu.make_async_copy(
                vlo_hbm.at[pl.ds(off, COLH), :], slo.at[slot], sem_in.at[slot, jnp.int32(0)]).wait()
            pltpu.make_async_copy(
                vhi_hbm.at[pl.ds(off, COLH), :], shi.at[slot], sem_in.at[slot, jnp.int32(1)]).wait()

        start_in(jnp.int32(0), jnp.int32(0))
        alo[...] = jnp.full((ACC_H, CHUNK_W), U32_MAX, jnp.uint32)
        ahi[...] = jnp.full((ACC_H, CHUNK_W), U32_MAX, jnp.uint32)
        if weighted:
            awt[...] = jnp.zeros((ACC_H, CHUNK_W), jnp.uint32)

        def chunk(ci, carry):
            covf, aovf = carry
            slot = jax.lax.rem(ci, jnp.int32(2))
            nslot = jax.lax.rem(ci + jnp.int32(1), jnp.int32(2))
            wait_in(ci, slot)

            @pl.when(ci + jnp.int32(1) < jnp.int32(nchunks))
            def _():
                start_in(ci + jnp.int32(1), nslot)

            vlo = slo[slot]
            vhi = shi[slot]
            is_pad = (vhi == U32_MAX) & (vlo == U32_MAX)
            plo = (vlo >> U32(1)) | (vhi << U32(31))
            phi = vhi >> U32(1)
            words = packed_pair_to_u32_words(plo, phi, k)
            hlo, hhi = murmur3_x64_u32_words(words, k, seed)
            keep = ((hhi < th) | ((hhi == th) & (hlo <= tl))) & (~is_pad)

            # full hash planes out: tier C (both selection tiers
            # overflowed) re-selects in XLA without re-hashing — the
            # murmur is ~80% of this kernel's arithmetic. Two VMEM stores
            # per lane + an overlapped 256 KB DMA per chunk.
            ghlo[...] = hlo
            ghhi[...] = hhi
            ho = ci * jnp.int32(COLH)
            ch0 = pltpu.make_async_copy(
                ghlo, hash_lo_hbm.at[pl.ds(ho, COLH), :], sem_h0)
            ch1 = pltpu.make_async_copy(
                ghhi, hash_hi_hbm.at[pl.ds(ho, COLH), :], sem_h1)
            ch0.start()
            ch1.start()
            ch0.wait()
            ch1.wait()

            row = jax.lax.broadcasted_iota(jnp.uint32, (COLH, CHUNK_W), 0)
            rb = U32(ROW_BITS)
            rbc = U32(32 - ROW_BITS)
            elo = (vlo << rb) | row
            ehi = (vhi << rb) | (vlo >> rbc)
            elo = jnp.where(keep, elo, U32_MAX)
            ehi = jnp.where(keep, ehi, U32_MAX)

            # 8 min-extract rounds, written in REVERSED row order so the
            # scratch slab reads back descending — exactly the orientation
            # the Batcher half-cleaner needs against the ascending
            # accumulator tail.
            for r in range(ROWS_OUT):
                mhi, mlo = _pair_min_rows(ehi, elo)
                sent = (mhi == U32_MAX) & (mlo == U32_MAX)
                clo = (mlo >> rb) | (mhi << rbc)
                chi = mhi >> rb
                comp_lo = clo + U32(1)
                carry = (comp_lo == U32(0)).astype(jnp.uint32)
                comp_hi = chi + carry
                nlo[ROWS_OUT - 1 - r, :] = jnp.where(sent, U32_MAX, comp_lo)[0]
                nhi[ROWS_OUT - 1 - r, :] = jnp.where(sent, U32_MAX, comp_hi)[0]
                eq = (elo == mlo) & (ehi == mhi)
                elo = jnp.where(eq, U32_MAX, elo)
                ehi = jnp.where(eq, U32_MAX, ehi)

            m9h, m9l = _pair_min_rows(ehi, elo)
            # jnp.any lowers through f64 in this Mosaic version; use an
            # int32 max reduction instead
            remain = (~((m9h == U32_MAX) & (m9l == U32_MAX))).astype(
                jnp.int32)
            covf = covf | jnp.max(remain)

            # per-chunk slab out (tier B): exact whenever no column had
            # more than ROWS_OUT survivors in a chunk, even when the
            # cross-chunk accumulator overflows (duplicate-heavy streams).
            # The waits are immediate — the 64 KB copies are trivially
            # cheap next to the hash, and nlo/nhi are reused next chunk.
            so = ci * jnp.int32(ROWS_OUT)
            cs0 = pltpu.make_async_copy(
                nlo, slab_lo_hbm.at[pl.ds(so, ROWS_OUT), :], sem_o0)
            cs1 = pltpu.make_async_copy(
                nhi, slab_hi_hbm.at[pl.ds(so, ROWS_OUT), :], sem_o1)
            cs0.start()
            cs1.start()
            cs0.wait()
            cs1.wait()

            # ---- cross-chunk accumulator merge (in-kernel compaction) ----
            # Value-resident: read the accumulator ONCE, run the half-
            # cleaner + the full bitonic merge network on values (ref
            # round-trips per stage measurably slow the kernel), write
            # back once.
            bl, bh = nlo[...], nhi[...]
            x_l = alo[...]
            x_h = ahi[...]
            if weighted:
                # ---- duplicate-absorbing pre-pass (weighted mode) ----
                # Invariant: the accumulator's real entries are pairwise
                # DISTINCT composites (established below by induction), so
                # a slab lane matches at most one accumulator row and
                # merge-network ties can only pair pads (weight 0) — the
                # per-side non-strict comparators below stay weight-safe.
                x_w = awt[...]
                # (1) absorb: every slab lane whose composite already sits
                # in the accumulator adds 1 to that entry's weight plane
                # and leaves the slab (in-slab copies of an absorbed value
                # each add 1 — counts stay exact). Full ROWS_OUT x ACC_H
                # bipartite equality coverage via ROWS_OUT sublane
                # rotations of the slab against the tiled accumulator —
                # no sub-8-row extraction (Mosaic tiling hazard).
                absorbed = jnp.zeros((ROWS_OUT, CHUNK_W), jnp.uint32)
                for s in range(ROWS_OUT):
                    # roll(x, s)[i] = x[(i - s) mod ROWS_OUT]: acc row i
                    # compares against slab row (i - s) mod ROWS_OUT
                    rl = pltpu.roll(bl, jnp.int32(s), 0)
                    rh = pltpu.roll(bh, jnp.int32(s), 0)
                    t_l = jnp.concatenate([rl] * (ACC_H // ROWS_OUT), 0)
                    t_h = jnp.concatenate([rh] * (ACC_H // ROWS_OUT), 0)
                    eq = ((x_h == t_h) & (x_l == t_l)
                          & ~((t_h == U32_MAX) & (t_l == U32_MAX)))
                    x_w = x_w + eq.astype(jnp.uint32)
                    # fold the ACC_H/ROWS_OUT row-groups (identical slab
                    # pairing per i mod ROWS_OUT), rotate back to slab
                    # row order (e row p holds slab row (p - s) mod R)
                    e = eq.astype(jnp.uint32)
                    while e.shape[0] > ROWS_OUT:
                        h2 = e.shape[0] // 2
                        e = e[:h2, :] | e[h2:, :]
                    absorbed = absorbed | pltpu.roll(
                        e, jnp.int32((ROWS_OUT - s) % ROWS_OUT), 0)
                ab = absorbed != U32(0)
                was_pad = (bh == U32_MAX) & (bl == U32_MAX)
                bw = jnp.where(ab | was_pad, U32(0), U32(1))
                bh = jnp.where(ab, U32_MAX, bh)
                bl = jnp.where(ab, U32_MAX, bl)
                # (2) collapse in-slab duplicate runs into weighted heads.
                # The slab is descending by composite, so copies of one
                # value are consecutive; absorption vacates whole runs
                # (all copies of a value match the accumulator or none
                # do), so surviving runs stay hole-free and adjacent.
                dd = 1
                while dd < ROWS_OUT:
                    sh_ = _shift_up(bh, dd, U32_MAX)
                    sl_ = _shift_up(bl, dd, U32_MAX)
                    sw_ = _shift_up(bw, dd, U32(0))
                    same = ((sh_ == bh) & (sl_ == bl)
                            & ~((bh == U32_MAX) & (bl == U32_MAX)))
                    bw = bw + jnp.where(same, sw_, U32(0))
                    dd <<= 1
                ph_ = _shift_down(bh, 1, U32_MAX)
                pl_ = _shift_down(bl, 1, U32_MAX)
                isreal = ~((bh == U32_MAX) & (bl == U32_MAX))
                drop = isreal & (ph_ == bh) & (pl_ == bl)
                bh = jnp.where(drop, U32_MAX, bh)
                bl = jnp.where(drop, U32_MAX, bl)
                bw = jnp.where(drop, U32(0), bw)
                # (3) restore the descending row order the half-cleaner
                # needs (absorb/collapse punched MAX holes): ascending
                # sort of the complemented planes == descending on values
                # with pads (MAX -> 0 complemented) floating to the front.
                ch_, cl_, bw = _bitonic_sort3(
                    bh ^ U32_MAX, bl ^ U32_MAX, bw)
                bh = ch_ ^ U32_MAX
                bl = cl_ ^ U32_MAX
            # Half-cleaner: acc tail rows (ascending) vs the descending new
            # slab. Mins stay (the ACC_H smallest of acc ∪ new as a bitonic
            # column sequence); any real value in the maxes means a survivor
            # fell out of the accumulator -> overflow.
            tl_lo = x_l[ACC_H - ROWS_OUT:, :]
            tl_hi = x_h[ACC_H - ROWS_OUT:, :]
            lt = _lex_lt(tl_hi, tl_lo, bh, bl)
            hi_drop_h = jnp.where(lt, bh, tl_hi)
            hi_drop_l = jnp.where(lt, bl, tl_lo)
            dropped = (~((hi_drop_h == U32_MAX)
                         & (hi_drop_l == U32_MAX))).astype(jnp.int32)
            aovf = aovf | jnp.max(dropped)
            if weighted:
                x_w = jnp.concatenate(
                    [x_w[:ACC_H - ROWS_OUT, :],
                     jnp.where(lt, x_w[ACC_H - ROWS_OUT:, :], bw)], 0)
            x_l = jnp.concatenate(
                [x_l[:ACC_H - ROWS_OUT, :], jnp.where(lt, tl_lo, bl)], 0)
            x_h = jnp.concatenate(
                [x_h[:ACC_H - ROWS_OUT, :], jnp.where(lt, tl_hi, bh)], 0)

            # Bitonic merge network over the ACC_H bitonic column sequence:
            # group-aligned stages as slab ops, sub-group stages via a
            # sublane-roll partner exchange inside each 8-row tile.
            d = ACC_H // 2
            while d >= 8:
                pl_, ph_, pw_ = [], [], []
                for base in range(0, ACC_H, 2 * d):
                    a_l = x_l[base:base + d, :]
                    a_h = x_h[base:base + d, :]
                    b_l = x_l[base + d:base + 2 * d, :]
                    b_h = x_h[base + d:base + 2 * d, :]
                    lt = _lex_lt(a_h, a_l, b_h, b_l)
                    pl_ += [jnp.where(lt, a_l, b_l), jnp.where(lt, b_l, a_l)]
                    ph_ += [jnp.where(lt, a_h, b_h), jnp.where(lt, b_h, a_h)]
                    if weighted:
                        a_w = x_w[base:base + d, :]
                        b_w = x_w[base + d:base + 2 * d, :]
                        pw_ += [jnp.where(lt, a_w, b_w),
                                jnp.where(lt, b_w, a_w)]
                x_l = jnp.concatenate(pl_, 0)
                x_h = jnp.concatenate(ph_, 0)
                if weighted:
                    x_w = jnp.concatenate(pw_, 0)
                d //= 2
            while d >= 1:
                bit = (jax.lax.broadcasted_iota(
                    jnp.uint32, (ACC_H, CHUNK_W), 0) & U32(d)) != U32(0)
                # shifts as explicit i32: bare ints weak-type to i64 under
                # jax_enable_x64 and Mosaic rejects the rotate. The roll
                # partner is within each 8-row tile: d < 8 and ACC_H is a
                # multiple of 8, so rolling the full array by d with
                # stride... per-8-row semantics require the roll inside
                # tiles; roll the full (ACC_H, W) array only when the
                # permutation is tile-local (it is: i^d stays in its 8-row
                # group for d < 8, and the group-crossing wrap lanes are
                # never selected).
                p_l = jnp.where(bit, pltpu.roll(x_l, jnp.int32(d), 0),
                                pltpu.roll(x_l, jnp.int32(ACC_H - d), 0))
                p_h = jnp.where(bit, pltpu.roll(x_h, jnp.int32(d), 0),
                                pltpu.roll(x_h, jnp.int32(ACC_H - d), 0))
                lt = _lex_lt(x_h, x_l, p_h, p_l)
                # keep min where this row is the low partner (bit==0),
                # max where it is the high partner. Per-side evaluation
                # makes ties inconsistent across the pair, which is safe
                # for values (equal either way) and for weights (ties are
                # only pad-vs-pad under the distinctness invariant).
                take_self = lt ^ bit
                if weighted:
                    p_w = jnp.where(bit, pltpu.roll(x_w, jnp.int32(d), 0),
                                    pltpu.roll(x_w, jnp.int32(ACC_H - d),
                                               0))
                    x_w = jnp.where(take_self, x_w, p_w)
                x_l = jnp.where(take_self, x_l, p_l)
                x_h = jnp.where(take_self, x_h, p_h)
                d //= 2
            alo[...] = x_l
            ahi[...] = x_h
            if weighted:
                awt[...] = x_w
            return covf, aovf

        covf, aovf = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nchunks), chunk,
            (jnp.int32(0), jnp.int32(0)))
        if weighted:
            # fold weight - 1 into the spill encoding's top bits (the
            # same (w << (2k+2)) | (composite+1) form tiers B/D/D2 emit
            # and _flush decodes); a count that would not fit the field
            # trips aovf -> the exact D2/D/B fallback chain re-counts.
            wshift = 2 * k + 2
            wbits = 64 - wshift
            w = awt[...]
            real = ~((ahi[...] == U32_MAX) & (alo[...] == U32_MAX))
            wm1 = jnp.where(real & (w > U32(0)), w - U32(1), U32(0))
            if wbits < 32:
                wbig = (wm1 >> U32(wbits)) != U32(0)
                aovf = aovf | jnp.max(wbig.astype(jnp.int32))
            if wshift >= 32:
                add_lo = jnp.zeros_like(wm1)
                add_hi = wm1 << U32(wshift - 32)
            else:
                add_lo = wm1 << U32(wshift)
                add_hi = wm1 >> U32(32 - wshift)
            o_l = alo[...] + add_lo
            carry = (o_l < add_lo).astype(jnp.uint32)
            o_h = ahi[...] + add_hi + carry
            alo[...] = jnp.where(real, o_l, U32_MAX)
            ahi[...] = jnp.where(real, o_h, U32_MAX)
        ovf_ref[0, 0] = covf
        ovf_ref[0, 1] = aovf
        cout0 = pltpu.make_async_copy(alo, out_lo_hbm, sem_o0)
        cout1 = pltpu.make_async_copy(ahi, out_hi_hbm, sem_o1)
        cout0.start()
        cout1.start()
        cout0.wait()
        cout1.wait()

    pl.run_scoped(
        body,
        slo=pltpu.VMEM((2, COLH, CHUNK_W), jnp.uint32),
        shi=pltpu.VMEM((2, COLH, CHUNK_W), jnp.uint32),
        nlo=pltpu.VMEM((ROWS_OUT, CHUNK_W), jnp.uint32),
        nhi=pltpu.VMEM((ROWS_OUT, CHUNK_W), jnp.uint32),
        alo=pltpu.VMEM((ACC_H, CHUNK_W), jnp.uint32),
        ahi=pltpu.VMEM((ACC_H, CHUNK_W), jnp.uint32),
        awt=pltpu.VMEM((ACC_H, CHUNK_W), jnp.uint32),
        ghlo=pltpu.VMEM((COLH, CHUNK_W), jnp.uint32),
        ghhi=pltpu.VMEM((COLH, CHUNK_W), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA((2, 2)),
        sem_o0=pltpu.SemaphoreType.DMA,
        sem_o1=pltpu.SemaphoreType.DMA,
        sem_h0=pltpu.SemaphoreType.DMA,
        sem_h1=pltpu.SemaphoreType.DMA,
    )


# ---------------------------------------------------------------------------
# duplicate-burst dedup kernel (tier D)
#
# When the main kernel's selection tiers overflow (duplicate-heavy
# streams: chunk columns with more than ROWS_OUT survivors, or the
# accumulator dropping survivors), the XLA fallback pays a global sort +
# a survivor-entry paging loop per batch. This kernel instead re-selects
# every survivor per chunk from the SAVED hash planes (no re-hash, no
# per-column extract bound) and carries a weighted accumulator: each
# chunk's survivors merge into a (DUP_ACC_H, CHUNK_W) column store via a
# full bitonic sort, equal composites collapse into summed counts
# (duplicates across chunks land in the same column and become adjacent
# once sorted), and the final output is one spill-encoded weighted head
# per distinct composite — the same (weight << (2k+2)) | (composite+1)
# encoding the flush already decodes (ops/bottomk.py _flush /
# _aggregate_runs). Exact iff its overflow flag stays 0: a column whose
# distinct-survivor + fresh-hole count exceeds DUP_ACC_H drops a real
# head and trips the flag (the caller falls back to tier B/C).
# ---------------------------------------------------------------------------

# 96 (not 32) so randomly-SCATTERED duplicate bursts stay on the dedup
# tiers: copies of one value land in ~61 distinct columns per batch at
# the bench's steady state (cap 200k, 64x dup, 4M batch), so per-column
# weighted heads need ~61+4.5-sigma rows — 32 overflowed every step and
# the shuffle stream fell to tier B's global sorts (BENCH r5: 0.38 G).
# Need not be a power of two itself: the bitonic sort3 requires the
# WORKING row count (DUP_ACC_H + staged rows) to be one — supports_dedup
# and supports_dedup_slab gate on that (96 + 32 = 128 for both tiers).
DUP_ACC_H = int(os.environ.get("FINCH_TPU_KERNEL_DUPACCH", "96"))
if (DUP_ACC_H < 8 or DUP_ACC_H % 8 or DUP_ACC_H < COLH // 2):
    raise ValueError(
        "FINCH_TPU_KERNEL_DUPACCH must be a multiple of 8 >= max(8, COLH/2)")

# dedup kernels run per lane WINDOW: columns are independent, so the
# (DUP_ACC_H + staged)-row bitonic working set only needs DUP_W lanes
# resident at a time. At the full CHUNK_W=2048 the 128-row working set
# needs ~33 MB of scoped VMEM (>16 MB limit, BENCH r5 compile OOM);
# 512-lane windows fit with ~2x headroom at identical total arithmetic.
DUP_W = int(os.environ.get("FINCH_TPU_KERNEL_DUPW", "512"))
if DUP_W < 128 or DUP_W % 128 or CHUNK_W % DUP_W:
    raise ValueError(
        "FINCH_TPU_KERNEL_DUPW must be a multiple of 128 dividing CHUNK_W")


def _lex_lt_strict(ah, al, bh, bl):
    """Strict (hi, lo) less-than: ties return False on BOTH sides of a
    compare-exchange, so the pair swaps consistently and the weight plane
    is permuted without loss (a tie-true comparator would make both rows
    'keep self' for values while the weights cross)."""
    return (ah < bh) | ((ah == bh) & (al < bl))


def _shift_up(x, d: int, fill):
    """x[i] <- x[i+d] along axis 0 (rows shifted toward 0), tail filled.
    d >= 8 is always a multiple of 8 here (doubling), so the slab slice
    stays sublane-tile aligned; d < 8 goes through a roll + iota mask."""
    n = x.shape[0]
    if d >= 8:
        return jnp.concatenate(
            [x[d:, :], jnp.full((d, x.shape[1]), fill, x.dtype)], 0)
    iota = jax.lax.broadcasted_iota(jnp.uint32, x.shape, 0)
    r = pltpu.roll(x, jnp.int32(n - d), 0)
    return jnp.where(iota < U32(n - d), r, fill)


def _shift_down(x, d: int, fill):
    """x[i] <- x[i-d] along axis 0, head filled."""
    n = x.shape[0]
    if d >= 8:
        return jnp.concatenate(
            [jnp.full((d, x.shape[1]), fill, x.dtype), x[: n - d, :]], 0)
    iota = jax.lax.broadcasted_iota(jnp.uint32, x.shape, 0)
    r = pltpu.roll(x, jnp.int32(d), 0)
    return jnp.where(iota >= U32(d), r, fill)


def _bitonic_sort3(x_h, x_l, x_w):
    """Full ascending bitonic sort of the rows of (hi, lo) with the
    weight plane permuted alongside. Row count must be a power of two.

    Group-aligned distances (>= 8) run as slab compare-exchanges with the
    block direction baked into the slab order; sub-8 distances use
    sublane rolls with iota masks (the i^d partner stays inside its 8-row
    tile for d < 8, matching the main kernel's merge network)."""
    n = x_h.shape[0]
    m = n.bit_length() - 1
    for p in range(1, m + 1):           # sorted-block size 2^p
        for q in range(p, 0, -1):       # partner distance 2^(q-1)
            d = 1 << (q - 1)
            if d >= 8:
                ph, pl_, pw = [], [], []
                for base in range(0, n, 2 * d):
                    up = ((base >> p) & 1) == 0
                    a_h = x_h[base:base + d, :]
                    a_l = x_l[base:base + d, :]
                    a_w = x_w[base:base + d, :]
                    b_h = x_h[base + d:base + 2 * d, :]
                    b_l = x_l[base + d:base + 2 * d, :]
                    b_w = x_w[base + d:base + 2 * d, :]
                    lt = _lex_lt_strict(a_h, a_l, b_h, b_l)
                    first = lt if up else ~lt
                    ph += [jnp.where(first, a_h, b_h),
                           jnp.where(first, b_h, a_h)]
                    pl_ += [jnp.where(first, a_l, b_l),
                            jnp.where(first, b_l, a_l)]
                    pw += [jnp.where(first, a_w, b_w),
                           jnp.where(first, b_w, a_w)]
                x_h = jnp.concatenate(ph, 0)
                x_l = jnp.concatenate(pl_, 0)
                x_w = jnp.concatenate(pw, 0)
            else:
                iota = jax.lax.broadcasted_iota(
                    jnp.uint32, (n, x_h.shape[1]), 0)
                self_high = (iota & U32(d)) != U32(0)
                up = (iota & U32(1 << p)) == U32(0)
                p_h = jnp.where(self_high,
                                pltpu.roll(x_h, jnp.int32(d), 0),
                                pltpu.roll(x_h, jnp.int32(n - d), 0))
                p_l = jnp.where(self_high,
                                pltpu.roll(x_l, jnp.int32(d), 0),
                                pltpu.roll(x_l, jnp.int32(n - d), 0))
                p_w = jnp.where(self_high,
                                pltpu.roll(x_w, jnp.int32(d), 0),
                                pltpu.roll(x_w, jnp.int32(n - d), 0))
                # both rows of a pair must see the SAME comparison value
                # (le(low, high)) or ties would duplicate one side's
                # weight plane: evaluate it in canonical (low, high)
                # operand order on each side. Combined with AND/OR mask
                # logic, NOT a bool-valued jnp.where: Mosaic lowers a
                # select whose *branches* are i1 vectors through an i8
                # materialization + trunci i8->i1, which it rejects at
                # this (64, 2048) shape ("Unsupported target bitwidth
                # for truncation", BENCH_r03).
                lt_sp = _lex_lt_strict(x_h, x_l, p_h, p_l)
                lt_ps = _lex_lt_strict(p_h, p_l, x_h, x_l)
                le = (self_high & ~lt_sp) | (~self_high & ~lt_ps)
                take_self = le ^ ~up
                x_h = jnp.where(take_self, x_h, p_h)
                x_l = jnp.where(take_self, x_l, p_l)
                x_w = jnp.where(take_self, x_w, p_w)
    return x_h, x_l, x_w


def _dedup_kernel(k: int, seed: int, nchunks: int, wshift: int, W: int,
                  thi_ref, tlo_ref, vlo_hbm, vhi_hbm, hlo_hbm, hhi_hbm,
                  out_lo_hbm, out_hi_hbm, ovf_ref):
    th = thi_ref[0, 0]
    tl = tlo_ref[0, 0]
    A = DUP_ACC_H
    W2 = A + COLH  # working rows per chunk merge

    def body(slo, shi, sh0, sh1, alo, ahi, aw, sem_in, sem_o0, sem_o1):
        def start_in(ci, slot):
            off = ci * jnp.int32(COLH)
            pltpu.make_async_copy(
                vlo_hbm.at[pl.ds(off, COLH), :], slo.at[slot],
                sem_in.at[slot, jnp.int32(0)]).start()
            pltpu.make_async_copy(
                vhi_hbm.at[pl.ds(off, COLH), :], shi.at[slot],
                sem_in.at[slot, jnp.int32(1)]).start()
            pltpu.make_async_copy(
                hlo_hbm.at[pl.ds(off, COLH), :], sh0.at[slot],
                sem_in.at[slot, jnp.int32(2)]).start()
            pltpu.make_async_copy(
                hhi_hbm.at[pl.ds(off, COLH), :], sh1.at[slot],
                sem_in.at[slot, jnp.int32(3)]).start()

        def wait_in(ci, slot):
            off = ci * jnp.int32(COLH)
            pltpu.make_async_copy(
                vlo_hbm.at[pl.ds(off, COLH), :], slo.at[slot],
                sem_in.at[slot, jnp.int32(0)]).wait()
            pltpu.make_async_copy(
                vhi_hbm.at[pl.ds(off, COLH), :], shi.at[slot],
                sem_in.at[slot, jnp.int32(1)]).wait()
            pltpu.make_async_copy(
                hlo_hbm.at[pl.ds(off, COLH), :], sh0.at[slot],
                sem_in.at[slot, jnp.int32(2)]).wait()
            pltpu.make_async_copy(
                hhi_hbm.at[pl.ds(off, COLH), :], sh1.at[slot],
                sem_in.at[slot, jnp.int32(3)]).wait()

        start_in(jnp.int32(0), jnp.int32(0))
        alo[...] = jnp.full((A, W), U32_MAX, jnp.uint32)
        ahi[...] = jnp.full((A, W), U32_MAX, jnp.uint32)
        aw[...] = jnp.zeros((A, W), jnp.uint32)

        def chunk(ci, dovf):
            slot = jax.lax.rem(ci, jnp.int32(2))
            nslot = jax.lax.rem(ci + jnp.int32(1), jnp.int32(2))
            wait_in(ci, slot)

            @pl.when(ci + jnp.int32(1) < jnp.int32(nchunks))
            def _():
                start_in(ci + jnp.int32(1), nslot)

            vlo = slo[slot]
            vhi = shi[slot]
            hlo = sh0[slot]
            hhi = sh1[slot]
            is_pad = (vhi == U32_MAX) & (vlo == U32_MAX)
            keep = ((hhi < th) | ((hhi == th) & (hlo <= tl))) & (~is_pad)
            # +1 spill encoding on the (hi, lo) pair
            clo = vlo + U32(1)
            chi = vhi + (clo == U32(0)).astype(jnp.uint32)
            clo = jnp.where(keep, clo, U32_MAX)
            chi = jnp.where(keep, chi, U32_MAX)
            cw = jnp.where(keep, U32(1), U32(0))  # occurrence counts

            x_h = jnp.concatenate([ahi[...], chi], 0)
            x_l = jnp.concatenate([alo[...], clo], 0)
            x_w = jnp.concatenate([aw[...], cw], 0)
            x_h, x_l, x_w = _bitonic_sort3(x_h, x_l, x_w)

            # segmented run-count sum: values are sorted, so equality at
            # distance d means same run; count doubling gives each row the
            # sum of its run suffix, and the run head (first row of the
            # run) ends with the full total
            d = 1
            while d < W2:
                nh = _shift_up(x_h, d, U32_MAX)
                nl = _shift_up(x_l, d, U32_MAX)
                nw = _shift_up(x_w, d, U32(0))
                same = (nh == x_h) & (nl == x_l) & (
                    ~((x_h == U32_MAX) & (x_l == U32_MAX)))
                x_w = x_w + jnp.where(same, nw, U32(0))
                d <<= 1
            ph = _shift_down(x_h, 1, U32_MAX)
            pl2 = _shift_down(x_l, 1, U32_MAX)
            real = ~((x_h == U32_MAX) & (x_l == U32_MAX))
            head = real & ~((ph == x_h) & (pl2 == x_l))
            x_h = jnp.where(head, x_h, U32_MAX)
            x_l = jnp.where(head, x_l, U32_MAX)
            x_w = jnp.where(head, x_w, U32(0))

            # a real head above the kept window is a lost survivor; a
            # count that would not fit the weight field is a lost count
            top_real = (~((x_h[A:, :] == U32_MAX)
                          & (x_l[A:, :] == U32_MAX))).astype(jnp.int32)
            dovf = dovf | jnp.max(top_real)
            if 64 - wshift < 32:
                wbig = (x_w >= (U32(1) << U32(64 - wshift))).astype(
                    jnp.int32)
                dovf = dovf | jnp.max(wbig)
            alo[...] = x_l[:A, :]
            ahi[...] = x_h[:A, :]
            aw[...] = x_w[:A, :]
            return dovf

        dovf = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), chunk,
                                 jnp.int32(0))
        ovf_ref[0, 0] = dovf
        ovf_ref[0, 1] = jnp.int32(0)

        # fold weight - 1 into the spill encoding's top bits
        w = aw[...]
        real = ~((ahi[...] == U32_MAX) & (alo[...] == U32_MAX))
        wm1 = jnp.where(real & (w > U32(0)), w - U32(1), U32(0))
        if wshift >= 32:
            add_lo = jnp.zeros_like(wm1)
            add_hi = wm1 << U32(wshift - 32)
        else:
            add_lo = wm1 << U32(wshift)
            add_hi = wm1 >> U32(32 - wshift)
        o_l = alo[...] + add_lo
        carry = (o_l < add_lo).astype(jnp.uint32)
        o_h = ahi[...] + add_hi + carry
        alo[...] = jnp.where(real, o_l, U32_MAX)
        ahi[...] = jnp.where(real, o_h, U32_MAX)
        c0 = pltpu.make_async_copy(alo, out_lo_hbm, sem_o0)
        c1 = pltpu.make_async_copy(ahi, out_hi_hbm, sem_o1)
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()

    pl.run_scoped(
        body,
        slo=pltpu.VMEM((2, COLH, W), jnp.uint32),
        shi=pltpu.VMEM((2, COLH, W), jnp.uint32),
        sh0=pltpu.VMEM((2, COLH, W), jnp.uint32),
        sh1=pltpu.VMEM((2, COLH, W), jnp.uint32),
        alo=pltpu.VMEM((DUP_ACC_H, W), jnp.uint32),
        ahi=pltpu.VMEM((DUP_ACC_H, W), jnp.uint32),
        aw=pltpu.VMEM((DUP_ACC_H, W), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA((2, 4)),
        sem_o0=pltpu.SemaphoreType.DMA,
        sem_o1=pltpu.SemaphoreType.DMA,
    )


# ---------------------------------------------------------------------------
# slab-dedup kernel (tier D2): the steady-state duplicate-burst fast path
#
# When no chunk column exceeded ROWS_OUT survivors (covf == 0 — true at
# steady state even on a 64x-duplicate burst, where survivors are ~2-3
# lanes per column-chunk), the main kernel's per-chunk SLAB already
# contains every survivor as spill-encoded composites. Tier D2 collapses
# duplicates straight from the slab: it stages DUP_GROUP chunks' slab
# rows (DUP_GROUP * ROWS_OUT rows, already in HBM — no value/hash plane
# re-read, no threshold, no murmur), concatenates the weighted
# accumulator, and runs ONE bitonic sort3 + segmented run-sum per group.
# Same output encoding and paging as tier D at ~1/6th the arithmetic
# (ablation r4: the full-plane dedup kernel costs 2.4 ms/step at b=4M;
# the slab holds b/4 entries and sorts in A+GROUP*8-row working sets).
# Exact iff d2ovf == 0: a column whose weighted heads exceed DUP_ACC_H
# rows after a group merge, or a count outgrowing the weight field,
# trips the flag and the caller falls back to tier D.
# ---------------------------------------------------------------------------

DUP_GROUP = 4  # chunks staged per sort3; W2 = DUP_ACC_H + GROUP*ROWS_OUT


def _dedup_slab_kernel(nchunks: int, wshift: int, W: int,
                       slab_lo_hbm, slab_hi_hbm,
                       out_lo_hbm, out_hi_hbm, ovf_ref):
    A = DUP_ACC_H
    G = DUP_GROUP * ROWS_OUT  # staged slab rows per group
    ngroups = nchunks // DUP_GROUP

    def body(slo, shi, alo, ahi, aw, sem_in, sem_o0, sem_o1):
        def start_in(gi, slot):
            off = gi * jnp.int32(G)
            pltpu.make_async_copy(
                slab_lo_hbm.at[pl.ds(off, G), :], slo.at[slot],
                sem_in.at[slot, jnp.int32(0)]).start()
            pltpu.make_async_copy(
                slab_hi_hbm.at[pl.ds(off, G), :], shi.at[slot],
                sem_in.at[slot, jnp.int32(1)]).start()

        def wait_in(gi, slot):
            off = gi * jnp.int32(G)
            pltpu.make_async_copy(
                slab_lo_hbm.at[pl.ds(off, G), :], slo.at[slot],
                sem_in.at[slot, jnp.int32(0)]).wait()
            pltpu.make_async_copy(
                slab_hi_hbm.at[pl.ds(off, G), :], shi.at[slot],
                sem_in.at[slot, jnp.int32(1)]).wait()

        start_in(jnp.int32(0), jnp.int32(0))
        alo[...] = jnp.full((A, W), U32_MAX, jnp.uint32)
        ahi[...] = jnp.full((A, W), U32_MAX, jnp.uint32)
        aw[...] = jnp.zeros((A, W), jnp.uint32)

        def group(gi, dovf):
            slot = jax.lax.rem(gi, jnp.int32(2))
            nslot = jax.lax.rem(gi + jnp.int32(1), jnp.int32(2))
            wait_in(gi, slot)

            @pl.when(gi + jnp.int32(1) < jnp.int32(ngroups))
            def _():
                start_in(gi + jnp.int32(1), nslot)

            clo = slo[slot]
            chi = shi[slot]
            # slab rows are already spill-encoded (composite + 1, pads
            # U64_MAX); row order within a chunk is descending but the
            # full sort makes order irrelevant
            real_new = ~((chi == U32_MAX) & (clo == U32_MAX))
            cw = real_new.astype(jnp.uint32)

            W2 = A + G
            x_h = jnp.concatenate([ahi[...], chi], 0)
            x_l = jnp.concatenate([alo[...], clo], 0)
            x_w = jnp.concatenate([aw[...], cw], 0)
            x_h, x_l, x_w = _bitonic_sort3(x_h, x_l, x_w)

            # segmented run-count sum + head selection (identical to
            # tier D's collapse; runs here are <= DUP_GROUP slab copies
            # + 1 accumulator head, but pathological in-chunk duplicates
            # can chain longer, so run the full doubling scan)
            d = 1
            while d < W2:
                nh = _shift_up(x_h, d, U32_MAX)
                nl = _shift_up(x_l, d, U32_MAX)
                nw = _shift_up(x_w, d, U32(0))
                same = (nh == x_h) & (nl == x_l) & (
                    ~((x_h == U32_MAX) & (x_l == U32_MAX)))
                x_w = x_w + jnp.where(same, nw, U32(0))
                d <<= 1
            ph = _shift_down(x_h, 1, U32_MAX)
            pl2 = _shift_down(x_l, 1, U32_MAX)
            real = ~((x_h == U32_MAX) & (x_l == U32_MAX))
            head = real & ~((ph == x_h) & (pl2 == x_l))
            x_h = jnp.where(head, x_h, U32_MAX)
            x_l = jnp.where(head, x_l, U32_MAX)
            x_w = jnp.where(head, x_w, U32(0))

            top_real = (~((x_h[A:, :] == U32_MAX)
                          & (x_l[A:, :] == U32_MAX))).astype(jnp.int32)
            dovf = dovf | jnp.max(top_real)
            if 64 - wshift < 32:
                wbig = (x_w >= (U32(1) << U32(64 - wshift))).astype(
                    jnp.int32)
                dovf = dovf | jnp.max(wbig)
            alo[...] = x_l[:A, :]
            ahi[...] = x_h[:A, :]
            aw[...] = x_w[:A, :]
            return dovf

        dovf = jax.lax.fori_loop(jnp.int32(0), jnp.int32(ngroups), group,
                                 jnp.int32(0))
        ovf_ref[0, 0] = dovf
        ovf_ref[0, 1] = jnp.int32(0)

        # fold weight - 1 into the spill encoding's top bits (same
        # emission as tier D — the flush decodes count = weight + 1)
        w = aw[...]
        real = ~((ahi[...] == U32_MAX) & (alo[...] == U32_MAX))
        wm1 = jnp.where(real & (w > U32(0)), w - U32(1), U32(0))
        if wshift >= 32:
            add_lo = jnp.zeros_like(wm1)
            add_hi = wm1 << U32(wshift - 32)
        else:
            add_lo = wm1 << U32(wshift)
            add_hi = wm1 >> U32(32 - wshift)
        o_l = alo[...] + add_lo
        carry = (o_l < add_lo).astype(jnp.uint32)
        o_h = ahi[...] + add_hi + carry
        alo[...] = jnp.where(real, o_l, U32_MAX)
        ahi[...] = jnp.where(real, o_h, U32_MAX)
        c0 = pltpu.make_async_copy(alo, out_lo_hbm, sem_o0)
        c1 = pltpu.make_async_copy(ahi, out_hi_hbm, sem_o1)
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()

    pl.run_scoped(
        body,
        slo=pltpu.VMEM((2, DUP_GROUP * ROWS_OUT, W), jnp.uint32),
        shi=pltpu.VMEM((2, DUP_GROUP * ROWS_OUT, W), jnp.uint32),
        alo=pltpu.VMEM((DUP_ACC_H, W), jnp.uint32),
        ahi=pltpu.VMEM((DUP_ACC_H, W), jnp.uint32),
        aw=pltpu.VMEM((DUP_ACC_H, W), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA((2, 2)),
        sem_o0=pltpu.SemaphoreType.DMA,
        sem_o1=pltpu.SemaphoreType.DMA,
    )


def supports_dedup_slab(k: int, b: int) -> bool:
    """Tier-D2 preconditions: tier-D's weight-field bound, chunk count
    divisible by the staging group, pow2 working rows."""
    if not supports_dedup(k, b):
        return False
    nchunks = b // (COLH * CHUNK_W)
    n = DUP_ACC_H + DUP_GROUP * ROWS_OUT
    return nchunks % DUP_GROUP == 0 and (n & (n - 1)) == 0


@partial(jax.jit, static_argnames=("k", "interpret"))
def dedup_slab_candidates(slab, *, k: int, interpret: bool = False):
    """Weighted dedup over the main kernel's per-chunk slab (tier D2).

    slab: u64[(nchunks*ROWS_OUT)*CHUNK_W] spill-encoded composite+1
    survivors from extract_candidates (exhaustive iff covf == 0).
    Returns (cand u64[DUP_ACC_H*CHUNK_W] spill-encoded weighted heads,
    d2ovf i32). Exact iff the caller's covf == 0 AND d2ovf == 0.

    Runs as CHUNK_W/DUP_W lane-window kernel invocations (columns are
    independent; the full-width working set exceeds scoped VMEM at
    DUP_ACC_H=96 — see the DUP_W note above)."""
    slab_lo = slab.astype(jnp.uint32)
    slab_hi = (slab >> jnp.uint64(32)).astype(jnp.uint32)
    rows = slab_lo.shape[0] // CHUNK_W
    nchunks = rows // ROWS_OUT
    wshift = 2 * k + 2
    kern = partial(_dedup_slab_kernel, nchunks, wshift, DUP_W)
    call = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((DUP_ACC_H, DUP_W), jnp.uint32),
            jax.ShapeDtypeStruct((DUP_ACC_H, DUP_W), jnp.uint32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    sl = slab_lo.reshape(rows, CHUNK_W)
    sh = slab_hi.reshape(rows, CHUNK_W)
    los, his = [], []
    ovf = jnp.int32(0)
    for w0 in range(0, CHUNK_W, DUP_W):
        out_lo, out_hi, o = call(sl[:, w0:w0 + DUP_W],
                                 sh[:, w0:w0 + DUP_W])
        los.append(out_lo)
        his.append(out_hi)
        ovf = ovf | o[0, 0]
    out_lo = jnp.concatenate(los, axis=1)
    out_hi = jnp.concatenate(his, axis=1)
    cand = ((out_hi.astype(jnp.uint64) << jnp.uint64(32))
            | out_lo.astype(jnp.uint64)).ravel()
    return cand, ovf


def supports_dedup(k: int, b: int) -> bool:
    """Tier-D preconditions: the spill weight field must hold the worst
    in-batch run total (COLH per column per chunk x nchunks), and the
    working row count must be a power of two."""
    if not (HAVE_PALLAS and b % (COLH * CHUNK_W) == 0
            and b >= COLH * CHUNK_W):
        return False
    wshift = 2 * k + 2
    wbits = 64 - wshift
    if wbits < 12:
        return False
    n = DUP_ACC_H + COLH
    return (n & (n - 1)) == 0


@partial(jax.jit, static_argnames=("k", "seed", "interpret"))
def dedup_candidates(vlo, vhi, hash_lo, hash_hi, thresh_hi, thresh_lo, *,
                     k: int, seed: int, interpret: bool = False):
    """Weighted dedup re-selection over the main kernel's saved planes.

    Returns (cand u64[DUP_ACC_H*CHUNK_W] spill-encoded weighted heads,
    dovf i32). Exact iff dovf == 0."""
    b = vlo.shape[0]
    nchunks = b // (COLH * CHUNK_W)
    wshift = 2 * k + 2
    kern = partial(_dedup_kernel, k, seed, nchunks, wshift, DUP_W)
    call = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((DUP_ACC_H, DUP_W), jnp.uint32),
            jax.ShapeDtypeStruct((DUP_ACC_H, DUP_W), jnp.uint32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    th = thresh_hi.reshape(1, 1).astype(jnp.uint32)
    tl = thresh_lo.reshape(1, 1).astype(jnp.uint32)
    vl = vlo.reshape(nchunks * COLH, CHUNK_W)
    vh = vhi.reshape(nchunks * COLH, CHUNK_W)
    hl = hash_lo.reshape(nchunks * COLH, CHUNK_W)
    hh = hash_hi.reshape(nchunks * COLH, CHUNK_W)
    los, his = [], []
    ovf = jnp.int32(0)
    for w0 in range(0, CHUNK_W, DUP_W):
        out_lo, out_hi, o = call(
            th, tl, vl[:, w0:w0 + DUP_W], vh[:, w0:w0 + DUP_W],
            hl[:, w0:w0 + DUP_W], hh[:, w0:w0 + DUP_W])
        los.append(out_lo)
        his.append(out_hi)
        ovf = ovf | o[0, 0]
    out_lo = jnp.concatenate(los, axis=1)
    out_hi = jnp.concatenate(his, axis=1)
    cand = ((out_hi.astype(jnp.uint64) << jnp.uint64(32))
            | out_lo.astype(jnp.uint64)).ravel()
    return cand, ovf


def supports(k: int, b: int) -> bool:
    """Kernel preconditions: row-index encoding fits, chunking divides.

    The bound is STRICT (2k+1+ROW_BITS < 64, k <= 28 at COLH=32): with
    zero headroom the maximal composite ((packed all-ones, is_rc=1) in
    the last row) encodes to exactly u64::MAX and aliases the
    empty-lane sentinel — a silent survivor drop with no overflow flag.
    Canonicalization happens to make that lane unreachable today, but
    the kernel must not rely on an upstream invariant it cannot see."""
    return (HAVE_PALLAS and 2 * k + 1 + ROW_BITS < 64
            and b % (COLH * CHUNK_W) == 0 and b >= COLH * CHUNK_W)


def extract_candidates(vlo, vhi, thresh_hi, thresh_lo, *, k: int,
                       seed: int, interpret: bool = False,
                       weighted: bool | None = None):
    """Run the fused kernel over b = vlo.size lanes.

    Thin wrapper resolving the weighted (duplicate-absorbing) default
    OUTSIDE the jit cache so the FINCH_TPU_ABSORB env flag is always part
    of the key. See _extract_candidates."""
    if weighted is None:
        weighted = ABSORB and supports_weighted(k)
    return _extract_candidates(vlo, vhi, thresh_hi, thresh_lo, k=k,
                               seed=seed, interpret=interpret,
                               weighted=weighted)


@partial(jax.jit, static_argnames=("k", "seed", "interpret", "weighted"))
def _extract_candidates(vlo, vhi, thresh_hi, thresh_lo, *, k: int,
                        seed: int, interpret: bool = False,
                        weighted: bool = False):
    """Run the fused kernel over b = vlo.size lanes.

    vlo/vhi: u32[b] halves of v = packed<<1|is_rc (u64::MAX lanes = padding).
    Returns (cand, slab, hash_lo, hash_hi, chunk_ovf, acc_ovf):
      cand u64[ACC_H*CHUNK_W] — the whole batch's survivors compacted by
        the cross-chunk accumulator (spill-encoded composites; weighted
        mode emits one (weight << (2k+2)) | (composite+1) head per
        distinct composite instead of one entry per occurrence); exact
        iff chunk_ovf == 0 AND acc_ovf == 0 (a chunk-column overflow
        loses survivors before the accumulator ever sees them),
      slab u64[nchunks*ROWS_OUT*CHUNK_W] — the per-chunk 8-extract rows
        (always RAW unweighted composites, so tiers B/D2 are unaffected
        by the weighted-accumulator mode); exact iff chunk_ovf == 0,
      hash_lo/hash_hi u32[b] — every lane's murmur halves, so the tier-C
        XLA fallback selects without re-hashing,
      chunk_ovf/acc_ovf i32 flags.
    """
    b = vlo.shape[0]
    nchunks = b // (COLH * CHUNK_W)
    kern = partial(_extract_kernel, k, seed, nchunks, weighted)
    out_lo, out_hi, slab_lo, slab_hi, h_lo, h_hi, ovf = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((ACC_H, CHUNK_W), jnp.uint32),
            jax.ShapeDtypeStruct((ACC_H, CHUNK_W), jnp.uint32),
            jax.ShapeDtypeStruct((nchunks * ROWS_OUT, CHUNK_W), jnp.uint32),
            jax.ShapeDtypeStruct((nchunks * ROWS_OUT, CHUNK_W), jnp.uint32),
            jax.ShapeDtypeStruct((nchunks * COLH, CHUNK_W), jnp.uint32),
            jax.ShapeDtypeStruct((nchunks * COLH, CHUNK_W), jnp.uint32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(thresh_hi.reshape(1, 1).astype(jnp.uint32),
      thresh_lo.reshape(1, 1).astype(jnp.uint32),
      vlo.reshape(nchunks * COLH, CHUNK_W),
      vhi.reshape(nchunks * COLH, CHUNK_W))
    cand = ((out_hi.astype(jnp.uint64) << jnp.uint64(32))
            | out_lo.astype(jnp.uint64)).ravel()
    slab = ((slab_hi.astype(jnp.uint64) << jnp.uint64(32))
            | slab_lo.astype(jnp.uint64)).ravel()
    return (cand, slab, h_lo.ravel(), h_hi.ravel(),
            ovf[0, 0], ovf[0, 1])
