"""Fused Pallas kernel: murmur3 + threshold prefilter + survivor selection.

Replaces the XLA pipeline's (hash pass + stage-1 transposed sort) for the
warm path. Per 64k-lane chunk staged through VMEM, the kernel:

  1. decodes v = (packed << 1 | is_rc) lanes from (lo, hi) u32 pairs,
  2. hashes every k-mer with the pair-arithmetic MurmurHash3_x64_128
     (finch's hash_f contract, hashing.rs:10-12 — bit-exact),
  3. masks lanes whose hash exceeds the admission threshold,
  4. extracts the 8 smallest composites of each 32-lane column with 8
     min-extract rounds (a 5-bit row index is appended to the composite so
     duplicate k-mers stay distinct lanes and counts remain exact),
  5. writes the extracted composites (+1, spill encoding; u64::MAX when
     empty) and an overflow flag that is set if any column still holds a
     survivor after 8 extractions.

On overflow (cold state or extreme survivor density) the caller falls back
to the exact XLA sort path, so the kernel never has to handle unbounded
densities. Selection beats an in-VMEM sort here: 8 rounds of a 5-step
pair-min tree is ~80 u32 ops/lane versus ~90 for a 32-deep network, is far
simpler, and the hash (~400 ops/lane) dominates either way.

The kernel is gridless (single invocation, internal DMA chunk loop): this
endpoint's Mosaic compiler rejects grid-mode pallas_call ("failed to
legalize func.return"), and a fori_loop of double-buffered async copies is
the equivalent structure. All in-kernel constants are explicit jnp.uint32/
int32 — with jax_enable_x64 on, bare Python ints weak-type to 64-bit and
Mosaic rejects mixed-width arithmetic.

Requires k <= 29 (the composite << 5 row-index encoding needs 2k+7 <= 64
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


def _extract_kernel(k: int, seed: int, nchunks: int,
                    thi_ref, tlo_ref, vlo_hbm, vhi_hbm,
                    out_lo_hbm, out_hi_hbm, ovf_ref):
    th = thi_ref[0, 0]
    tl = tlo_ref[0, 0]

    def body(slo, shi, olo, ohi, sem_in, sem_o0, sem_o1):
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

        def chunk(ci, ovf):
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

            row = jax.lax.broadcasted_iota(jnp.uint32, (COLH, CHUNK_W), 0)
            rb = U32(ROW_BITS)
            rbc = U32(32 - ROW_BITS)
            elo = (vlo << rb) | row
            ehi = (vhi << rb) | (vlo >> rbc)
            elo = jnp.where(keep, elo, U32_MAX)
            ehi = jnp.where(keep, ehi, U32_MAX)

            for r in range(ROWS_OUT):
                mhi, mlo = _pair_min_rows(ehi, elo)
                sent = (mhi == U32_MAX) & (mlo == U32_MAX)
                clo = (mlo >> rb) | (mhi << rbc)
                chi = mhi >> rb
                comp_lo = clo + U32(1)
                carry = (comp_lo == U32(0)).astype(jnp.uint32)
                comp_hi = chi + carry
                olo[r, :] = jnp.where(sent, U32_MAX, comp_lo)[0]
                ohi[r, :] = jnp.where(sent, U32_MAX, comp_hi)[0]
                eq = (elo == mlo) & (ehi == mhi)
                elo = jnp.where(eq, U32_MAX, elo)
                ehi = jnp.where(eq, U32_MAX, ehi)

            m9h, m9l = _pair_min_rows(ehi, elo)
            # jnp.any lowers through f64 in this Mosaic version; use an
            # int32 max reduction instead
            remain = (~((m9h == U32_MAX) & (m9l == U32_MAX))).astype(
                jnp.int32)
            ovf = ovf | jnp.max(remain)

            oo = ci * jnp.int32(ROWS_OUT)
            cout0 = pltpu.make_async_copy(
                olo, out_lo_hbm.at[pl.ds(oo, ROWS_OUT), :], sem_o0)
            cout1 = pltpu.make_async_copy(
                ohi, out_hi_hbm.at[pl.ds(oo, ROWS_OUT), :], sem_o1)
            cout0.start()
            cout1.start()
            cout0.wait()
            cout1.wait()
            return ovf

        ovf = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), chunk,
                                jnp.int32(0))
        ovf_ref[0, 0] = ovf

    pl.run_scoped(
        body,
        slo=pltpu.VMEM((2, COLH, CHUNK_W), jnp.uint32),
        shi=pltpu.VMEM((2, COLH, CHUNK_W), jnp.uint32),
        olo=pltpu.VMEM((ROWS_OUT, CHUNK_W), jnp.uint32),
        ohi=pltpu.VMEM((ROWS_OUT, CHUNK_W), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA((2, 2)),
        sem_o0=pltpu.SemaphoreType.DMA,
        sem_o1=pltpu.SemaphoreType.DMA,
    )


def supports(k: int, b: int) -> bool:
    """Kernel preconditions: row-index encoding fits, chunking divides."""
    return (HAVE_PALLAS and 2 * k + 1 + ROW_BITS <= 64
            and b % (COLH * CHUNK_W) == 0 and b >= COLH * CHUNK_W)


@partial(jax.jit, static_argnames=("k", "seed", "interpret"))
def extract_candidates(vlo, vhi, thresh_hi, thresh_lo, *, k: int,
                       seed: int, interpret: bool = False):
    """Run the fused kernel over b = vlo.size lanes.

    vlo/vhi: u32[b] halves of v = packed<<1|is_rc (u64::MAX lanes = padding).
    Returns (cand u64[b//4] spill-encoded composites, overflow flag i32).
    """
    b = vlo.shape[0]
    nchunks = b // (COLH * CHUNK_W)
    kern = partial(_extract_kernel, k, seed, nchunks)
    out_lo, out_hi, ovf = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((nchunks * ROWS_OUT, CHUNK_W), jnp.uint32),
            jax.ShapeDtypeStruct((nchunks * ROWS_OUT, CHUNK_W), jnp.uint32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
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
    return cand, ovf[0, 0]
