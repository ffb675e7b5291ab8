// finch_tpu native host layer.
//
// TPU-native re-design of the host-side duties that the reference implements
// in Rust (finch-rs): FASTA/FASTQ(.gz) parsing + base normalization +
// canonical k-mer enumeration (behavioral contract of needletail 0.5.0 as
// used by /root/reference/lib/src/sketch_schemes/mash.rs:67-80), plus a
// scalar MurmurHash3_x64_128 oracle (contract of the murmurhash3 crate used
// at /root/reference/lib/src/sketch_schemes/hashing.rs:9-12).
//
// Design: this layer turns ragged genomic records into dense, fixed-width
// arrays of 2-bit-packed canonical k-mer codes — the ideal input layout for
// the TPU hash + bottom-k pipeline. All per-byte branchy work happens here;
// all wide data-parallel work (hashing, sorting, top-k, set intersection)
// happens on the device.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

// ---------------------------------------------------------------------------
// MurmurHash3_x64_128 (public-domain algorithm by Austin Appleby), scalar.
// Matches the murmurhash3 Rust crate's x64_128 with a u64 seed:
// h1 = h2 = seed. finch keeps only h1 (hashing.rs:10-12).
// ---------------------------------------------------------------------------

static inline uint64_t rotl64(uint64_t x, int8_t r) {
  return (x << r) | (x >> (64 - r));
}

static inline uint64_t fmix64(uint64_t k) {
  k ^= k >> 33;
  k *= 0xff51afd7ed558ccdULL;
  k ^= k >> 33;
  k *= 0xc4ceb9fe1a85ec53ULL;
  k ^= k >> 33;
  return k;
}

static inline uint64_t load_le64(const uint8_t* p) {
  uint64_t v;
  memcpy(&v, p, 8);  // little-endian hosts only (x86/ARM LE)
  return v;
}

extern "C" void fn_murmur3_x64_128(const uint8_t* key, uint64_t len,
                                   uint64_t seed, uint64_t* out2) {
  const uint64_t c1 = 0x87c37b91114253d5ULL;
  const uint64_t c2 = 0x4cf5ad432745937fULL;
  uint64_t h1 = seed, h2 = seed;
  const uint64_t nblocks = len / 16;
  for (uint64_t i = 0; i < nblocks; i++) {
    uint64_t k1 = load_le64(key + 16 * i);
    uint64_t k2 = load_le64(key + 16 * i + 8);
    k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
    h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729ULL;
    k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
    h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5ULL;
  }
  const uint8_t* tail = key + nblocks * 16;
  uint64_t k1 = 0, k2 = 0;
  switch (len & 15) {
    case 15: k2 ^= uint64_t(tail[14]) << 48; [[fallthrough]];
    case 14: k2 ^= uint64_t(tail[13]) << 40; [[fallthrough]];
    case 13: k2 ^= uint64_t(tail[12]) << 32; [[fallthrough]];
    case 12: k2 ^= uint64_t(tail[11]) << 24; [[fallthrough]];
    case 11: k2 ^= uint64_t(tail[10]) << 16; [[fallthrough]];
    case 10: k2 ^= uint64_t(tail[9]) << 8; [[fallthrough]];
    case 9:  k2 ^= uint64_t(tail[8]);
             k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
             [[fallthrough]];
    case 8:  k1 ^= uint64_t(tail[7]) << 56; [[fallthrough]];
    case 7:  k1 ^= uint64_t(tail[6]) << 48; [[fallthrough]];
    case 6:  k1 ^= uint64_t(tail[5]) << 40; [[fallthrough]];
    case 5:  k1 ^= uint64_t(tail[4]) << 32; [[fallthrough]];
    case 4:  k1 ^= uint64_t(tail[3]) << 24; [[fallthrough]];
    case 3:  k1 ^= uint64_t(tail[2]) << 16; [[fallthrough]];
    case 2:  k1 ^= uint64_t(tail[1]) << 8; [[fallthrough]];
    case 1:  k1 ^= uint64_t(tail[0]);
             k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
  }
  h1 ^= len; h2 ^= len;
  h1 += h2; h2 += h1;
  h1 = fmix64(h1); h2 = fmix64(h2);
  h1 += h2; h2 += h1;
  out2[0] = h1;
  out2[1] = h2;
}

// Hash a batch of equal-length byte keys laid out contiguously.
extern "C" void fn_murmur3_batch(const uint8_t* keys, uint64_t n,
                                 uint32_t keylen, uint64_t seed,
                                 uint64_t* out_h1) {
  uint64_t out2[2];
  for (uint64_t i = 0; i < n; i++) {
    fn_murmur3_x64_128(keys + uint64_t(i) * keylen, keylen, seed, out2);
    out_h1[i] = out2[0];
  }
}

// Decode a 2-bit-packed k-mer code (base 0 in the most-significant position)
// into ASCII bytes. Mapping A=0, C=1, G=2, T=3 (needletail bitkmer order).
static const uint8_t BASE_ASCII[4] = {'A', 'C', 'G', 'T'};

extern "C" void fn_unpack_kmers(const uint64_t* packed, uint64_t n, uint32_t k,
                                uint8_t* out /* n*k bytes */) {
  for (uint64_t i = 0; i < n; i++) {
    uint64_t v = packed[i];
    for (uint32_t j = 0; j < k; j++) {
      out[i * k + (k - 1 - j)] = BASE_ASCII[v & 3];
      v >>= 2;
    }
  }
}

// Hash packed k-mers directly (decode + murmur). CPU reference / fallback
// path; the production path does this on the TPU.
extern "C" void fn_murmur3_packed(const uint64_t* packed, uint64_t n,
                                  uint32_t k, uint64_t seed, uint64_t* out) {
  uint8_t buf[64];
  uint64_t out2[2];
  if (k > 32) return;
  for (uint64_t i = 0; i < n; i++) {
    uint64_t v = packed[i];
    for (uint32_t j = 0; j < k; j++) {
      buf[k - 1 - j] = BASE_ASCII[v & 3];
      v >>= 2;
    }
    fn_murmur3_x64_128(buf, k, seed, out2);
    out[i] = out2[0];
  }
}

// ---------------------------------------------------------------------------
// FASTA/FASTQ(.gz) streaming parser + canonical k-mer extractor.
//
// Behavioral contract (needletail 0.5.0 as consumed by finch):
//  * Format autodetected from the first byte: '>' FASTA, '@' FASTQ
//    (lib.rs:60-75 uses needletail's parse_fastx_reader).
//  * `seq.sequence()` is the raw sequence region: for FASTA it includes
//    internal newlines (multi-line records), for FASTQ it is the sequence
//    line. finch accumulates seq_length from it (mash.rs:72).
//  * normalize(false): a/c/g->upper, t/u/U->'T', whitespace removed,
//    './~'->'-', everything else -> 'N' (needletail sequence normalization).
//  * canonical_kmers(k, rc): windows over the normalized buffer; windows
//    containing non-ACGT are skipped; canonical = lexicographic
//    min(fwd, revcomp); is_rc = (revcomp <= fwd)  (ties -> rc branch).
//
// Emission: 2-bit packed codes (A=0,C=1,G=2,T=3), base 0 in the MSBs so that
// integer comparison == lexicographic byte comparison. k <= 31 on this path.
// ---------------------------------------------------------------------------

enum SrcKind { SRC_GZFILE = 0, SRC_MEM = 1, SRC_MEMGZ = 2 };

struct Source {
  SrcKind kind;
  gzFile gzf;
  // MEM / MEMGZ
  const uint8_t* data;
  uint64_t len;
  uint64_t pos;
  z_stream zs;
  bool z_end;
};

static int64_t src_read(Source* s, uint8_t* dst, uint64_t want) {
  switch (s->kind) {
    case SRC_GZFILE: {
      int r = gzread(s->gzf, dst, (unsigned)want);
      return (int64_t)r;  // <0 on error
    }
    case SRC_MEM: {
      uint64_t n = s->len - s->pos;
      if (n > want) n = want;
      memcpy(dst, s->data + s->pos, n);
      s->pos += n;
      return (int64_t)n;
    }
    case SRC_MEMGZ: {
      if (s->z_end) return 0;
      s->zs.next_out = dst;
      s->zs.avail_out = (uInt)want;
      s->zs.next_in = const_cast<Bytef*>(s->data + s->pos);
      s->zs.avail_in = (uInt)(s->len - s->pos);
      int ret = inflate(&s->zs, Z_NO_FLUSH);
      s->pos = s->len - s->zs.avail_in;
      if (ret == Z_STREAM_END) s->z_end = true;
      else if (ret != Z_OK && ret != Z_BUF_ERROR) return -1;
      return (int64_t)(want - s->zs.avail_out);
    }
  }
  return -1;
}

// Byte classes for normalization + k-mer validity.
//   0..3 : base code (A,C,G,T; lowercase + u/U folded in)
//   4    : skip (whitespace/newlines — removed by normalize)
//   5    : invalid (N, IUPAC, gaps, everything else — breaks k-mer windows)
static uint8_t BYTE_CLASS[256];
static bool byte_class_init_done = false;
static void byte_class_init() {
  if (byte_class_init_done) return;
  for (int i = 0; i < 256; i++) BYTE_CLASS[i] = 5;
  BYTE_CLASS['A'] = BYTE_CLASS['a'] = 0;
  BYTE_CLASS['C'] = BYTE_CLASS['c'] = 1;
  BYTE_CLASS['G'] = BYTE_CLASS['g'] = 2;
  BYTE_CLASS['T'] = BYTE_CLASS['t'] = 3;
  BYTE_CLASS['U'] = BYTE_CLASS['u'] = 3;  // uridine -> thymine
  BYTE_CLASS['\n'] = BYTE_CLASS['\r'] = BYTE_CLASS[' '] = BYTE_CLASS['\t'] = 4;
  byte_class_init_done = true;
}

enum PState {
  P_START = 0,      // before first record: detect format
  P_HEADER,         // inside a header line (after > or @), skip to \n
  P_FASTA_SEQ,      // FASTA sequence region (line starts matter)
  P_FASTQ_SEQ,      // FASTQ sequence line
  P_FASTQ_PLUS,     // '+' separator line
  P_FASTQ_QUAL,     // quality line (consume seq_len bases, ignoring \n rule)
  P_DONE,
};

struct Parser {
  Source src;
  // input buffer
  uint8_t* buf;
  uint64_t cap;
  uint64_t fill;   // valid bytes in buf
  uint64_t cur;    // consume cursor
  bool eof;

  PState state;
  int format;            // 0 unknown, 1 fasta, 2 fastq
  bool at_line_start;    // for FASTA '>' detection

  // rolling k-mer state (within current record)
  uint64_t fwd, rev;
  uint32_t vlen;         // current run of valid bases
  // per-record counters
  uint64_t rec_raw;      // raw sequence-region bytes (incl. internal \n)
  uint64_t rec_trail_ws; // trailing whitespace run (to subtract at rec end)
  uint64_t fq_seq_len;   // FASTQ: bases in seq line
  uint64_t fq_qual_seen; // FASTQ: qual bytes consumed

  // totals (monotonic; snapshot with fn_totals)
  uint64_t total_bases;
  uint64_t total_kmers;
  uint64_t total_records;
  int err;
};

static Parser* parser_new() {
  Parser* p = (Parser*)calloc(1, sizeof(Parser));
  p->cap = 1 << 20;
  p->buf = (uint8_t*)malloc(p->cap);
  p->state = P_START;
  p->at_line_start = true;
  byte_class_init();
  return p;
}

extern "C" void* fn_open_path(const char* path, int* err) {
  *err = 0;
  gzFile f = gzopen(path, "rb");
  if (!f) { *err = 2; return nullptr; }  // no such file
  Parser* p = parser_new();
  p->src.kind = SRC_GZFILE;
  p->src.gzf = f;
  return p;
}

extern "C" void* fn_open_bytes(const uint8_t* data, uint64_t len, int* err) {
  *err = 0;
  Parser* p = parser_new();
  if (len >= 2 && data[0] == 0x1f && data[1] == 0x8b) {
    p->src.kind = SRC_MEMGZ;
    p->src.data = data;
    p->src.len = len;
    memset(&p->src.zs, 0, sizeof(z_stream));
    if (inflateInit2(&p->src.zs, 15 + 32) != Z_OK) { *err = 3; free(p->buf); free(p); return nullptr; }
  } else {
    p->src.kind = SRC_MEM;
    p->src.data = data;
    p->src.len = len;
  }
  return p;
}

extern "C" void fn_close(void* h) {
  Parser* p = (Parser*)h;
  if (!p) return;
  if (p->src.kind == SRC_GZFILE && p->src.gzf) gzclose(p->src.gzf);
  if (p->src.kind == SRC_MEMGZ) inflateEnd(&p->src.zs);
  free(p->buf);
  free(p);
}

static bool refill(Parser* p) {
  if (p->eof) return false;
  // compact
  if (p->cur > 0) {
    memmove(p->buf, p->buf + p->cur, p->fill - p->cur);
    p->fill -= p->cur;
    p->cur = 0;
  }
  if (p->fill == p->cap) {  // buffer full without newline — grow
    p->cap *= 2;
    p->buf = (uint8_t*)realloc(p->buf, p->cap);
  }
  int64_t n = src_read(&p->src, p->buf + p->fill, p->cap - p->fill);
  if (n < 0) { p->err = 4; p->eof = true; return false; }
  if (n == 0) { p->eof = true; return false; }
  p->fill += (uint64_t)n;
  return true;
}

// Finish the current record (FASTA at '>' or EOF; FASTQ after qual).
static void end_record(Parser* p) {
  p->total_bases += p->rec_raw - p->rec_trail_ws;
  p->total_records += 1;
  p->rec_raw = 0;
  p->rec_trail_ws = 0;
  p->fwd = p->rev = 0;
  p->vlen = 0;
}

// The extraction core. Returns:
//   1  produced >=1 k-mer and output is full (call again)
//   0  EOF reached, all input consumed
//  -1  error (p->err set): 1=empty/unknown format, 4=read error, 5=bad fastq
//
// canonical != 0: emit canonical codes + is_rc flags (Mash/Scaled schemes).
// canonical == 0: emit forward-strand codes only (AllCounts scheme,
//                 needletail bit_kmers semantics, counts.rs:30).
extern "C" int fn_next_batch(void* h, uint32_t k, int canonical, uint64_t cap,
                             uint64_t* out_kmers, uint8_t* out_rc,
                             uint64_t* n_out, int* format_out) {
  Parser* p = (Parser*)h;
  *n_out = 0;
  if (p->err) { return -1; }
  if (k < 1 || k > 31) { p->err = 6; return -1; }
  const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
  const uint32_t rshift = 2 * (k - 1);
  uint64_t n = 0;

  while (true) {
    if (p->cur >= p->fill) {
      if (!refill(p)) break;  // EOF or error
    }
    // Fast path: bulk-process sequence bytes, span by span. memchr (glibc
    // SIMD) finds the next newline; within a line the inner loop is
    // branch-free (conditional moves + unconditional stores with a
    // predicated index bump). Intra-line whitespace — which normalize
    // REMOVES (the k-mer window spans it) — is rare, so the branchless
    // pass just detects it and redoes the span with exact semantics.
    if (p->state == P_FASTA_SEQ || p->state == P_FASTQ_SEQ) {
      uint64_t i = p->cur;
      const uint64_t end = p->fill;
      uint64_t fwd = p->fwd, rev = p->rev;
      uint32_t vlen = p->vlen;
      uint64_t rec_raw = p->rec_raw, trail = p->rec_trail_ws;
      uint64_t kmers = p->total_kmers;
      bool line_start = p->at_line_start;
      const bool is_fasta = (p->state == P_FASTA_SEQ);

      while (i < end && n < cap) {
        if (is_fasta && line_start && p->buf[i] == '>') {
          // record boundary
          p->fwd = fwd; p->rev = rev; p->vlen = vlen;
          p->rec_raw = rec_raw; p->rec_trail_ws = trail;
          p->total_kmers = kmers;
          end_record(p);
          p->state = P_HEADER;
          p->cur = i + 1;
          p->at_line_start = false;
          goto outer_continue;
        }

        const uint8_t* nlp =
            (const uint8_t*)memchr(p->buf + i, '\n', end - i);
        const uint64_t span_end = nlp ? (uint64_t)(nlp - p->buf) : end;
        const uint64_t budget = cap - n;
        const uint64_t lim =
            (span_end - i > budget) ? i + budget : span_end;

        if (lim > i) {
          const uint64_t save_fwd = fwd, save_rev = rev;
          const uint32_t save_vlen = vlen;
          const uint64_t save_n = n, save_kmers = kmers;
          uint32_t saw_ws = 0;
          for (uint64_t j = i; j < lim; j++) {
            const uint8_t cls = BYTE_CLASS[p->buf[j]];
            saw_ws |= (cls == 4);
            const uint64_t code = cls & 3;
            fwd = ((fwd << 2) | code) & mask;
            rev = (rev >> 2) | ((3 - code) << rshift);
            vlen = (cls < 4) ? vlen + 1 : 0;
            const uint64_t canon = fwd < rev ? fwd : rev;
            out_kmers[n] = canonical ? canon : fwd;
            out_rc[n] = canonical ? (uint8_t)(fwd >= rev) : 0;
            const uint64_t emit = (vlen >= k);
            n += emit;
            kmers += emit;
          }
          if (saw_ws) {
            // exact redo: whitespace is removed by normalization, so the
            // window continues across it and raw/trailing counters differ
            fwd = save_fwd; rev = save_rev; vlen = save_vlen;
            n = save_n; kmers = save_kmers;
            for (uint64_t j = i; j < lim; j++) {
              const uint8_t cls = BYTE_CLASS[p->buf[j]];
              if (cls < 4) {
                rec_raw++; trail = 0;
                fwd = ((fwd << 2) | cls) & mask;
                rev = (rev >> 2) | (uint64_t(3 - cls) << rshift);
                if (++vlen >= k) {
                  if (canonical) {
                    if (fwd < rev) { out_kmers[n] = fwd; out_rc[n] = 0; }
                    else           { out_kmers[n] = rev; out_rc[n] = 1; }
                  } else {
                    out_kmers[n] = fwd; out_rc[n] = 0;
                  }
                  n++; kmers++;
                }
              } else if (cls == 4) {
                rec_raw++; trail++;
              } else {
                rec_raw++; trail = 0;
                vlen = 0;
              }
            }
          } else {
            rec_raw += lim - i;
            trail = 0;
          }
          i = lim;
          line_start = false;
        }

        if (i < span_end) {
          // output budget exhausted mid-line
          break;
        }
        if (nlp != nullptr && i == span_end) {
          if (!is_fasta) {
            // FASTQ sequence line ends
            p->fwd = fwd; p->rev = rev; p->vlen = vlen;
            p->rec_raw = rec_raw; p->rec_trail_ws = trail;
            p->total_kmers = kmers;
            p->fq_seq_len = rec_raw;  // seq line counts no internal ws raw
            p->state = P_FASTQ_PLUS;
            p->cur = i + 1;
            p->at_line_start = true;
            goto outer_continue;
          }
          // FASTA: the newline is whitespace in the raw sequence region
          rec_raw++; trail++;
          i++;
          line_start = true;
        }
      }
      p->fwd = fwd; p->rev = rev; p->vlen = vlen;
      p->rec_raw = rec_raw; p->rec_trail_ws = trail;
      p->total_kmers = kmers;
      p->at_line_start = line_start;
      p->cur = i;
      if (n >= cap) { *n_out = n; *format_out = p->format; return 1; }
      goto outer_continue;
    }

    // Slow path: header/control lines, byte at a time.
    {
      uint8_t b = p->buf[p->cur++];
      switch (p->state) {
        case P_START:
          if (b == '>' && (p->format == 0 || p->format == 1)) {
            p->format = 1; p->state = P_HEADER;
          } else if (b == '@' && (p->format == 0 || p->format == 2)) {
            p->format = 2; p->state = P_HEADER;
          } else if (b == '\n' || b == '\r' || b == ' ' || b == '\t') {
            /* skip leading/inter-record whitespace */
          } else {
            p->err = 1; return -1;
          }
          p->at_line_start = false;
          break;
        case P_HEADER:
          if (b == '\n') {
            p->state = (p->format == 1) ? P_FASTA_SEQ : P_FASTQ_SEQ;
            p->at_line_start = true;
            p->rec_raw = 0; p->rec_trail_ws = 0;
            p->fwd = p->rev = 0; p->vlen = 0;
          }
          break;
        case P_FASTQ_PLUS:
          if (b == '\n') { p->state = P_FASTQ_QUAL; p->fq_qual_seen = 0; }
          break;
        case P_FASTQ_QUAL:
          if (b == '\n') {
            if (p->fq_qual_seen != p->fq_seq_len) { p->err = 5; return -1; }
            end_record(p);
            p->state = P_START;   // expect '@' of the next record
          } else {
            p->fq_qual_seen++;
          }
          break;
        default:
          break;
      }
    }
  outer_continue:;
    if (n >= cap) { *n_out = n; *format_out = p->format; return 1; }
  }

  if (p->err) { return -1; }
  // EOF: close out a trailing record
  if (p->state == P_FASTA_SEQ) {
    end_record(p);
    p->state = P_DONE;
  } else if (p->state == P_FASTQ_QUAL && p->fq_qual_seen == p->fq_seq_len &&
             p->fq_seq_len > 0) {
    // qual line without trailing newline at EOF
    end_record(p);
    p->state = P_DONE;
  } else if (p->state == P_START && p->format == 0) {
    if (p->total_records == 0) { p->err = 1; return -1; }  // empty input
    p->state = P_DONE;
  } else if (p->state == P_START || p->state == P_DONE) {
    p->state = P_DONE;
  } else if (p->state == P_FASTQ_SEQ || p->state == P_FASTQ_PLUS ||
             p->state == P_FASTQ_QUAL) {
    p->err = 5;  // truncated fastq record
    return -1;
  } else if (p->state == P_HEADER) {
    p->err = 5;  // header without sequence at EOF
    return -1;
  }
  *n_out = n;
  *format_out = p->format;
  return (n > 0) ? 1 : 0;
}

extern "C" void fn_totals(void* h, uint64_t* bases, uint64_t* kmers,
                          uint64_t* records) {
  Parser* p = (Parser*)h;
  *bases = p->total_bases;
  *kmers = p->total_kmers;
  *records = p->total_records;
}

extern "C" int fn_error(void* h) { return ((Parser*)h)->err; }
