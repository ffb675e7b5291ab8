""".sk / .json codec — the Mash JSON schema interchange format.

Byte-compatible with serde_json's compact output of the reference's
`MultiSketch`/`JsonSketch` (/root/reference/lib/src/serialization/json.rs):

  * field order: kmer, alphabet, preserveCase, canonical, sketchSize,
    hashType, hashBits, hashSeed, scale, sketches (json.rs:141-158)
  * per-sketch order: name, seqLength, numValidKmers, comment, filters,
    hashes, kmers, counts (json.rs:78-87)
  * hashes serialized as decimal strings of u64 (json.rs:73)
  * on read: missing counts -> 1, extra_count = count / 2 (json.rs:118-129)

Note: the reference serializes `filters` from a Rust HashMap whose iteration
order is randomized per process, so byte-stability across runs only exists
when the filter map is empty (e.g. unfiltered FASTA sketches). We emit the
map in the reference's to_serialized() insertion order
(strandFilter, errFilter, minCopies, maxCopies; filtering.rs:89-108).
"""

from __future__ import annotations

import json
import math
from typing import List

from finch_tpu.core.sketch import (KmerCount, LazyKmerCounts,
                                   Sketch)
from finch_tpu.errors import FinchSchemaError
from finch_tpu.models.params import FilterParams, SketchParams


def format_f64(x: float) -> str:
    """serde_json / ryu-style shortest-roundtrip float formatting.

    Python's repr is also shortest-roundtrip, so the digits agree; only the
    fixed/scientific switch differs in one band. ryu's pretty printer
    (ryu/src/pretty/mod.rs) uses fixed notation for -5 < kk <= 16 where
    kk-1 is the decimal exponent; Python goes scientific from 1e-5 down.
    So values in [1e-5, 1e-4) — e.g. the mash distance of near-identical
    genomes — must be re-expanded to "0.0000ddd". Exponents are printed
    without '+' or zero padding.
    """
    if math.isnan(x) or math.isinf(x):
        return "null"
    r = repr(float(x))
    if "e" in r:
        m, e = r.split("e")
        exp = int(e)
        if exp == -5:  # ryu fixed-notation band that Python prints as e-05
            neg = m.startswith("-")
            digits = m.lstrip("-").replace(".", "")
            return ("-" if neg else "") + "0.0000" + digits
        return f"{m}e{exp}"
    return r


def _jstr(s) -> str:
    return json.dumps(s, ensure_ascii=False, separators=(",", ":"))


# bytes that serialize into a JSON string verbatim (no escapes): printable
# ASCII minus '"' (0x22) and '\' (0x5C). Genomic kmers are pure ACGT, so
# the whole concatenation passes one C-speed scan.
import re

_JSON_VERBATIM = re.compile(rb'\A[ !#-\[\]-~]*\Z')


def _bulk_array_parts(sketch: Sketch):
    """Vectorized hashes/kmers/counts JSON segments for unforced
    lazily-loaded sketches, or None for the general per-element path.

    The per-element path json.dumps's every kmer and forces the lazy
    container into ~n KmerCount objects — at DB scale (10k x 1000) that
    is most of the write time. Byte-identity with the general path is
    pinned by tests."""
    soa = getattr(sketch.hashes, "_soa", None)
    if soa is None:
        return None
    import numpy as np

    h, ks, c, _e = soa
    if callable(ks):
        ks, labels = ks()
        if labels is not None and any(lb is not None for lb in labels):
            # labels don't serialize to .sk, but keep the general path as
            # the single source of truth for exotic inputs
            return None
    n = len(h)
    if n == 0:
        return '"hashes":[]', '"kmers":[]', '"counts":[]'
    if not _JSON_VERBATIM.match(b"".join(ks)):
        return None  # needs real JSON escaping somewhere
    joined_kmers = b'","'.join(ks)
    hashes = '"hashes":["' + '","'.join(h.astype('U20')) + '"]'
    kmers = '"kmers":["' + joined_kmers.decode("ascii") + '"]'
    counts = ('"counts":[' + ",".join(c.astype(np.uint32).astype('U10'))
              + "]")
    return hashes, kmers, counts


def sketch_to_json_obj(sketch: Sketch) -> str:
    """Compact JSON text of one JsonSketch (exact field order)."""
    parts = []
    parts.append('"name":' + _jstr(sketch.name))
    parts.append('"seqLength":' + str(sketch.seq_length))
    parts.append('"numValidKmers":' + str(sketch.num_valid_kmers))
    parts.append('"comment":' + _jstr(sketch.comment))
    filters = sketch.filter_params.to_serialized()
    parts.append('"filters":' + _jstr(filters))
    bulk = _bulk_array_parts(sketch)
    if bulk is not None:
        parts.extend(bulk)
    else:
        parts.append('"hashes":[' + ",".join(
            '"%d"' % kc.hash for kc in sketch.hashes) + "]")
        parts.append('"kmers":[' + ",".join(
            _jstr(kc.kmer.decode("utf-8")) for kc in sketch.hashes) + "]")
        parts.append('"counts":[' + ",".join(
            str(kc.count) for kc in sketch.hashes) + "]")
    return "{" + ",".join(parts) + "}"


def multisketch_to_json_bytes(sketches: List[Sketch]) -> bytes:
    """Compact JSON of the reference's MultiSketch::from_sketches
    (json.rs:199-218)."""
    params = SketchParams.from_sketches(sketches)
    hash_type, hash_bits, hash_seed, scale = params.hash_info()
    parts = []
    parts.append('"kmer":' + str(params.k))
    parts.append('"alphabet":"ACGT"')
    parts.append('"preserveCase":false')
    parts.append('"canonical":true')
    # reference truncates with `expected_size() as u32` (json.rs:211)
    parts.append('"sketchSize":' + str(params.expected_size() & 0xFFFFFFFF))
    parts.append('"hashType":' + _jstr(hash_type))
    parts.append('"hashBits":' + str(hash_bits))
    parts.append('"hashSeed":' + str(hash_seed))
    parts.append('"scale":' + ("null" if scale is None else format_f64(scale)))
    parts.append('"sketches":[' + ",".join(
        sketch_to_json_obj(s) for s in sketches) + "]")
    return ("{" + ",".join(parts) + "}").encode("utf-8")


def multisketch_params_from_json(doc: dict) -> SketchParams:
    """MultiSketch::get_params (json.rs:160-197)."""
    hash_type = doc.get("hashType")
    scale = doc.get("scale")
    kmer = int(doc["kmer"])
    sketch_size = int(doc["sketchSize"])
    hash_seed = int(doc.get("hashSeed", 0))
    if hash_type == "MurmurHash3_x64_128" and scale is None:
        if int(doc.get("hashBits", 64)) != 64:
            raise FinchSchemaError(
                f"Multisketch has incompatible hash size "
                f"({doc.get('hashBits')} != 64)")
        return SketchParams.mash(
            kmers_to_sketch=sketch_size, final_size=sketch_size,
            no_strict=True, kmer_length=kmer, hash_seed=hash_seed)
    if hash_type == "MurmurHash3_x64_128":
        if int(doc.get("hashBits", 64)) != 64:
            raise FinchSchemaError(
                f"Multisketch has incompatible hash size "
                f"({doc.get('hashBits')} != 64)")
        return SketchParams.scaled(
            kmers_to_sketch=sketch_size, kmer_length=kmer,
            scale=float(scale), hash_seed=hash_seed)
    if hash_type == "None":
        return SketchParams.all_counts(kmer_length=kmer)
    raise FinchSchemaError(f"{hash_type} sketch type is not supported")


# bulk-array segment validation (the bytes between '[' and the first
# ']'): compact serde_json output only — anything else (whitespace,
# escapes, surprises) falls back to json.loads. Byte-translate charset
# checks run at memory speed where a regex scan was ~30% of the load.
_NUMERIC_CHARS = b'0123456789",'
_PRINTABLE = bytes(range(0x20, 0x7F))


def _seg_ok(name: bytes, seg: bytes) -> bool:
    if not seg:
        return True  # empty array
    if name == b"hashes":
        # quoted-decimal shape only; anything else (e.g. unquoted ints,
        # which json.loads accepted before this fast path existed) falls
        # back to the general parser. Malformed remnants the charset
        # check can't see are rejected by the numpy decimal parse with
        # the same clean schema error json.loads would have raised.
        return (seg[0:1] == b'"' and seg[-1:] == b'"'
                and seg.translate(None, delete=_NUMERIC_CHARS) == b"")
    if name == b"counts":
        # bare decimals only; quoted counts fall back to json.loads
        return (b'"' not in seg
                and seg.translate(None, delete=_NUMERIC_CHARS) == b"")
    # kmers: outer quotes, no escapes, no control/8-bit bytes, and every
    # '"' accounted for by an element boundary or a '","' separator (so
    # the split is exactly json.loads's element list)
    return (seg[0:1] == b'"' and seg[-1:] == b'"'
            and b"\\" not in seg
            and seg.count(b'"') == 2 * (seg.count(b'","') + 1)
            and seg.translate(None, delete=_PRINTABLE) == b"")


_SEG_KEYS = [b'"hashes":[', b'"kmers":[', b'"counts":[']
_PH_PREFIX = "__finch_seg:"


def _extract_segments(data: bytes):
    """Cut the three bulk arrays out of the document (replacing each with
    a unique placeholder) so json.loads never tokenizes them.

    Sound because an unescaped '"' cannot occur inside any JSON string:
    every find() hit is a real key. A segment that fails its shape regex
    (whitespace, escapes, a ']' inside a string) aborts the fast path
    entirely. Returns (residual bytes, {key: [segment bytes]}) or None.
    """
    segs = {b"hashes": [], b"kmers": [], b"counts": []}
    res = bytearray()
    pos = 0
    while True:
        nxt, which = -1, None
        for kb in _SEG_KEYS:
            i = data.find(kb, pos)
            if i != -1 and (nxt == -1 or i < nxt):
                nxt, which = i, kb
        if nxt == -1:
            res += data[pos:]
            break
        end = data.find(b"]", nxt + len(which))
        if end == -1:
            return None
        name = which[1:-3]
        seg = data[nxt + len(which): end]
        if not _seg_ok(name, seg):
            return None
        ph = f'["{_PH_PREFIX}{name.decode()}:{len(segs[name])}"]'
        segs[name].append(seg)
        res += data[pos:nxt] + which[:-1] + ph.encode()
        pos = end + 1
    return bytes(res), segs


def _segment_for(value, key: str, segs):
    """The extracted segment a placeholder value points at, or None when
    the field held a genuine (non-placeholder) value."""
    if (isinstance(value, list) and len(value) == 1
            and isinstance(value[0], str)
            and value[0].startswith(_PH_PREFIX + key + ":")):
        return segs[key.encode()][int(value[0].rsplit(":", 1)[1])]
    return None


def read_sk_file(data: bytes, path: str = "<bytes>") -> List[Sketch]:
    """Parse a MultiSketch JSON document into Sketch objects
    (json.rs:91-139, 220-238)."""
    segs = None
    fast = _extract_segments(data)
    if fast is not None:
        residual, segs = fast
        try:
            doc = json.loads(residual)
        except json.JSONDecodeError:
            fast, segs = None, None
    if fast is None:
        try:
            doc = json.loads(data)
        except json.JSONDecodeError:
            raise FinchSchemaError(f"Error parsing {path!r}")
    import numpy as np

    sketch_params = multisketch_params_from_json(doc)
    sketches = []
    for js in doc.get("sketches", []):
        hashes = js.get("hashes", [])
        kmers = js.get("kmers")
        counts = js.get("counts")
        # bulk-parse the decimal strings through numpy and defer the
        # KmerCount objects entirely: the distance/device paths only read
        # the SoA views, so a DB load costs array parses, not ~10^7
        # object constructions (LazyKmerCounts materializes on demand
        # with identical missing-count / extra_count=count//2 semantics).
        # When the fast scanner ran, the bulk fields are raw byte
        # segments: numpy parses the split bytes directly and kmers skip
        # the str decode/encode round-trip entirely.
        try:
            seg = segs and _segment_for(hashes, "hashes", segs)
            if seg is not None:
                h_arr = (np.array(seg[1:-1].split(b'","'), dtype=np.uint64)
                         if seg else np.empty(0, dtype=np.uint64))
            else:
                h_arr = (np.array(hashes, dtype=np.uint64) if hashes
                         else np.empty(0, dtype=np.uint64))
            cseg = segs and _segment_for(counts, "counts", segs)
            if cseg is not None:
                counts = (np.array(cseg.split(b","), dtype=np.int64)
                          if cseg else np.empty(0, dtype=np.int64))
            if counts is not None:
                c_arr = np.array(counts, dtype=np.int64)
                # the reference's serde u32 deserialization errors on
                # overflow rather than wrapping (json.rs:122-129);
                # LazyKmerCounts casts to uint32, so reject out-of-range
                if len(c_arr) and (c_arr.min() < 0
                                   or c_arr.max() > 0xFFFFFFFF):
                    raise FinchSchemaError(
                        f"Error parsing {path!r}: count out of u32 range")
                e_arr = c_arr // 2
            else:
                c_arr = np.ones(len(h_arr), dtype=np.int64)
                e_arr = np.zeros(len(h_arr), dtype=np.int64)
        except (ValueError, OverflowError):
            raise FinchSchemaError(f"Error parsing {path!r}")
        kseg = segs and _segment_for(kmers, "kmers", segs)
        if kseg is not None:
            k_list = kseg[1:-1].split(b'","') if kseg else []
        else:
            k_list = ([k.encode("utf-8") for k in kmers]
                      if kmers is not None else [b""] * len(h_arr))
        kmercounts = LazyKmerCounts(h_arr, k_list, c_arr, e_arr)
        filters = js.get("filters") or {}
        filter_params = FilterParams.from_serialized(filters)
        sketches.append(Sketch(
            name=js.get("name", ""),
            seq_length=int(js.get("seqLength") or 0),
            num_valid_kmers=int(js.get("numValidKmers") or 0),
            comment=js.get("comment") or "",
            hashes=kmercounts,
            filter_params=filter_params,
            sketch_params=sketch_params,
        ))
    return sketches
