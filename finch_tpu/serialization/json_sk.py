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


def sketch_to_json_obj(sketch: Sketch) -> str:
    """Compact JSON text of one JsonSketch (exact field order)."""
    parts = []
    parts.append('"name":' + _jstr(sketch.name))
    parts.append('"seqLength":' + str(sketch.seq_length))
    parts.append('"numValidKmers":' + str(sketch.num_valid_kmers))
    parts.append('"comment":' + _jstr(sketch.comment))
    filters = sketch.filter_params.to_serialized()
    parts.append('"filters":' + _jstr(filters))
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


def read_sk_file(data: bytes, path: str = "<bytes>") -> List[Sketch]:
    """Parse a MultiSketch JSON document into Sketch objects
    (json.rs:91-139, 220-238)."""
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
        # with identical missing-count / extra_count=count//2 semantics)
        h_arr = (np.array(hashes, dtype=np.uint64) if hashes
                 else np.empty(0, dtype=np.uint64))
        if counts is not None:
            c_arr = np.array(counts, dtype=np.int64)
            # the reference's serde u32 deserialization errors on overflow
            # rather than wrapping (json.rs:122-129); LazyKmerCounts casts
            # to uint32, so reject out-of-range values here
            if len(c_arr) and (c_arr.min() < 0 or c_arr.max() > 0xFFFFFFFF):
                raise FinchSchemaError(
                    f"Error parsing {path!r}: count out of u32 range")
            e_arr = c_arr // 2
        else:
            c_arr = np.ones(len(h_arr), dtype=np.int64)
            e_arr = np.zeros(len(h_arr), dtype=np.int64)
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
