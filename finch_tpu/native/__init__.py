"""ctypes bindings to the C++ native host layer (parser / packer / murmur oracle).

The shared library is built on demand from ``src/finch_native.cpp`` and cached
next to the source (keyed by a content hash), so a fresh checkout needs only
``g++`` and zlib. See finch-rs's equivalent native layer: the needletail-based
record loop at /root/reference/lib/src/lib.rs:51-94 and the murmurhash3 crate
used at /root/reference/lib/src/sketch_schemes/hashing.rs:9-12.
"""

from __future__ import annotations

import ctypes
import gzip
import hashlib
import io
import os
import subprocess
import threading

import numpy as np

from finch_tpu.errors import FinchParseError

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "finch_native.cpp")

_lock = threading.Lock()
_lib = None


class NativeError(FinchParseError):
    """Native-layer failure (parse/IO), errors.rs Io/Needletail analog."""
    pass


_ERRORS = {
    1: "Could not detect file format (empty or not FASTA/FASTQ?)",
    2: "No such file or directory",
    3: "zlib init failed",
    4: "read/decompress error",
    5: "malformed FASTQ record",
    6: "k must be in 1..=31 for the packed path",
}


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_HERE, f"_finch_native_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            _SRC, "-o", tmp, "-lz",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    return so_path


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        with _lock:
            if _lib is None:
                l = ctypes.CDLL(_build())
                u64 = ctypes.c_uint64
                u32 = ctypes.c_uint32
                p = ctypes.POINTER
                l.fn_murmur3_x64_128.argtypes = [ctypes.c_char_p, u64, u64, p(u64)]
                l.fn_murmur3_batch.argtypes = [
                    ctypes.c_void_p, u64, u32, u64, ctypes.c_void_p]
                l.fn_murmur3_packed.argtypes = [
                    ctypes.c_void_p, u64, u32, u64, ctypes.c_void_p]
                l.fn_unpack_kmers.argtypes = [
                    ctypes.c_void_p, u64, u32, ctypes.c_void_p]
                l.fn_open_path.restype = ctypes.c_void_p
                l.fn_open_path.argtypes = [ctypes.c_char_p, p(ctypes.c_int)]
                l.fn_open_bytes.restype = ctypes.c_void_p
                l.fn_open_bytes.argtypes = [
                    ctypes.c_char_p, u64, p(ctypes.c_int)]
                l.fn_close.argtypes = [ctypes.c_void_p]
                l.fn_next_batch.restype = ctypes.c_int
                l.fn_next_batch.argtypes = [
                    ctypes.c_void_p, u32, ctypes.c_int, u64,
                    ctypes.c_void_p, ctypes.c_void_p, p(u64), p(ctypes.c_int)]
                l.fn_totals.argtypes = [ctypes.c_void_p, p(u64), p(u64), p(u64)]
                l.fn_error.restype = ctypes.c_int
                l.fn_error.argtypes = [ctypes.c_void_p]
                _lib = l
    return _lib


def murmur3_x64_128(key: bytes, seed: int = 0) -> tuple[int, int]:
    """Scalar oracle: MurmurHash3_x64_128(key, seed) -> (h1, h2)."""
    out = (ctypes.c_uint64 * 2)()
    lib().fn_murmur3_x64_128(key, len(key), seed, out)
    return out[0], out[1]


def murmur3_packed(packed: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """Hash 2-bit packed k-mer codes on the host (reference path)."""
    packed = np.ascontiguousarray(packed, dtype=np.uint64)
    out = np.empty(packed.shape[0], dtype=np.uint64)
    lib().fn_murmur3_packed(
        packed.ctypes.data, packed.shape[0], k, seed, out.ctypes.data)
    return out


def unpack_kmers(packed: np.ndarray, k: int) -> np.ndarray:
    """Decode packed codes to an (n, k) uint8 array of ASCII bases."""
    packed = np.ascontiguousarray(packed, dtype=np.uint64)
    out = np.empty((packed.shape[0], k), dtype=np.uint8)
    lib().fn_unpack_kmers(packed.ctypes.data, packed.shape[0], k, out.ctypes.data)
    return out


FORMAT_UNKNOWN, FORMAT_FASTA, FORMAT_FASTQ = 0, 1, 2


class KmerReader:
    """Streaming canonical k-mer batches from a FASTA/FASTQ(.gz) source.

    Yields (packed_codes: uint64[n], is_rc: uint8[n]) batches; after
    exhaustion, ``totals`` carries (seq_length, num_valid_kmers, n_records)
    matching finch's accounting (mash.rs:72, mash.rs:35).
    """

    def __init__(self, path_or_bytes, k: int, canonical: bool = True,
                 batch_size: int = 1 << 22):
        self.k = int(k)
        self.canonical = bool(canonical)
        self.batch_size = int(batch_size)
        self._err = ctypes.c_int(0)
        self._keepalive = None
        if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
            data = bytes(path_or_bytes)
            self._keepalive = data
            self._h = lib().fn_open_bytes(data, len(data), ctypes.byref(self._err))
        else:
            self._h = lib().fn_open_path(
                str(path_or_bytes).encode(), ctypes.byref(self._err))
        if not self._h:
            raise NativeError(_ERRORS.get(self._err.value, "open failed"))
        self.format = FORMAT_UNKNOWN
        self._done = False

    def __iter__(self):
        n = ctypes.c_uint64(0)
        fmt = ctypes.c_int(0)
        while not self._done:
            kmers = np.empty(self.batch_size, dtype=np.uint64)
            rc = np.empty(self.batch_size, dtype=np.uint8)
            r = lib().fn_next_batch(
                self._h, self.k, 1 if self.canonical else 0, self.batch_size,
                kmers.ctypes.data, rc.ctypes.data,
                ctypes.byref(n), ctypes.byref(fmt))
            if r < 0:
                code = lib().fn_error(self._h)
                raise NativeError(_ERRORS.get(code, f"parse error {code}"))
            self.format = fmt.value
            if r == 0:
                self._done = True
            if n.value:
                yield kmers[: n.value], rc[: n.value]
            if r == 0:
                break

    @property
    def totals(self):
        bases = ctypes.c_uint64(0)
        kmers = ctypes.c_uint64(0)
        recs = ctypes.c_uint64(0)
        lib().fn_totals(self._h, ctypes.byref(bases), ctypes.byref(kmers),
                        ctypes.byref(recs))
        return bases.value, kmers.value, recs.value

    def close(self):
        if getattr(self, "_h", None):
            lib().fn_close(self._h)
            self._h = None

    def __del__(self):
        self.close()


def _gunzip_bounded(fileobj, mem_budget: int | None) -> bytes:
    """Stream-decompress a gzip member chain, failing fast (MemoryError)
    the moment cumulative output exceeds ``mem_budget`` — never
    materializing more than the budget, unlike gzip.decompress."""
    out = []
    total = 0
    with gzip.GzipFile(fileobj=fileobj) as g:
        while True:
            chunk = g.read(1 << 24)
            if not chunk:
                break
            total += len(chunk)
            if mem_budget is not None and total > mem_budget:
                raise MemoryError(
                    "decompressed input exceeds the parallel-parse budget; "
                    "use the streaming KmerReader")
            out.append(chunk)
    return b"".join(out)


class ParallelKmerReader:
    """Within-file parallel k-mer extraction over record-aligned chunks.

    The analog of splitting one file across cores (the reference's rayon
    only parallelizes across files, lib.rs:34-47). The input is loaded (and
    gunzipped — gzip streams are inherently serial) once, split at exact
    record boundaries — FASTA at "\\n>", FASTQ at every 4th newline (this
    parser's FASTQ dialect is strictly 4 lines/record) — and each chunk
    runs through its own C++ parser on a worker thread (ctypes releases
    the GIL). Batches are yielded chunk-by-chunk in file order, so the
    emitted k-mer stream is byte-identical to the serial reader's; totals
    sum exactly.
    """

    def __init__(self, path_or_bytes, k: int, canonical: bool = True,
                 batch_size: int = 1 << 22, threads: int | None = None,
                 mem_budget: int | None = None):
        if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
            data = bytes(path_or_bytes)
            if data[:2] == b"\x1f\x8b":
                data = _gunzip_bounded(io.BytesIO(data), mem_budget)
        else:
            with open(path_or_bytes, "rb") as f:
                head = f.read(2)
                f.seek(0)
                if head == b"\x1f\x8b":
                    data = _gunzip_bounded(f, mem_budget)
                else:
                    data = f.read()
        if mem_budget is not None and len(data) > mem_budget:
            raise MemoryError(
                "input exceeds the parallel-parse budget; "
                "use the streaming KmerReader")
        if threads is None:
            threads = int(os.environ.get("FINCH_TPU_PARSER_THREADS", "0")) \
                or (os.cpu_count() or 1)
        self.k = int(k)
        self.canonical = bool(canonical)
        self.batch_size = int(batch_size)
        self._chunks = self._split(data, max(1, threads))
        self._totals = (0, 0, 0)
        self._fmt = 0

    @staticmethod
    def _split(data: bytes, n: int) -> list:
        if not data or n <= 1 or len(data) < 1 << 16:
            return [data] if data else []
        if data[:1] == b">":
            bounds = [0]
            step = len(data) // n
            for t in range(1, n):
                pos = data.find(b"\n>", t * step)
                if pos < 0:
                    break
                start = pos + 1
                if start > bounds[-1]:
                    bounds.append(start)
            bounds.append(len(data))
            return [data[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]
        if data[:1] == b"@":
            # strict 4-line records: boundaries at every 4th newline
            nl = np.flatnonzero(
                np.frombuffer(data, dtype=np.uint8) == 0x0A)
            rec_starts = nl[3::4] + 1  # byte after each 4th newline
            bounds = [0]
            step = len(data) // n
            for t in range(1, n):
                ix = np.searchsorted(rec_starts, t * step)
                if ix >= len(rec_starts):
                    break
                start = int(rec_starts[ix])
                if start < len(data) and start > bounds[-1]:
                    bounds.append(start)
            bounds.append(len(data))
            return [data[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]
        return [data]

    # in-flight chunk window: bounds peak memory at ~WINDOW chunks of
    # materialized batches (~9 B/base each) instead of the whole file's
    WINDOW = 3

    def __iter__(self):
        import concurrent.futures as cf

        if not self._chunks:
            # delegate the empty-input error to a plain reader
            r = KmerReader(b"", k=self.k, canonical=self.canonical,
                           batch_size=self.batch_size)
            yield from r
            return

        def parse(chunk):
            r = KmerReader(chunk, k=self.k, canonical=self.canonical,
                           batch_size=self.batch_size)
            out = list(r)
            t = r.totals
            fmt = r.format
            r.close()
            return out, t, fmt

        totals = [0, 0, 0]
        chunks = self._chunks
        with cf.ThreadPoolExecutor(max_workers=len(chunks)) as pool:
            futs = [pool.submit(parse, c) for c in chunks[:self.WINDOW]]
            nxt = len(futs)
            for ci in range(len(chunks)):
                out, t, fmt = futs[ci].result()
                futs[ci] = None  # release the chunk's batches
                if nxt < len(chunks):
                    futs.append(pool.submit(parse, chunks[nxt]))
                    nxt += 1
                self._fmt = self._fmt or fmt
                for i in range(3):
                    totals[i] += t[i]
                # totals update incrementally per completed chunk so an
                # early break still reports consistent partial counts
                self._totals = tuple(totals)
                yield from out

    @property
    def totals(self):
        return self._totals

    @property
    def format(self):
        return self._fmt

    def close(self) -> None:
        self._chunks = []
