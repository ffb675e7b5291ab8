#!/bin/sh
# ThreadSanitizer build + exercise of the native layer's concurrent
# machinery (parallel parse pipeline, fused sketch mode, BGZF inflate
# pool) — the closest analog of the data-race guarantees the reference
# gets from Rust's type system (SURVEY §5 "race detection"). Run
# manually or from CI; exits nonzero on any reported race.
set -e
cd "$(dirname "$0")/.."
SRC=finch_tpu/native/src/finch_native.cpp
OUT=/tmp/finch_native_tsan.so
g++ -O1 -g -fsanitize=thread -std=c++17 -shared -fPIC -pthread \
    "$SRC" -o "$OUT" -lz
# dlopen-ing a TSan DSO into an unsanitized python needs libtsan
# preloaded (static TLS allocation happens at startup)
LIBTSAN=$(g++ -print-file-name=libtsan.so)
LD_PRELOAD="$LIBTSAN" \
TSAN_OPTIONS="halt_on_error=1 exitcode=66" \
FINCH_TPU_NATIVE_SO="$OUT" FINCH_TPU_CHUNK=16384 python - <<'PYEOF'
import numpy as np
import finch_tpu.native as fn

rng = np.random.default_rng(1)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
reads = [b"@r%d\n%s\n+\n%s\n" % (i, bases[rng.integers(0, 4, 120)].tobytes(),
                                 b"I" * 120) for i in range(20000)]
data = b"".join(reads)
path = "/tmp/tsan_reads.fastq"
open(path, "wb").write(data)

# concurrent parse pipeline, many threads + tiny chunks, both layouts
r = fn.StreamingParallelReader(path, k=21, threads=8, batch_size=1 << 14)
n = sum(len(b[0]) for b in r)
rc = fn.StreamingParallelReader(path, k=21, threads=8, batch_size=1 << 14,
                                composite=True)
nc = sum(len(b[0]) for b in rc)
assert n == nc
print("parallel parse kmers:", n)

# fused sketch mode (shared atomic threshold + merge)
(h, c, e, pk), totals, fmt = fn.sketch_pipeline(
    path, 21, 0, 0, 5000, threads=8)
print("fused entries:", len(h))
print("TSAN native exercise OK")
PYEOF
