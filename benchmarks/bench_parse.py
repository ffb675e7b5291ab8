"""Host parser throughput: FASTA/FASTQ -> packed canonical k-mers, MB/s.

Generates a synthetic 125 MB FASTQ on first run."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    from finch_tpu.native import KmerReader

    path = "/tmp/finch_tpu_bench.fastq"
    if not os.path.exists(path):
        rng = np.random.default_rng(0)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        n_reads, read_len = 400000, 150
        seqs = bases[rng.integers(0, 4, size=(n_reads, read_len))]
        q = b"F" * read_len
        with open(path, "wb") as f:
            for i in range(n_reads):
                f.write(b"@r%d\n" % i + seqs[i].tobytes() + b"\n+\n" + q
                        + b"\n")

    # best of 3 passes (same protocol as bench.py's min-of-N: sheds
    # shared-vCPU contention; the file is page-cached after pass 1)
    dt = float("inf")
    total = 0
    for _ in range(3):
        total = 0
        t0 = time.perf_counter()
        for packed, rc in KmerReader(path, k=21, batch_size=1 << 21):
            total += len(packed)
        dt = min(dt, time.perf_counter() - t0)
    sz = os.path.getsize(path)
    print(json.dumps({
        "metric": "parse_mb_per_sec_per_thread",
        "value": round(sz / dt / 1e6, 1),
        "unit": "MB/s",
        "kmers_per_sec": round(total / dt, 1),
    }))


if __name__ == "__main__":
    main()
