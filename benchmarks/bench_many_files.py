"""Multi-file sketching throughput: sketches/s over many small genomes.

BASELINE.md names "sketches/s (k=21, n=1000)" as a first-class metric;
bench_e2e.py covers the one-big-FASTQ case, this covers the
many-small-files case the reference parallelizes with rayon par_iter
over filenames (lib.rs:29-49). Generates N deterministic ~1 MB FASTA
genomes, then sketches them through sketch_files' thread pool at k=21,
n=1000 for each backend, reporting sketches/s and MB/s. The host worker
count is reported alongside (on a 1-core host the pool degenerates to
serial; the per-file numbers are the scaling unit).

Usage: python benchmarks/bench_many_files.py [--files=N] [--mb=M]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_genomes(root: str, n_files: int, mb: float) -> list:
    import numpy as np

    paths = []
    size = int(mb * 1e6)
    rng = np.random.default_rng(0xF00D)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(n_files):
        seq = bases[rng.integers(0, 4, size=size)]
        path = os.path.join(root, f"genome_{i:04d}.fa")
        with open(path, "wb") as f:
            f.write(b">genome_%d\n" % i)
            # 80-col wrapping like real FASTA (parser must skip newlines)
            rows = seq[: size - size % 80].reshape(-1, 80)
            wrapped = np.concatenate(
                [rows, np.full((rows.shape[0], 1), 10, np.uint8)], axis=1)
            f.write(wrapped.tobytes())
            f.write(seq[size - size % 80:].tobytes() + b"\n")
        paths.append(path)
    return paths


def main() -> None:
    n_files, mb = 100, 1.0
    for a in sys.argv[1:]:
        if a.startswith("--files="):
            n_files = int(a.split("=", 1)[1])
        elif a.startswith("--mb="):
            mb = float(a.split("=", 1)[1])

    from finch_tpu.core.sketching import sketch_files
    from finch_tpu.models.params import FilterParams, SketchParams

    params = SketchParams.mash(kmers_to_sketch=1000 * 200, final_size=1000,
                               no_strict=True)
    filters = FilterParams()

    root = tempfile.mkdtemp(prefix="finch_many_")
    try:
        t0 = time.perf_counter()
        paths = gen_genomes(root, n_files, mb)
        gen_s = time.perf_counter() - t0

        results = {}
        for backend in ("native", "auto"):
            # warm (build caches, compile) on a copy of the first file so
            # the timed run sees steady state
            sketch_files(paths[:1], params, filters, backend=backend)
            t0 = time.perf_counter()
            sketches = sketch_files(paths, params, filters, backend=backend)
            dt = time.perf_counter() - t0
            assert len(sketches) == n_files
            assert all(len(s.hashes) == 1000 for s in sketches)
            results[backend] = {
                "sketches_per_sec": round(n_files / dt, 2),
                "mb_per_sec": round(n_files * mb / dt, 1),
                "wall_s": round(dt, 2),
            }
        print(json.dumps({
            "metric": "multi_file_sketches_per_sec",
            "files": n_files,
            "mb_per_file": mb,
            "host_cores": os.cpu_count(),
            "gen_s": round(gen_s, 2),
            **results,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
