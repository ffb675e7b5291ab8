"""Sketch a set of FASTA/FASTQ files and find the best reference match.

Usage: python examples/sketch_and_search.py query.fq ref1.fa ref2.fa ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import finch_tpu as ft  # noqa: E402


def main() -> None:
    query_path, *ref_paths = sys.argv[1:]
    params = ft.SketchParams.mash(kmers_to_sketch=200_000, final_size=1000,
                                  no_strict=True)
    filters = ft.FilterParams(filter_on=None, err_filter=0.21,
                              strand_filter=0.1)

    [query] = ft.sketch_files([query_path], params, filters)
    refs = ft.sketch_files(ref_paths, params, filters)  # thread-parallel

    best = max(refs, key=lambda r: ft.distance(query, r).containment)
    d = ft.distance(query, best)
    print(f"best match: {best.name}")
    print(f"  containment={d.containment:.4f} jaccard={d.jaccard:.4f} "
          f"mash={d.mash_distance:.6f}")


if __name__ == "__main__":
    main()
