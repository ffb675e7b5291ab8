"""Generate the frozen byte goldens in tests/data/goldens/.

The goldens pin BASELINE configs 1-3 at the byte level:
  1. `finch sketch` of query.fa  -> .sk / .bsk / .msh bytes (mash + scaled)
  2. `finch sketch` of a deterministic simulated FASTQ with filtering on
     (err + strand filters populate the serialized `filters` map,
     /root/reference/lib/src/filtering.rs:89-133)
  3. `finch dist` JSON bytes between the two

They were produced by this framework's own CLI after its k-mer lists were
verified against the transcribed reference goldens
(/root/reference/cli/tests/test_cli.rs:81-149) and its hash values against
the C++ / pure-python murmur3 oracles; freezing the full files makes any
serialization byte change (float text, field order, filter-map content)
fail CI. Regenerate ONLY when a golden is intentionally changed:

    python tests/make_goldens.py        # refuses to overwrite
    python tests/make_goldens.py --force
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DATA = os.path.join(HERE, "data")
GOLD = os.path.join(DATA, "goldens")
QUERY_FA = os.path.join(DATA, "query.fa")
READS_FQ = os.path.join(DATA, "reads.fastq")
# repo-relative forms used on the CLI (they become the sketch names)
QUERY_REL = "tests/data/query.fa"
READS_REL = "tests/data/reads.fastq"


def make_reads_fastq() -> bytes:
    """Deterministic simulated FASTQ: 1200 100bp reads at ~10x coverage of
    a 12kb random genome with 0.5% substitution errors. Depth structure
    makes guess_filter_threshold non-trivial (signal ~10, error noise 1)
    and both strands are sampled so the strand filter sees balanced and
    unbalanced k-mers."""
    rng = np.random.default_rng(0x5EED)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = {65: 84, 67: 71, 71: 67, 84: 65}
    genome = rng.integers(0, 4, size=12_000)
    # splice query.fa's sequences into the genome so the dist golden has
    # non-trivial containment/jaccard floats to pin
    with open(QUERY_FA, "rb") as f:
        qseq = b"".join(ln.strip() for ln in f
                        if not ln.startswith(b">"))
    code = np.full(256, -1, dtype=np.int64)
    for i, b in enumerate(b"ACGT"):
        code[b] = i
    genome[3000:3000 + len(qseq)] = code[np.frombuffer(qseq, dtype=np.uint8)]
    read_len, n_reads = 100, 1200
    out = []
    for i in range(n_reads):
        start = int(rng.integers(0, len(genome) - read_len))
        read = bases[genome[start:start + read_len]].copy()
        # substitution errors at 0.5%
        err_pos = np.flatnonzero(rng.random(read_len) < 0.005)
        for p in err_pos:
            read[p] = bases[(int(np.searchsorted(bases, read[p]))
                             + int(rng.integers(1, 4))) % 4]
        if rng.random() < 0.5:  # reverse strand
            read = np.array([comp[b] for b in read[::-1]], dtype=np.uint8)
        out.append(b"@read%d\n%s\n+\n%s\n"
                   % (i, read.tobytes(), b"I" * read_len))
    return b"".join(out)


def finch(*args) -> bytes:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["FINCH_TPU_PLATFORM"] = "cpu"
    # run from the repo root with repo-relative input paths so sketch
    # names (and therefore golden bytes) are location-independent
    proc = subprocess.run(
        [sys.executable, "-m", "finch_tpu.cli", *args],
        capture_output=True, env=env, cwd=REPO)
    if proc.returncode != 0:
        raise SystemExit(f"finch {' '.join(args)}: {proc.stderr.decode()}")
    return proc.stdout


def main() -> None:
    force = "--force" in sys.argv
    os.makedirs(GOLD, exist_ok=True)

    def write(name: str, data: bytes) -> None:
        path = os.path.join(GOLD, name)
        if os.path.exists(path) and not force:
            with open(path, "rb") as f:
                if f.read() == data:
                    print(f"  {name}: unchanged")
                    return
            raise SystemExit(
                f"{name} would change; rerun with --force if intended")
        with open(path, "wb") as f:
            f.write(data)
        print(f"  {name}: {len(data)} bytes written")

    reads = make_reads_fastq()
    if not os.path.exists(READS_FQ) or force:
        with open(READS_FQ, "wb") as f:
            f.write(reads)
    else:
        with open(READS_FQ, "rb") as f:
            assert f.read() == reads, "reads.fastq drifted from generator"

    # config 1: query.fa sketches, both schemes + both binary formats
    write("query_mash_n10.sk",
          finch("sketch", "--n-hashes", "10", "-O", QUERY_REL))
    write("query_scaled_n10.sk",
          finch("sketch", "-s", "scaled", "--n-hashes", "10", "-O", QUERY_REL))
    for flag, ext in (("-b", "bsk"), ("-B", "msh")):
        out = os.path.join(GOLD, f"_tmp_out.{ext}")
        finch("sketch", "--n-hashes", "10", flag, QUERY_REL,
              "-o", out[: -len(ext) - 1])
        with open(out, "rb") as f:
            write(f"query_mash_n10.{ext}", f.read())
        os.unlink(out)

    # config 2: filtered FASTQ sketch (err+strand filters in the map)
    write("reads_filtered.sk",
          finch("sketch", "--n-hashes", "100", "-O", READS_REL))

    # config 3: dist between the query sketch and the FASTQ (mixed
    # sketch-file + raw-file input, the parse_mash_files path) — uses
    # n-hashes 10 inherited from the first sketch file
    sk = os.path.join(GOLD, "query_mash_n10.sk")
    write("dist_query_reads.json",
          finch("dist", "-N", os.path.relpath(sk, REPO), READS_REL))

    print("goldens complete")


if __name__ == "__main__":
    main()
