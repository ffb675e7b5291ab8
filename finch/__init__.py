"""Drop-in shim for the reference's Python module name.

The reference exposes ``import finch`` (pyo3 module, python.rs:682-690).
finch_tpu's binding-compatible surface lives in finch_tpu.api; this package
re-exports it so existing finch scripts run unchanged:

    import finch
    s = finch.sketch_file("reads.fastq.gz")
    ms = finch.Multisketch.open("db.bsk")
"""

from finch_tpu.api import (FinchError, Multisketch, Sketch, merge_sketches,
                           sketch_file)

__all__ = ["FinchError", "Multisketch", "Sketch", "merge_sketches",
           "sketch_file"]
