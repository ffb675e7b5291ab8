"""On-device validation: the real-TPU kernel path vs the host oracle.

CI runs on a virtual CPU mesh where the Pallas kernel is disabled; this
script exercises the fused-kernel sketch path on actual TPU hardware and
asserts bit-identity against NumpyEngine, at a small capacity (the shape
class that once hit a scoped-VMEM lowering failure) and with duplicate-
heavy data. Run manually or from the round driver; exits nonzero on any
divergence."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    import finch_tpu  # noqa: F401  (configures JAX)
    from finch_tpu.models.engine import JaxEngine, NumpyEngine
    from finch_tpu.models.params import SketchParams

    rng = np.random.default_rng(42)
    for cap, final in ((2000, 500), (200000, 1000)):
        params = SketchParams.mash(kmers_to_sketch=cap, final_size=final,
                                   no_strict=True)
        jx = JaxEngine(params, batch_size=1 << 21)
        npe = NumpyEngine(params)
        for _ in range(4):
            n = 1 << 21
            pk = rng.integers(0, 4 ** 21, size=n, dtype=np.uint64)
            pk[: n // 10] = pk[n // 10: 2 * (n // 10)]  # duplicates
            rc = rng.integers(0, 2, size=n, dtype=np.uint8)
            jx.update(pk, rc)
            npe.update(pk, rc)
        a = [(k.hash, k.count, k.extra_count, k.kmer)
             for k in jx.finalize()]
        b = [(k.hash, k.count, k.extra_count, k.kmer)
             for k in npe.finalize()]
        assert a == b, f"DIVERGENCE at capacity {cap}"
        print(f"capacity {cap}: device == oracle over "
              f"{4 * (1 << 21)} kmers (kernel={jx._use_kernel})")
    print("validate_tpu OK")


if __name__ == "__main__":
    main()
