"""Global JAX configuration for finch_tpu.

The murmur/bottom-k pipeline is 64-bit integer arithmetic; we require
jax_enable_x64. On TPU, XLA emulates u64 ops with 32-bit lanes; the
hand-tuned Pallas kernels in ops/ work on explicit (hi, lo) u32 pairs.
"""

import os

_configured = False


def configure() -> None:
    global _configured
    if _configured:
        return
    # Must run before JAX creates any arrays.
    os.environ.setdefault("JAX_ENABLE_X64", "1")
    try:
        import jax

        jax.config.update("jax_enable_x64", True)
        # FINCH_TPU_PLATFORM overrides the JAX platform even when a
        # sitecustomize pins JAX_PLATFORMS (e.g. force "cpu" in CI).
        platform = os.environ.get("FINCH_TPU_PLATFORM")
        if platform:
            jax.config.update("jax_platforms", platform)
        # persistent compilation cache: the sketch pipeline's big sorts
        # compile slowly; CLI invocations reuse compiled executables across
        # processes. Disable with FINCH_TPU_JAX_CACHE=0.
        cache = os.environ.get(
            "FINCH_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "finch_tpu",
                         "jax"))
        if cache not in ("0", ""):
            try:
                os.makedirs(cache, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:  # pragma: no cover - cache is best-effort
                pass
    except ImportError:  # pragma: no cover - jax is a hard dep in practice
        pass
    _configured = True
