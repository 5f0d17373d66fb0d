"""JAX runtime configuration: persistent compilation + autotune cache.

The env var alone is not picked up by this JAX build; the config knob
must be set explicitly after import. Kernel (re)compiles go through a
remote compile service that prices each variadic sort at minutes, so
cache persistence matters a lot here.
"""

import os
import pathlib

_DONE = False


def ensure_cache():
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        # Caller-file-independent cache keys: traceback locations leak
        # into the SERIALIZED MOSAIC KERNEL embedded in tpu_custom_call
        # (the outer strip-debuginfo pass cannot reach inside the
        # attribute), so without this, byte-identical programs invoked
        # from two different entry files compile twice -- measured
        # 1762 s cold vs 50 s warm for the q11 device pipeline. With
        # locations off, the canonicalized IR hash is identical across
        # caller files (verified both ways 2026-08-20).
        jax.config.update("jax_include_full_tracebacks_in_locations",
                          False)
        jax.config.update("jax_traceback_in_locations_limit", 0)
    except Exception:
        pass


def backend_or_cpu() -> str:
    """The default backend name, degraded to "cpu" when the device
    plugin fails to initialize (e.g. the TPU tunnel is down): encode
    paths treat that exactly like a CPU-only machine and take the host
    pipeline instead of crashing the call."""
    import jax

    try:
        return jax.default_backend()
    except RuntimeError:
        return "cpu"
