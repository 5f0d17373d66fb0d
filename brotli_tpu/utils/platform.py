"""Platform / capability introspection (the c/common/platform.h role).

The reference's platform layer answers "what can this machine do and
which code paths will run" at compile time (endianness, unaligned
loads, SIMD targets, allocator defaults, BROTLI_LOG hooks —
/root/reference/c/common/platform.h). In a JAX/numpy framework those
concerns dissolve into the runtime, so the equivalent surface is a
RUNTIME capability report: which backend the device paths would use,
whether the native host runtime is available (and what it covers),
and which pipeline each quality dispatches to. `configure()` is the
process-wide knob bundle (the BROTLI_TPU_* env vocabulary in one
validated place).
"""

import os
import sys

# env vocabulary honored across the package (the compile-time macro
# set of platform.h, as runtime switches)
ENV_KNOBS = {
    "BROTLI_TPU_DECODER": "native (default) | python — decode path",
    "BROTLI_TPU_ENCODER": "auto (default) | native | device | python "
                          "— one-shot encode tier selection",
    "BROTLI_TPU_BACKEND": "auto (default) | numpy — numpy disables the "
                          "device matcher/DP dispatch",
    "BROTLI_TPU_NATIVE_LIB": "path to a prebuilt libbtpu.so",
    "BROTLI_TPU_TRACE": "1 — per-stage timing to stderr (utils/trace)",
    "JAX_COMPILATION_CACHE_DIR": "persistent XLA kernel cache dir",
    "XLA_FLAGS": "e.g. --xla_force_host_platform_device_count=N "
                 "for a virtual CPU mesh",
}


def native_available() -> bool:
    """True when the C host runtime builds/loads on this machine."""
    try:
        from .. import native
        native.get_lib()
        return True
    except Exception:
        return False


def info() -> dict:
    """One dict describing every capability the pipelines switch on.

    Keys are stable; values are plain Python scalars/lists so the
    report can be logged or JSON-serialized as-is.
    """
    from .jaxcfg import backend_or_cpu

    nat = native_available()
    report = {
        "python": sys.version.split()[0],
        "platform": sys.platform,
        "byteorder": sys.byteorder,
        "native_runtime": nat,
        "decoder_path": ("native" if nat and os.environ.get(
            "BROTLI_TPU_DECODER", "native") == "native" else "python"),
        "encoder_tiers": {
            "q0-q1": "native one-pass" if nat else "python pipeline",
            "q2-q9": "native greedy/lazy" if nat else "python pipeline",
            "q10-q11": "native optimal-parse" if nat
                       else "host DP (python)",
            "sharded/mesh": "jax shard_map + native serializer",
        },
        "env_knobs": dict(ENV_KNOBS),
    }
    try:
        import jax
        report["jax"] = jax.__version__
        report["jax_backend"] = backend_or_cpu()
        try:
            report["devices"] = [str(d) for d in jax.devices()]
        except RuntimeError:
            report["devices"] = []
    except ImportError:  # pure host mode: the codec still works
        report["jax"] = None
        report["jax_backend"] = None
        report["devices"] = []
    return report


def configure(decoder=None, encoder=None, backend=None,
              cache_dir=None):
    """Validated process-wide configuration (platform.h macro role).

    decoder: "native" | "python"; encoder: "auto" | "native" |
    "device" | "python"; backend: "auto" | "numpy"; cache_dir: XLA
    compilation cache directory. Raises ValueError on unknown values
    instead of silently ignoring them.
    """
    if decoder is not None:
        if decoder not in ("native", "python"):
            raise ValueError(f"decoder must be native|python: {decoder}")
        os.environ["BROTLI_TPU_DECODER"] = decoder
    if encoder is not None:
        if encoder not in ("auto", "native", "device", "python"):
            raise ValueError(
                f"encoder must be auto|native|device|python: {encoder}")
        os.environ["BROTLI_TPU_ENCODER"] = encoder
    if backend is not None:
        if backend not in ("auto", "numpy"):
            raise ValueError(f"backend must be auto|numpy: {backend}")
        os.environ["BROTLI_TPU_BACKEND"] = backend
    if cache_dir is not None:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = str(cache_dir)
    return info()
