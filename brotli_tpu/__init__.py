"""brotli_tpu: a TPU-native Brotli (RFC 7932) codec.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
google/brotli: format layer as NumPy tables, batched/vectorized encoder
pipeline, sharded multi-chip compression via ``jax.sharding``, plus a
reference host path for bit-exact validation.

Public API mirrors the reference Python binding (python/brotli.py):
``compress``, ``decompress``, ``Compressor``, ``Decompressor``, ``error``.
"""

import os as _os

# persistent XLA compilation cache: the device kernels (matcher, DP)
# compile once per pad-bucket; cache them across processes
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"))

from .api import (  # noqa: F401
    set_reporting_callbacks,
    MODE_GENERIC,
    MODE_TEXT,
    MODE_FONT,
    Compressor,
    Decompressor,
    compress,
    decompress,
    decompress_concatenated,
    error,
    estimate_peak_memory,
)

__version__ = "0.1.0"
version = __version__  # parity: python/brotli.py `version`
