"""Device-side bit packing: (value, nbits) streams -> packed bytes.

The packer is an exclusive scan over code lengths followed by a
scatter-add of word contributions -- contributions to the same 32-bit
word have disjoint bit ranges, so add == or. uint32 arithmetic only
(TPU-native). Host equivalent: brotli_tpu/format/bitio.py
BitWriter.getvalue (uint64 variant).
"""

import jax
import jax.numpy as jnp

from ..utils.jaxcfg import ensure_cache

ensure_cache()
import numpy as np


@jax.jit
def pack_bits(values: jax.Array, nbits: jax.Array):
    """values,u nbits: int32[N] (values < 2^24, nbits in [0, 24]).

    Returns (words uint32[N_words], total_bits int32): the bit stream in
    little-endian 32-bit words. Zero-length entries contribute nothing.
    """
    nbits = nbits.astype(jnp.uint32)
    values = values.astype(jnp.uint32) & ((jnp.uint32(1) << nbits) - 1)
    starts = jnp.cumsum(nbits) - nbits
    total = starts[-1] + nbits[-1] if nbits.shape[0] else jnp.uint32(0)
    word = (starts >> 5).astype(jnp.int32)
    shift = starts & 31
    lo = values << shift
    hi = jnp.where(shift > 0, values >> (jnp.uint32(32) - shift),
                   jnp.uint32(0))
    nwords = values.shape[0] + 1  # upper bound given <= 32 bits/entry
    acc = jnp.zeros(nwords, jnp.uint32)
    acc = acc.at[word].add(lo)
    acc = acc.at[word + 1].add(hi)
    return acc, total.astype(jnp.int32)


def pack_to_bytes(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Host wrapper: run the device packer and trim to bytes."""
    words, total = pack_bits(jnp.asarray(values, jnp.int32),
                             jnp.asarray(nbits, jnp.int32))
    total = int(total)
    out = np.asarray(words).astype("<u4").view(np.uint8)
    return out[:(total + 7) // 8].tobytes()
