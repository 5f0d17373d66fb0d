"""Device-side LZ copy resolution: log-step pointer doubling.

The second half of the decode hot loop (reference role:
c/dec/decode.c:2401 ProcessCommands' byte movement — literal insert,
ring-buffer copy with overlap semantics, dictionary expansion). The
host symbol parse (dec/device_decode.py) emits a command list
(nlit, ncopy, dist) plus the flat literal stream; this kernel builds
the output as a dependency graph where every output byte either IS a
literal (a resolved fixed point) or points `dist` bytes back, then
collapses the chains with O(log n) gather steps — the classic
parallel-LZ77-decode construction (PAPERS.md), which XLA maps onto
large contiguous gathers instead of a byte-serial loop.

Overlapping copies (dist < len, the RLE case) are exactly the long
chains: position j points to j-d which is itself unresolved; pointer
doubling (src = src[src]) halves every chain's depth per step, so
ceil(log2(n)) steps resolve all of them.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcfg import ensure_cache


@functools.partial(jax.jit, static_argnames=("n_out", "n_steps"))
def _resolve(lits, nlit, ncopy, dist, n_out, n_steps):
    adv = nlit + ncopy
    ends = jnp.cumsum(adv)
    starts = ends - adv
    lit_off = jnp.cumsum(nlit) - nlit
    j = jnp.arange(n_out, dtype=jnp.int32)
    ci = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
    off = j - starts[ci]
    is_lit = off < nlit[ci]
    # literal value per position (defined only where is_lit)
    litval = lits[jnp.clip(lit_off[ci] + off, 0, lits.shape[0] - 1)]
    # copy source pointer; literals are fixed points
    src = jnp.where(is_lit, j, j - dist[ci])
    src = jax.lax.fori_loop(0, n_steps, lambda _i, s: s[s], src)
    return jnp.where(is_lit[src], litval[src], jnp.uint8(0))


def resolve(lits: bytes, nlit, ncopy, dist, max_depth=None) -> bytes:
    """Resolve the deferred-LZ command list into output bytes.

    max_depth: copy-chain depth bound when the parser measured one
    (native parse_stream does); the doubling loop then runs
    ceil(log2(depth)) steps instead of the worst-case log2(n) -- the
    gathers are the whole cost of the device path, so on typical
    streams this is a ~3x cut."""
    ensure_cache()
    nlit = np.asarray(nlit, np.int32)
    ncopy = np.asarray(ncopy, np.int32)
    dist = np.asarray(dist, np.int32)
    n_out = int(nlit.sum() + ncopy.sum())
    if n_out == 0:
        return b""
    n_steps = max(1, int(np.ceil(np.log2(n_out))))
    if max_depth is not None and 0 < max_depth < (1 << 30):
        n_steps = min(n_steps, max(1, int(max_depth).bit_length()))
    la = np.frombuffer(bytes(lits), np.uint8)
    if len(la) == 0:
        la = np.zeros(1, np.uint8)  # gather base for all-copy streams
    out = _resolve(jnp.asarray(la), jnp.asarray(nlit),
                   jnp.asarray(ncopy), jnp.asarray(dist),
                   n_out, n_steps)
    return np.asarray(out).tobytes()
