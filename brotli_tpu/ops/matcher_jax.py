"""TPU match-finding pipeline (JAX/XLA), sort-carry design.

Random HBM gathers are the slowest op class on this hardware (~80 ms
per 8M-element gather vs ~22 ms for a full 8M sort), so the pipeline
never gathers: everything a candidate comparison needs -- the position
and the 16 bytes of data at it -- is *carried through* a multi-operand
`lax.sort` keyed by (hash, pos). In sorted order the k nearest prior
occurrences of a hash are the k previous rows, so candidate distance
and capped match length are pure shifted-vector ops. A second
multi-operand sort returns (len, dist) to position order, a Pallas
kernel walks the greedy parse chain, and a third sort compacts the
selected matches so only ~matches bytes cross the PCIe/tunnel boundary
(packed 2 words per match).

This is a redesign of the reference's serial hash-chain matcher
(c/enc/backward_references_inc.h) as a batched array program -- not a
translation: there is no mutable hash table and no per-byte loop.
"""

import functools

import jax
import jax.numpy as jnp

from ..utils.jaxcfg import ensure_cache

ensure_cache()
import numpy as np

from ..enc.matcher import MIN_MATCH, _extend_capped

HASH_MUL = np.uint32(0x1E35A7BD)
CAP = 16  # parallel match-length cap (bytes); host extends cap-hits
          # (16 = 4 carried words; 8 was tried to slim the sort but
          # the flood of cap-hits moved the cost to host extension)

# pad buckets: one XLA compilation per bucket size
# two bucket shapes only: every distinct padded shape compiles its
# own kernels, and sort compiles are minutes-expensive on this
# backend (remote compile service)
_BUCKETS = [1 << 20, 1 << 23]
SEG_BYTES = _BUCKETS[-1]


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


def _shift_up(x, k, fill):
    """x shifted so row i holds x[i-k]; first k rows get `fill`."""
    return jnp.concatenate([jnp.full((k,), fill, x.dtype), x[:-k]])


def _tz_bytes_u32(x: jax.Array) -> jax.Array:
    """Trailing zero bytes of uint32 lanes (4 for x == 0)."""
    b0 = (x & 0xFF) == 0
    b1 = (x & 0xFFFF) == 0
    b2 = (x & 0xFFFFFF) == 0
    b3 = x == 0
    return (b0.astype(jnp.int32) + b1 + b2 + b3)


@functools.partial(jax.jit, static_argnames=("num_candidates",))
def match_block(data: jax.Array, npos: jax.Array, max_distance: jax.Array,
                num_candidates: int = 2, start=0):
    """Device kernel: greedy-selected matches, compacted.

    data: uint8[B] (padded). `start`: first match-eligible position --
    positions before it are history (window context from the previous
    segment: candidates may point into it, matches never start in it).
    Returns (count int32, packed uint32[2, B4]) where packed[0, :count]
    = match positions and packed[1, :count] = (len << 25) | dist, both
    in position order. B4 = B // MIN_MATCH.
    """
    n = data.shape[0]
    d32 = data.astype(jnp.uint32)
    # 16 data bytes at every position as 4 little-endian words (rolls
    # are contiguous shuffles, not gathers)
    w0 = d32 | jnp.roll(d32, -1) << 8 | jnp.roll(d32, -2) << 16 | \
        jnp.roll(d32, -3) << 24
    w1 = jnp.roll(w0, -4)
    w2 = jnp.roll(w0, -8)
    w3 = jnp.roll(w0, -12)
    h = (w0 * HASH_MUL) >> jnp.uint32(15)  # 17-bit hash
    pos = jnp.arange(n, dtype=jnp.int32)
    # single packed sort key (hash | coarse pos): 2-key variadic sorts
    # compile ~20x slower on this backend; in-bucket disorder within a
    # 512-position block only shuffles candidate order (dist > 0 is
    # re-checked). Padding rows get unique high-bit keys: never equal.
    key = jnp.where(pos < npos,
                    (h << 14) | (pos.astype(jnp.uint32) >> 9),
                    jnp.uint32(1 << 31) | pos.astype(jnp.uint32))
    key_s, pos_u, w0s, w1s, w2s, w3s = jax.lax.sort(
        (key, pos.astype(jnp.uint32), w0, w1, w2, w3), num_keys=1)
    h_s = key_s >> 14
    pos_s = pos_u.astype(jnp.int32)

    best_len_s = jnp.zeros(n, jnp.int32)
    best_dist_s = jnp.zeros(n, jnp.int32)
    for k in range(1, num_candidates + 1):
        same = (h_s == _shift_up(h_s, k, jnp.uint32(0xFFFFFFFF))) & \
            (key_s < (jnp.uint32(1) << 31))
        dist = pos_s - _shift_up(pos_s, k, jnp.int32(-1))
        valid = same & (dist > 0) & (dist <= max_distance)
        # capped common-prefix length via carried-word compares
        mlen = jnp.zeros(n, jnp.int32)
        alive = valid
        for w in (w0s, w1s, w2s, w3s):
            x = w ^ _shift_up(w, k, jnp.uint32(0))
            tz = _tz_bytes_u32(x)
            mlen = mlen + jnp.where(alive, tz, 0)
            alive = alive & (x == 0)
        mlen = jnp.where(valid, mlen, 0)
        better = mlen > best_len_s
        best_len_s = jnp.where(better, mlen, best_len_s)
        best_dist_s = jnp.where(better, dist, best_dist_s)

    # matches must not run into the padded tail (w words wrap at n)
    best_len_s = jnp.minimum(best_len_s, jnp.maximum(npos + 3 - pos_s, 0))

    # back to position order, carrying (len, dist)
    _, best_len, best_dist = jax.lax.sort(
        (pos_u, best_len_s.astype(jnp.uint32),
         best_dist_s.astype(jnp.uint32)), num_keys=1)
    best_len = best_len.astype(jnp.int32)
    best_dist = best_dist.astype(jnp.int32)

    # score gate (longer minimum match for far distances; stand-in for
    # the reference's score model, c/enc/hash.h:73-120)
    min_len = jnp.where(best_dist >= (1 << 18), 6,
                        jnp.where(best_dist >= (1 << 12), 5, MIN_MATCH))
    take = best_len >= min_len
    # lazy matching: defer to a strictly longer match at pos+1
    nxt_len = jnp.concatenate([best_len[1:], jnp.zeros(1, jnp.int32)])
    nxt_take = jnp.concatenate([take[1:], jnp.zeros(1, bool)])
    take = take & ~(nxt_take & (nxt_len > best_len + 1))
    skip = jnp.where(take, jnp.minimum(best_len, jnp.int32(n)), 1)

    # greedy parse: serial chain walk in a Pallas kernel (see
    # ops/chain_pallas.py); selm[i] = 1 iff the chain takes a match at i
    from ..utils.jaxcfg import backend_or_cpu
    if backend_or_cpu() == "cpu":  # tests/dry runs: no Mosaic
        from .chain_pallas import chain_select_xla
        selm = chain_select_xla(skip, n, start)
    else:
        from .chain_pallas import chain_select
        selm = chain_select(skip, n, start)

    # device-side compaction: selected matches to the front, packed
    nslots = n // MIN_MATCH
    key = jnp.where(selm > 0, pos.astype(jnp.uint32),
                    jnp.uint32(0xFFFFFFFF))
    packed = (best_len.astype(jnp.uint32) << 25) | \
        best_dist.astype(jnp.uint32)
    pos_c, pay_c = jax.lax.sort((key, packed), num_keys=1)
    count = jnp.sum((selm > 0).astype(jnp.int32))
    out = jnp.stack([pos_c[:nslots], pay_c[:nslots]])
    return count, out


def _run_segment(padded: np.ndarray, npos: int, max_distance: int,
                 ncand: int, start: int = 0):
    """Dispatch one segment (async); returns device handles."""
    dev = jax.device_put(jnp.asarray(padded))
    return match_block(dev, jnp.int32(npos), jnp.int32(max_distance),
                       num_candidates=ncand, start=jnp.int32(start))


def _collect_segment(handles, b: int):
    """Read back one segment's compacted matches (blocking)."""
    count, out = handles
    cnt = int(np.asarray(count))
    if cnt == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    # bucket the readback size to limit recompile/slice variants
    k = 1 << max(int(np.ceil(np.log2(cnt))), 10)
    k = min(k, out.shape[1])
    host = np.asarray(out[:, :k])
    m = host[0, :cnt].astype(np.int64)
    pay = host[1, :cnt]
    lens = (pay >> 25).astype(np.int64)
    dists = (pay & np.uint32((1 << 25) - 1)).astype(np.int64)
    return m, lens, dists


def find_matches_jax(data: np.ndarray, max_distance: int, quality: int = 1,
                     base: int = 0, use_dict=None):
    """Host wrapper: pad segments to buckets, pipeline them through the
    device (async dispatch overlaps H2D/compute/D2H across segments),
    extend cap-hit matches on host. Returns (pos, len, dist, flag)."""
    if use_dict is None:
        use_dict = quality >= 5
    from ..utils.jaxcfg import backend_or_cpu
    if backend_or_cpu() == "cpu":
        # CPU backend (tests): no Pallas; NumPy pipeline is equivalent
        from ..enc.matcher import find_matches_vectorized
        return find_matches_vectorized(
            data, max_distance, num_candidates=4 if quality >= 5 else 2,
            use_dict=use_dict, base=base)
    ncand = 4 if quality >= 5 else 2
    n = len(data)
    # segments advance by half a buffer; the other half carries window
    # history so matches can reach across segment seams
    adv = SEG_BYTES // 2 if n > SEG_BYTES else SEG_BYTES
    handles = []
    for lo in range(0, n, adv):
        hi = min(lo + adv, n)
        ctx_lo = max(0, lo - (SEG_BYTES - adv))
        buf = np.asarray(data[ctx_lo:hi])
        b = _bucket(len(buf))
        padded = np.zeros(b, np.uint8)
        padded[:len(buf)] = buf
        npos = max(len(buf) - 3, 0)
        handles.append((lo, ctx_lo, buf, b,
                        _run_segment(padded, npos, max_distance, ncand,
                                     start=lo - ctx_lo)))
    all_m, all_l, all_d, all_f = [], [], [], []
    for lo, ctx_lo, buf, b, h in handles:
        m, m_l, m_d = _collect_segment(h, b)
        m_f = np.zeros(len(m), np.int64)
        m, m_l, m_d, m_f = _extend_capped(buf, m, m_l, m_d, m_f, CAP,
                                          1 << 24)
        # dictionary probe over weak-match gaps (host, vectorized)
        if use_dict:
            from ..enc.matcher import add_dictionary_matches
            m, m_l, m_d, m_f = add_dictionary_matches(
                buf, m, m_l, m_d, m_f, max_distance, base + ctx_lo,
                active_from=lo - ctx_lo)
        keep = m >= (lo - ctx_lo)
        all_m.append(m[keep] + ctx_lo)
        all_l.append(m_l[keep])
        all_d.append(m_d[keep])
        all_f.append(m_f[keep])
    if not all_m:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    return (np.concatenate(all_m), np.concatenate(all_l),
            np.concatenate(all_d), np.concatenate(all_f))
