"""TPU match-finding pipeline (JAX/XLA).

Everything data-parallel runs on device with int32/uint32 arithmetic
(TPU has no native int64): rolling hashes, stable sort by hash for
candidate discovery, capped common-prefix lengths via uint32 word
compares, score gating, and the greedy parse as pointer-doubling
reachability. Only cap-hit match extension happens on host (rare,
serial by nature).

This is a redesign of the reference's serial hash-chain matcher
(c/enc/backward_references_inc.h) as a batched array program -- not a
translation: there is no mutable hash table; candidates come from a
sorted (hash, pos) view, which is deterministic and fully parallel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..enc.matcher import MIN_MATCH, _extend_capped

HASH_MUL = np.uint32(0x1E35A7BD)
CAP = 16  # parallel match-length cap (bytes); host extends cap-hits

# pad buckets: one XLA compilation per bucket size
_BUCKETS = [1 << b for b in range(16, 24)]


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


@functools.partial(jax.jit,
                   static_argnames=("num_candidates", "use_pallas"))
def match_block(data: jax.Array, npos: jax.Array, max_distance: jax.Array,
                num_candidates: int = 2, use_pallas: bool = True):
    """Device kernel: per-position best (len, dist) + greedy selection.

    data: uint8[B] (padded); npos: valid match-start count; returns
    (selected mask bool[B], best_len int32[B], best_dist int32[B]).
    """
    n = data.shape[0]
    d32 = data.astype(jnp.uint32)
    # 4-byte words at every position
    w4 = d32
    w4 = d32 | jnp.roll(d32, -1) << 8 | jnp.roll(d32, -2) << 16 | \
        jnp.roll(d32, -3) << 24
    h = (w4 * HASH_MUL) >> jnp.uint32(14)  # 18-bit hash
    pos = jnp.arange(n, dtype=jnp.int32)
    # positions beyond npos must never match: give them unique hashes
    # outside the real range (wrap-around words at the tail included)
    h = jnp.where(pos < npos, h, jnp.uint32(1 << 18) + pos.astype(
        jnp.uint32))
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    h_s = h[order]

    best_len = jnp.zeros(n, jnp.int32)
    best_dist = jnp.zeros(n, jnp.int32)
    for k in range(1, num_candidates + 1):
        same = jnp.concatenate([jnp.zeros(k, bool),
                                h_s[k:] == h_s[:-k]])
        cand_s = jnp.concatenate([jnp.zeros(k, jnp.int32), order[:-k]])
        cand = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.where(same, cand_s, -1))
        dist = pos - cand
        valid = (cand >= 0) & (dist <= max_distance) & (pos < npos)
        c = jnp.where(valid, cand, 0)
        # match length in [0, 16] via 4 uint32 word compares
        mlen = jnp.zeros(n, jnp.int32)
        alive = valid
        for r in range(CAP // 4):
            pr = jnp.minimum(pos + 4 * r, n - 1)
            cr = jnp.minimum(c + 4 * r, n - 1)
            x = w4[pr] ^ w4[cr]
            tz = _tz_bytes_u32(x)
            mlen = mlen + jnp.where(alive, tz, 0)
            alive = alive & (x == 0)
        mlen = jnp.minimum(mlen, npos + 3 - pos)
        mlen = jnp.where(valid, mlen, 0)
        better = mlen > best_len
        best_len = jnp.where(better, mlen, best_len)
        best_dist = jnp.where(better, dist, best_dist)

    # score gate (longer minimum for far distances)
    min_len = jnp.where(best_dist >= (1 << 18), 6,
                        jnp.where(best_dist >= (1 << 12), 5, MIN_MATCH))
    take = best_len >= min_len
    # lazy matching: defer to a strictly longer match at pos+1
    nxt_len = jnp.concatenate([best_len[1:], jnp.zeros(1, jnp.int32)])
    nxt_take = jnp.concatenate([take[1:], jnp.zeros(1, bool)])
    take = take & ~(nxt_take & (nxt_len > best_len + 1))
    skip = jnp.where(take, best_len, 1)

    skip = jnp.minimum(skip, jnp.int32(n))
    if not use_pallas:  # CPU/debug path: host walks the chain
        return skip, best_len, best_dist
    # Greedy parse: serial chain walk in a Pallas kernel. The chain
    # pos -> pos + skip[pos] is monotone, so `skip` streams through
    # on-chip memory segment by segment (sequential DMA) and the scalar
    # unit walks it with one load per chain node -- no O(n log n)
    # random HBM gathers (see ops/chain_pallas.py).
    from .chain_pallas import chain_select
    selm = chain_select(skip, n)
    keys = jnp.where(selm > 0, pos, jnp.int32(n))
    morbit = jax.lax.sort(keys)[:max(n // MIN_MATCH, 1)]
    mclip = jnp.minimum(morbit, n - 1)
    return morbit, best_len[mclip], best_dist[mclip]


def _tz_bytes_u32(x: jax.Array) -> jax.Array:
    """Trailing zero bytes of uint32 lanes (4 for x == 0)."""
    b0 = (x & 0xFF) == 0
    b1 = (x & 0xFFFF) == 0
    b2 = (x & 0xFFFFFF) == 0
    b3 = x == 0
    return (b0.astype(jnp.int32) + b1 + b2 + b3)


def find_matches_jax(data: np.ndarray, max_distance: int, quality: int = 1,
                     base: int = 0):
    """Host wrapper: pad to a bucket, run the device kernel per segment,
    extend cap-hit matches on host. Returns (pos, len, dist) int64."""
    ncand = 4 if quality >= 5 else 2
    n = len(data)
    seg = _BUCKETS[-1]
    all_m, all_l, all_d, all_f = [], [], [], []
    for lo in range(0, n, seg):
        hi = min(lo + seg, n)
        chunk = np.asarray(data[lo:hi])
        b = _bucket(len(chunk))
        padded = np.zeros(b, np.uint8)
        padded[:len(chunk)] = chunk
        npos = max(len(chunk) - 3, 0)
        use_pallas = jax.default_backend() != "cpu"
        if use_pallas:
            morbit, mlens, mdists = match_block(
                jnp.asarray(padded), jnp.int32(npos),
                jnp.int32(max_distance), num_candidates=ncand)
            morbit = np.asarray(morbit).astype(np.int64)
            valid = morbit < b
            m = morbit[valid]
            m_l = np.asarray(mlens).astype(np.int64)[valid]
            m_d = np.asarray(mdists).astype(np.int64)[valid]
        else:  # CPU backend (tests): host-side chain walk
            from .chain_pallas import chain_select_host
            skip, lens_all, dists_all = match_block(
                jnp.asarray(padded), jnp.int32(npos),
                jnp.int32(max_distance), num_candidates=ncand,
                use_pallas=False)
            sel = chain_select_host(np.asarray(skip))
            m = np.flatnonzero(sel).astype(np.int64)
            m_l = np.asarray(lens_all).astype(np.int64)[m]
            m_d = np.asarray(dists_all).astype(np.int64)[m]
        m_f = np.zeros(len(m), np.int64)
        m, m_l, m_d, m_f = _extend_capped(chunk, m, m_l, m_d, m_f, CAP,
                                          1 << 24)
        # dictionary probe over weak-match gaps (host, vectorized)
        if quality >= 5:
            from ..enc.matcher import add_dictionary_matches
            m, m_l, m_d, m_f = add_dictionary_matches(
                chunk, m, m_l, m_d, m_f, max_distance, base + lo)
        all_m.append(m + lo)
        all_l.append(m_l)
        all_d.append(m_d)
        all_f.append(m_f)
    if not all_m:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    return (np.concatenate(all_m), np.concatenate(all_l),
            np.concatenate(all_d), np.concatenate(all_f))
