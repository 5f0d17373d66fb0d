"""LZ77 match finding, host path.

Vectorized-first design that mirrors the TPU kernel pipeline
(brotli_tpu/ops/matcher_jax.py): rolling hashes and candidate discovery
are batched array ops; only final greedy parse runs serially. The hash
is multiplicative over 4-byte windows -- semantics equivalent to the
reference's H4/H5 family (c/enc/hash_longest_match_quickly_inc.h), not a
translation of it.

Commands are (insert_len, copy_len, distance) with distance == 0 meaning
"final insert-only command".
"""

import numpy as np

MIN_MATCH = 4
HASH_MUL = np.uint32(0x1E35A7BD)


def hash4(data: np.ndarray, hash_bits: int) -> np.ndarray:
    """Multiplicative hash of every 4-byte window; shape (n-3,)."""
    d = data.astype(np.uint32)
    word = d[:-3] | (d[1:-2] << 8) | (d[2:-1] << 16) | (d[3:] << 24)
    return ((word * HASH_MUL) >> np.uint32(32 - hash_bits)).astype(np.int64)


def _match_len(data, a: int, b: int, max_len: int) -> int:
    """Common-prefix length of data[a:] vs data[b:], capped."""
    n = min(max_len, len(data) - b)
    ln = 0
    # compare in 64-byte strides, numpy-vectorized
    while ln < n:
        step = min(64, n - ln)
        da = data[a + ln:a + ln + step]
        db = data[b + ln:b + ln + step]
        neq = np.flatnonzero(da != db)
        if len(neq):
            return ln + int(neq[0])
        ln += step
    return n


def find_matches_greedy(data: np.ndarray, max_distance: int,
                        hash_bits: int = 17, min_quality_len: int = 4):
    """Greedy single-probe matcher (quality-1-like).

    Returns list of commands (insert_len, copy_len, distance) covering
    `data`, final command has distance 0 and copy_len 0.
    """
    n = len(data)
    cmds = []
    if n < MIN_MATCH + 4:
        if n:
            cmds.append((n, 0, 0))
        return cmds
    hashes = hash4(data, hash_bits)
    table = np.full(1 << hash_bits, -1, dtype=np.int64)
    anchor = 0
    pos = 0
    limit = n - MIN_MATCH
    while pos <= limit:
        h = hashes[pos]
        cand = table[h]
        table[h] = pos
        if cand >= 0 and pos - cand <= max_distance and \
                data[cand] == data[pos] and data[cand + 1] == data[pos + 1] \
                and data[cand + 2] == data[pos + 2] \
                and data[cand + 3] == data[pos + 3]:
            ln = _match_len(data, cand, pos, n - pos)
            if ln >= min_quality_len:
                cmds.append((pos - anchor, ln, pos - cand))
                # insert hashes sparsely inside the match (stride keeps
                # the serial loop cheap; the TPU path hashes everything)
                end = min(pos + ln, limit)
                step = 1 if ln < 64 else 4
                for p in range(pos + 1, end, step):
                    table[hashes[p]] = p
                pos += ln
                anchor = pos
                continue
        pos += 1
    if anchor < n:
        cmds.append((n - anchor, 0, 0))
    return cmds
