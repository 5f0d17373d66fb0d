"""Encoder-side static dictionary matching (RFC 8, identity transform).

A sorted (4-byte-prefix, length, index) table over all 13,504 RFC
Appendix A words supports fully vectorized probing: positions gather
their 4-byte word, binary-search the table, and verify whole-word
equality with batched byte compares. (Re-design of the reference's
generated bucket LUT, c/enc/static_dict_lut.c + dictionary_hash.c --
the table here is derived from the dictionary blob at import time.)
"""

from functools import lru_cache

import numpy as np

from ..format import constants as C
from ..format import dictionary as dict_mod

MAX_PROBE = 8  # candidates examined per position


@lru_cache(maxsize=1)
def prefix_table():
    """Sorted arrays (key4 uint32, length int8, word_idx int16) over all
    dictionary words of length 4..24."""
    blob = dict_mod.dictionary_array()
    keys, lens, idxs = [], [], []
    for L in range(C.MIN_DICTIONARY_WORD_LENGTH,
                   C.MAX_DICTIONARY_WORD_LENGTH + 1):
        nbits = dict_mod.SIZE_BITS_BY_LENGTH[L]
        if nbits == 0:
            continue
        count = 1 << nbits
        off = dict_mod.OFFSETS_BY_LENGTH[L]
        words = blob[off:off + count * L].reshape(count, L)
        key = (words[:, 0].astype(np.uint32)
               | words[:, 1].astype(np.uint32) << 8
               | words[:, 2].astype(np.uint32) << 16
               | words[:, 3].astype(np.uint32) << 24)
        keys.append(key)
        lens.append(np.full(count, L, np.int8))
        idxs.append(np.arange(count, dtype=np.int32))
    keys = np.concatenate(keys)
    lens = np.concatenate(lens)
    idxs = np.concatenate(idxs)
    # sort by (key, -length): longest word first within a prefix group
    order = np.lexsort((-lens.astype(np.int32), keys))
    out = keys[order], lens[order], idxs[order]
    for a in out:
        a.setflags(write=False)
    return out


@lru_cache(maxsize=1)
def word_matrix():
    """All words padded to 24 bytes: uint8[NWORDS_TOTAL, 24] aligned with
    prefix_table() order, for batched verification."""
    keys, lens, idxs = prefix_table()
    blob = dict_mod.dictionary_array()
    n = len(keys)
    mat = np.zeros((n, C.MAX_DICTIONARY_WORD_LENGTH), np.uint8)
    for L in range(C.MIN_DICTIONARY_WORD_LENGTH,
                   C.MAX_DICTIONARY_WORD_LENGTH + 1):
        rows = np.flatnonzero(lens == L)
        if len(rows) == 0:
            continue
        off = dict_mod.OFFSETS_BY_LENGTH[L]
        words = blob[off:off + (1 << dict_mod.SIZE_BITS_BY_LENGTH[L]) * L]
        words = words.reshape(-1, L)
        mat[rows, :L] = words[idxs[rows]]
    mat.setflags(write=False)
    return mat


def probe(data: np.ndarray, positions: np.ndarray):
    """Vectorized dictionary probe at the given positions.

    Returns (word_len int64, word_idx int64) per position; word_len 0
    when no dictionary word matches the data there exactly.
    """
    keys, lens, idxs = prefix_table()
    mat = word_matrix()
    n = len(data)
    p = positions
    w4 = (data[p].astype(np.uint32)
          | data[np.minimum(p + 1, n - 1)].astype(np.uint32) << 8
          | data[np.minimum(p + 2, n - 1)].astype(np.uint32) << 16
          | data[np.minimum(p + 3, n - 1)].astype(np.uint32) << 24)
    lo = np.searchsorted(keys, w4, side="left")
    best_len = np.zeros(len(p), np.int64)
    best_idx = np.zeros(len(p), np.int64)
    # data window of 24 bytes at each position (zero-padded at the end)
    padded = np.concatenate([data, np.zeros(24, np.uint8)])
    win = padded[p[:, None] + np.arange(24)]
    remaining = n - p
    for probe_i in range(MAX_PROBE):
        cand = np.minimum(lo + probe_i, len(keys) - 1)
        ok = keys[cand] == w4
        L = lens[cand].astype(np.int64)
        ok &= L <= remaining
        eq = (win == mat[cand]) | (np.arange(24) >= L[:, None])
        full = eq.all(axis=1) & ok
        better = full & (L > best_len)
        best_len = np.where(better, L, best_len)
        best_idx = np.where(better, idxs[cand], best_idx)
    return best_len, best_idx


def dict_distance(pos, word_len, word_idx, max_backward):
    """Stream distance encoding a dictionary reference at `pos`
    (identity transform): distance = max_distance + 1 + word_idx."""
    max_dist = np.minimum(pos, max_backward)
    return max_dist + 1 + word_idx
