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


UPPERCASE_FIRST_ID = 9  # bare UPPERCASE_FIRST in the RFC transform set

# omit-last-k identity transforms by cutoff length (parity:
# kCutoffTransforms, c/enc/hash.h:67-70 / static_dict.c:130-133):
# a length-L word matching only its first L-k bytes still matches,
# through transform OMIT_LAST_k
CUTOFF_TRANSFORM_IDS = np.array([0, 12, 27, 23, 42, 63, 56, 48, 59, 64],
                                np.int64)


def probe(data: np.ndarray, positions: np.ndarray):
    """Vectorized dictionary probe at the given positions.

    Returns (word_len int64, word_idx int64, transform int64) per
    position; word_len is the OUTPUT length (0 = no match). Matching
    forms: identity, omit-last-1..9 cutoffs of longer words (parity:
    kCutoffTransforms, hash.h:67-70), and bare UPPERCASE_FIRST for
    ASCII-capitalized occurrences (parity:
    BrotliFindAllStaticDictionaryMatches).
    """
    keys, lens, idxs = prefix_table()
    mat = word_matrix()
    n = len(data)
    p = np.asarray(positions, np.int64)
    padded = np.concatenate([data, np.zeros(24, np.uint8)])
    best_len = np.zeros(len(p), np.int64)   # output length
    best_wlen = np.zeros(len(p), np.int64)  # base word length
    best_idx = np.zeros(len(p), np.int64)
    best_tr = np.zeros(len(p), np.int64)

    # phase 1: cheap 4-byte key per position; the expensive 24-byte
    # windows materialize only for key hits (typically a small
    # fraction of positions)
    b = [padded[p + i].astype(np.uint32) for i in range(4)]
    first = b[0]
    is_upper = (first >= 0x41) & (first <= 0x5A)
    for transform, tid in ((0, 0), (1, UPPERCASE_FIRST_ID)):
        f0 = np.where(is_upper, first | 0x20, first) if transform \
            else first
        w4_all = f0 | b[1] << 8 | b[2] << 16 | b[3] << 24
        lo_all = np.searchsorted(keys, w4_all, side="left")
        hit = keys[np.minimum(lo_all, len(keys) - 1)] == w4_all
        if transform:
            hit &= is_upper
        sub = np.flatnonzero(hit)
        if len(sub) == 0:
            continue
        ps = p[sub]
        win = padded[ps[:, None] + np.arange(24)]
        w = win if not transform else win.copy()
        if transform:
            w[:, 0] = (w[:, 0] | 0x20)
        w4 = w4_all[sub]
        lo = lo_all[sub]
        remaining = n - ps
        for probe_i in range(MAX_PROBE):
            cand = np.minimum(lo + probe_i, len(keys) - 1)
            ok = keys[cand] == w4
            L = lens[cand].astype(np.int64)
            eq = (w == mat[cand]) | (np.arange(24) >= L[:, None])
            full = eq.all(axis=1) & ok & (L <= remaining)
            better = full & (L > best_len[sub])
            best_len[sub[better]] = L[better]
            best_wlen[sub[better]] = L[better]
            best_idx[sub[better]] = idxs[cand[better]]
            best_tr[sub[better]] = tid
            if transform == 0:
                # cutoff forms: the word matches only its first cp
                # bytes -> OMIT_LAST_(L-cp) (hash.h kCutoffTransforms)
                cp = np.argmin(eq, axis=1)
                cp = np.where(eq.all(axis=1), 24, cp)
                cp = np.minimum(cp, np.minimum(L, remaining))
                cut = L - cp
                cut_ok = ok & (cut >= 1) & (cut <= 9) & (cp >= 4)
                better = cut_ok & (cp > best_len[sub])
                if np.any(better):
                    tr = CUTOFF_TRANSFORM_IDS[np.clip(cut, 0, 9)]
                    best_len[sub[better]] = cp[better]
                    best_wlen[sub[better]] = L[better]
                    best_idx[sub[better]] = idxs[cand[better]]
                    best_tr[sub[better]] = tr[better]
    return best_len, best_wlen, best_idx, best_tr


def dict_distance(pos, word_len, word_idx, max_backward, transform=0):
    """Stream distance encoding a dictionary reference at `pos`:
    distance = max_distance + 1 + (transform << nbits | word_idx)
    (RFC 8 address packing)."""
    nbits = np.asarray(dict_mod.SIZE_BITS_BY_LENGTH, np.int64)[
        np.clip(word_len, 0, C.MAX_DICTIONARY_WORD_LENGTH)]
    max_dist = np.minimum(pos, max_backward)
    return max_dist + 1 + (np.asarray(transform, np.int64) << nbits |
                           word_idx)
