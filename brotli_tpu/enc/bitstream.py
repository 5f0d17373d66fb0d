"""RFC 7932 bitstream assembly: stream header + metablock serialization.

Round-1 writer: single block type per category, trivial context maps,
one optimal Huffman tree per alphabet ("StoreMetaBlockTrivial" semantics,
parity anchor c/enc/brotli_bit_stream.c:43-74). Context-mapped multi-tree
stores land with the quality ladder.
"""

import numpy as np

from ..format import constants as C
from ..format import prefix
from ..format.bitio import BitWriter
from .entropy import lengths_to_codes, package_merge, write_huffman_code

MAX_MLEN = 1 << 24


def write_stream_header(bw: BitWriter, window_bits: int) -> None:
    """WBITS encoding (RFC 9.1; inverse of c/dec/decode.c
    DecodeWindowBits)."""
    if window_bits == 16:
        bw.write(0, 1)
    elif 18 <= window_bits <= 24:
        bw.write(1, 1)
        bw.write(window_bits - 17, 3)
    elif window_bits == 17:
        bw.write(1, 1)
        bw.write(0, 3)
        bw.write(0, 3)
    elif 10 <= window_bits <= 15:
        bw.write(1, 1)
        bw.write(0, 3)
        bw.write(window_bits - 8, 3)
    else:
        raise ValueError(f"invalid window bits {window_bits}")


def write_varlen_uint8(bw: BitWriter, value: int) -> None:
    if value == 0:
        bw.write(0, 1)
        return
    bw.write(1, 1)
    nbits = value.bit_length() - 1
    bw.write(nbits, 3)
    if nbits:
        bw.write(value - (1 << nbits), nbits)
    # NB: value 1 encodes as '1' + '000'


def write_metablock_header_mlen(bw: BitWriter, mlen: int, is_last: bool,
                                is_uncompressed: bool = False) -> None:
    bw.write(1 if is_last else 0, 1)
    if is_last:
        bw.write(0, 1)  # not empty
    nibbles = 4 if mlen <= (1 << 16) else 5 if mlen <= (1 << 20) else 6
    bw.write(nibbles - 4, 2)
    v = mlen - 1
    for i in range(nibbles):
        bw.write((v >> (4 * i)) & 0xF, 4)
    if not is_last:
        bw.write(1 if is_uncompressed else 0, 1)


def write_uncompressed_metablock(bw: BitWriter, data: bytes) -> None:
    write_metablock_header_mlen(bw, len(data), is_last=False,
                                is_uncompressed=True)
    bw.align_to_byte()
    arr = np.frombuffer(data, dtype=np.uint8)
    bw.write_arrays(arr.astype(np.int64), np.full(len(arr), 8, np.int64))


def write_last_empty(bw: BitWriter) -> None:
    bw.write(1, 1)  # ISLAST
    bw.write(1, 1)  # ISLASTEMPTY


class CommandPlan:
    """Commands of one metablock resolved to symbol streams."""

    __slots__ = ("cmd_syms", "insert_extras", "copy_extras", "dist_syms",
                 "dist_extras", "has_dist", "literals", "last_distance")

    def __init__(self, data: np.ndarray, block_start: int, cmds,
                 last_distance: int):
        """`cmds`: (insert_len, copy_len, distance) with distance 0 for the
        trailing insert-only command. `data` is the full stream so far so
        literals can reach it at absolute positions."""
        n = len(cmds)
        self.cmd_syms = np.zeros(n, np.int32)
        self.insert_extras = np.zeros((n, 2), np.int32)  # (value, bits)
        self.copy_extras = np.zeros((n, 2), np.int32)
        self.dist_syms = np.full(n, -1, np.int32)
        self.dist_extras = np.zeros((n, 2), np.int32)
        self.has_dist = np.zeros(n, bool)
        lit_chunks = []
        pos = block_start
        for k, (ins, cpy, dist) in enumerate(cmds):
            icode, iextra, ibits = prefix.encode_value(
                ins, prefix.INSERT_BASE, prefix.INSERT_EXTRA)
            if dist == 0 and cpy == 0:
                ccode, cextra, cbits = 0, 0, 0  # dummy copy part, unread
                implicit = icode < 8
            else:
                ccode, cextra, cbits = prefix.encode_value(
                    cpy, prefix.COPY_BASE, prefix.COPY_EXTRA)
                implicit = (dist == last_distance and icode < 8
                            and ccode < 16)
                if not implicit:
                    self.has_dist[k] = True
                    if dist == last_distance:
                        self.dist_syms[k] = 0  # short code: last distance
                    else:
                        dcode, dextra, dbits = prefix.encode_distance(
                            dist, npostfix=0, ndirect=0)
                        self.dist_syms[k] = dcode
                        self.dist_extras[k] = (dextra, dbits)
                        last_distance = dist
            self.cmd_syms[k] = prefix.combine_cmd_code(icode, ccode, implicit)
            self.insert_extras[k] = (iextra, ibits)
            self.copy_extras[k] = (cextra, cbits)
            lit_chunks.append(data[pos:pos + ins])
            pos += ins + cpy
        self.literals = (np.concatenate(lit_chunks) if lit_chunks
                         else np.zeros(0, np.uint8))
        self.last_distance = last_distance


def store_metablock_trivial(bw: BitWriter, data: np.ndarray,
                            block_start: int, mlen: int, cmds,
                            is_last: bool, last_distance: int) -> int:
    """Serialize one compressed metablock with single-tree histograms.

    Returns the updated decoder-visible last distance.
    """
    plan = CommandPlan(data, block_start, cmds, last_distance)

    write_metablock_header_mlen(bw, mlen, is_last)
    for _ in range(3):  # NBLTYPES L/I/D = 1
        write_varlen_uint8(bw, 0)
    bw.write(0, 2)  # NPOSTFIX = 0
    bw.write(0, 4)  # NDIRECT = 0
    bw.write(0, 2)  # literal context mode LSB6 (irrelevant: 1 tree)
    write_varlen_uint8(bw, 0)  # literal context map: 1 tree
    write_varlen_uint8(bw, 0)  # distance context map: 1 tree

    lit_freq = np.bincount(plan.literals, minlength=C.NUM_LITERAL_SYMBOLS)
    cmd_freq = np.bincount(plan.cmd_syms, minlength=C.NUM_COMMAND_SYMBOLS)
    dsyms = plan.dist_syms[plan.has_dist]
    dist_freq = np.bincount(dsyms, minlength=64) if len(dsyms) else \
        np.zeros(64, np.int64)

    lit_len = package_merge(lit_freq, C.HUFFMAN_MAX_CODE_LENGTH)
    cmd_len = package_merge(cmd_freq, C.HUFFMAN_MAX_CODE_LENGTH)
    dist_len = package_merge(dist_freq, C.HUFFMAN_MAX_CODE_LENGTH)
    write_huffman_code(bw, lit_len, C.NUM_LITERAL_SYMBOLS)
    write_huffman_code(bw, cmd_len, C.NUM_COMMAND_SYMBOLS)
    write_huffman_code(bw, dist_len, 64)

    # single-symbol alphabets decode with zero bits per symbol
    def emission(lengths):
        if np.count_nonzero(lengths) <= 1:
            return np.zeros_like(lengths)
        return lengths

    lit_len = emission(lit_len)
    cmd_len = emission(cmd_len)
    dist_len = emission(dist_len)
    lit_codes = lengths_to_codes(lit_len)
    cmd_codes = lengths_to_codes(cmd_len)
    dist_codes = lengths_to_codes(dist_len)

    lit_pos = 0
    for k in range(len(plan.cmd_syms)):
        s = int(plan.cmd_syms[k])
        bw.write(int(cmd_codes[s]), int(cmd_len[s]))
        iv, ib = plan.insert_extras[k]
        if ib:
            bw.write(int(iv), int(ib))
        cv, cb = plan.copy_extras[k]
        if cb:
            bw.write(int(cv), int(cb))
        icode = prefix.cmd_lut()["insert_base"][s]
        ins = int(icode) + int(iv)
        for b in plan.literals[lit_pos:lit_pos + ins]:
            bw.write(int(lit_codes[b]), int(lit_len[b]))
        lit_pos += ins
        if plan.has_dist[k]:
            d = int(plan.dist_syms[k])
            bw.write(int(dist_codes[d]), int(dist_len[d]))
            dv, db = plan.dist_extras[k]
            if db:
                bw.write(int(dv), int(db))
    return plan.last_distance
