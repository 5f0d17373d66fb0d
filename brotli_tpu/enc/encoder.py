"""Encoder orchestration: quality dispatch, metablock partitioning,
uncompressed fallback, streaming. (Parity anchor: c/enc/encode.c
EncodeData / WriteMetaBlockInternal / BrotliEncoderCompress.)
"""

import numpy as np

from ..format import constants as C
from ..format.bitio import BitWriter
from . import bitstream, matcher

_DEFAULT_MB_BITS = 22  # metablock size (lgblock); <= 24


def _sanitize_params(quality, lgwin, lgblock):
    quality = max(0, min(11, int(quality)))
    lgwin = max(C.MIN_WINDOW_BITS, min(C.MAX_WINDOW_BITS, int(lgwin)))
    if lgblock == 0:
        lgblock = min(_DEFAULT_MB_BITS, max(16, lgwin))
    lgblock = max(C.MIN_INPUT_BLOCK_BITS,
                  min(C.MAX_INPUT_BLOCK_BITS, int(lgblock)))
    return quality, lgwin, lgblock


def partition_commands(cmds, boundaries):
    """Split a global command stream at metablock boundaries.

    `boundaries` are absolute end offsets (ascending, last == total
    length). Inserts split freely; copies split into pieces with the same
    distance (later pieces become cheap last-distance references); 1-byte
    copy fragments are demoted to literals (always valid: literal bytes
    come from the original data). Each block's trailing pending insert
    becomes a final insert-only command.
    """
    blocks = []
    cur = []
    pend_ins = 0
    pos = 0
    b = 0

    def close_block():
        nonlocal cur, pend_ins, b
        if pend_ins:
            cur.append((pend_ins, 0, 0))
            pend_ins = 0
        blocks.append(cur)
        cur = []
        b += 1

    for ins, cpy, dist in cmds:
        while ins:
            room = boundaries[b] - pos
            take = min(ins, room)
            pend_ins += take
            pos += take
            ins -= take
            if pos == boundaries[b]:
                close_block()
        while cpy:
            room = boundaries[b] - pos
            if room == 0:
                close_block()
                continue
            take = min(cpy, room)
            if cpy - take == 1:
                take -= 1  # never leave a 1-byte copy remnant
            if take < 2:
                # demote to a literal (bytes always exist in `data`)
                pend_ins += 1
                pos += 1
                cpy -= 1
            else:
                cur.append((pend_ins, take, dist))
                pend_ins = 0
                pos += take
                cpy -= take
            if pos == boundaries[b]:
                close_block()
    if pend_ins or b < len(boundaries):
        while b < len(boundaries) - 1:
            close_block()
        if pend_ins:
            cur.append((pend_ins, 0, 0))
        if cur or not blocks:
            blocks.append(cur)
    return blocks


def encode(data: bytes, quality: int = 11, lgwin: int = 22,
           lgblock: int = 0, mode: int = 0, dictionary=None) -> bytes:
    """One-shot encode."""
    quality, lgwin, lgblock = _sanitize_params(quality, lgwin, lgblock)
    bw = BitWriter()
    bitstream.write_stream_header(bw, lgwin)
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(arr)
    if n == 0:
        bitstream.write_last_empty(bw)
        return bw.getvalue()

    max_distance = C.max_backward_distance(lgwin)
    cmds = matcher.find_matches_greedy(arr, max_distance)

    mb_size = 1 << lgblock
    boundaries = list(range(mb_size, n, mb_size)) + [n]
    blocks = partition_commands(cmds, boundaries)
    assert len(blocks) == len(boundaries), (len(blocks), len(boundaries))

    last_distance = -1  # conservatively unknown (ring inits {16,15,11,4})
    pos = 0
    for bi, block_cmds in enumerate(blocks):
        is_last = bi == len(blocks) - 1
        mlen = boundaries[bi] - pos
        last_distance = bitstream.store_metablock_trivial(
            bw, arr, pos, mlen, block_cmds, is_last, last_distance)
        pos = boundaries[bi]
    bw.align_to_byte()
    out = bw.getvalue()
    if len(out) >= n + 4:
        return _store_uncompressed(arr, lgwin)
    return out


def _store_uncompressed(arr, lgwin) -> bytes:
    """Whole-input uncompressed fallback (parity: encode.c
    MakeUncompressedStream)."""
    bw = BitWriter()
    bitstream.write_stream_header(bw, lgwin)
    n = len(arr)
    pos = 0
    while pos < n:
        chunk = min(n - pos, bitstream.MAX_MLEN)
        bitstream.write_uncompressed_metablock(
            bw, arr[pos:pos + chunk].tobytes())
        pos += chunk
    bitstream.write_last_empty(bw)
    bw.align_to_byte()
    return bw.getvalue()


class StreamingEncoder:
    """Streaming wrapper around the block encoder.

    Buffered input is emitted on flush()/finish(); each flush ends with
    an empty metadata block to byte-align the stream, so every flushed
    prefix is independently decodable (parity: BROTLI_OPERATION_FLUSH,
    c/include/brotli/encode.h:100-116). Later chunks may reference
    earlier output through the LZ window (`_history`).
    """

    def __init__(self, quality=11, lgwin=22, lgblock=0, mode=0):
        self.params = _sanitize_params(quality, lgwin, lgblock)
        self.mode = mode
        self._buf = bytearray()
        self._started = False
        self._finished = False
        self._bw = BitWriter()
        self._history = bytearray()
        self._last_distance = -1

    def _ensure_header(self):
        if not self._started:
            bitstream.write_stream_header(self._bw, self.params[1])
            self._started = True

    def process(self, chunk: bytes) -> bytes:
        if self._finished:
            raise ValueError("encoder already finished")
        self._buf += chunk
        return b""

    def _emit_buffered(self, is_last: bool):
        _, lgwin, lgblock = self.params
        self._ensure_header()
        if not self._buf:
            if is_last:
                bitstream.write_last_empty(self._bw)
            return
        data = bytes(self._history) + bytes(self._buf)
        arr = np.frombuffer(data, dtype=np.uint8)
        start = len(self._history)
        cmds = matcher.find_matches_greedy(
            arr, C.max_backward_distance(lgwin))
        mb = 1 << lgblock
        boundaries = [start] + list(range(start + mb, len(arr), mb)) + \
            [len(arr)]
        blocks = partition_commands(cmds, boundaries)
        pos = start
        for bi in range(1, len(blocks)):
            block_is_last = is_last and bi == len(blocks) - 1
            mlen = boundaries[bi] - pos
            self._last_distance = bitstream.store_metablock_trivial(
                self._bw, arr, pos, mlen, blocks[bi], block_is_last,
                self._last_distance)
            pos = boundaries[bi]
        self._history = bytearray(data[-(1 << lgwin):])
        self._buf.clear()

    def flush(self) -> bytes:
        if self._finished:
            return b""
        self._emit_buffered(is_last=False)
        # empty metadata block byte-aligns the stream (decodable prefix)
        self._bw.write(0, 1)   # ISLAST
        self._bw.write(3, 2)   # MNIBBLES code -> metadata block
        self._bw.write(0, 1)   # reserved
        self._bw.write(0, 2)   # MSKIPBYTES = 0
        self._bw.align_to_byte()
        out = self._bw.getvalue()
        self._bw = BitWriter()
        return out

    def finish(self) -> bytes:
        if self._finished:
            return b""
        self._ensure_header()
        self._emit_buffered(is_last=True)
        self._finished = True
        self._bw.align_to_byte()
        out = self._bw.getvalue()
        self._bw = BitWriter()
        return out
