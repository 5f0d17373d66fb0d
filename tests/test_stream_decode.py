"""Suspend-anywhere streaming decode (dec/stream.py): any-bit
suspension, window-bounded buffers, precise errors (role parity:
BrotliDecoderDecompressStream + bit_reader save/restore)."""

import random
import re

import numpy as np
import pytest

import brotli_tpu
from brotli_tpu.dec.stream import StreamDecoder


def test_byte_at_a_time(testdata):
    comp = (testdata / "alice29.txt.compressed").read_bytes()
    want = (testdata / "alice29.txt").read_bytes()
    sd = StreamDecoder()
    out = bytearray()
    for i in range(len(comp)):
        out += sd.feed(comp[i:i + 1])
    out += sd.finish()
    assert bytes(out) == want


def test_golden_random_chunks(testdata):
    rng = random.Random(3)
    for f in sorted(testdata.glob("*.compressed")):
        base = re.sub(r"\.compressed$", "", f.name)
        data = f.read_bytes()
        expect = (testdata / base).read_bytes()
        sd = StreamDecoder()
        out = bytearray()
        i = 0
        while i < len(data):
            step = rng.randrange(1, 64)
            out += sd.feed(data[i:i + step])
            i += step
        out += sd.finish()
        assert bytes(out) == expect, f.name


def test_window_bounded_memory(testdata):
    """A stream much larger than the window must not buffer more than
    ~window bytes of output or unconsumed input (the round-1 decoder
    buffered whole metablocks)."""
    big = (testdata / "alice29.txt").read_bytes() * 120
    comp = brotli_tpu.compress(big, quality=5, lgwin=18)
    sd = StreamDecoder()
    total = 0
    for i in range(0, len(comp), 4096):
        total += len(sd.feed(comp[i:i + 4096]))
        if sd._out is not None:
            assert len(sd._out._buf) <= (1 << 18) + (1 << 17)
        assert len(sd._br._buf) <= (1 << 17) + 4096
    total += len(sd.finish())
    assert total == len(big)


def test_truncated_stream_errors(testdata):
    comp = (testdata / "alice29.txt.compressed").read_bytes()
    sd = StreamDecoder()
    sd.feed(comp[:100])
    from brotli_tpu.format.bitio import NeedMoreInput
    with pytest.raises(NeedMoreInput):
        sd.finish()


def test_invalid_stream_errors():
    from brotli_tpu.dec.decoder import FormatError
    sd = StreamDecoder()
    with pytest.raises(FormatError):
        sd.feed(b"\x14\xff\xff\xff\xff\xff\xff")
        sd.finish()


def test_metadata_callback_streaming(testdata):
    c = brotli_tpu.Compressor(quality=5)
    blob = c.emit_metadata(b"hello meta")
    blob += c.process(b"payload " * 1000)
    blob += c.finish()
    seen = []
    sd = StreamDecoder()
    sd.metadata_callback = seen.append
    out = bytearray()
    for i in range(0, len(blob), 7):
        out += sd.feed(blob[i:i + 7])
    out += sd.finish()
    assert bytes(out) == b"payload " * 1000
    assert b"hello meta" in seen


def test_native_mid_metablock_bounded_memory(testdata):
    """A SINGLE large compressed metablock fed in 64 KB chunks must
    decode through the native chunked decoder with the consumed
    counter advancing INSIDE the metablock (command/literal-run
    snapshots, the c/dec/bit_reader.h:73 save/restore role) so input
    retention stays O(chunk), not O(metablock)."""
    from brotli_tpu.native import StreamDecoder as NSD
    from brotli_tpu.enc import bitstream, matcher
    from brotli_tpu.format.bitio import BitWriter
    from brotli_tpu.format import constants as C

    rng = np.random.default_rng(7)
    text = (testdata / "lcet10.txt").read_bytes()
    data = (text * (6 * (1 << 20) // len(text) + 1))[: 6 << 20]
    arr = np.frombuffer(data, np.uint8)
    maxback = C.max_backward_distance(22)
    m, lens, dists, flags = matcher.find_matches_vectorized(arr, maxback)
    cmds = matcher.matches_to_commands(m, lens, dists, flags, 0,
                                       len(arr))
    bw = BitWriter()
    bitstream.write_stream_header(bw, 22)
    bitstream.store_metablock(bw, arr, 0, len(arr), cmds, True, None)
    blob = bw.getvalue()

    sd = NSD()
    out = bytearray()
    peak_buf = 0
    consumed_mid_metablock = False
    for i in range(0, len(blob), 64 << 10):
        out += sd.feed(blob[i:i + (64 << 10)])
        peak_buf = max(peak_buf, len(sd._buf))
        # consumed advances past the metablock header region while the
        # metablock is still open -> mid-metablock resume is live
        if not sd.finished and sd.consumed > (48 << 10):
            consumed_mid_metablock = True
    out += sd.feed(b"", final=True)
    assert bytes(out) == data
    assert consumed_mid_metablock
    # retained input stays O(chunk): the old metablock-granular driver
    # kept the WHOLE compressed metablock until it closed
    assert peak_buf < (128 << 10), peak_buf


def test_native_mid_metablock_long_literal_run():
    """A single command with a multi-MB literal run exercises the
    4096-literal snapshot points inside one command."""
    from brotli_tpu.native import StreamDecoder as NSD
    from brotli_tpu.enc import bitstream, matcher
    from brotli_tpu.format.bitio import BitWriter

    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, 3 << 20, dtype=np.uint8).tobytes()
    arr = np.frombuffer(data, np.uint8)
    cmds = matcher.matches_to_commands(
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros(0, np.int64), np.zeros(0, np.int64), 0, len(arr))
    bw = BitWriter()
    bitstream.write_stream_header(bw, 22)
    bitstream.store_metablock(bw, arr, 0, len(arr), cmds, True, None)
    blob = bw.getvalue()

    sd = NSD()
    out = bytearray()
    peak_buf = 0
    for i in range(0, len(blob), 64 << 10):
        out += sd.feed(blob[i:i + (64 << 10)])
        peak_buf = max(peak_buf, len(sd._buf))
    out += sd.feed(b"", final=True)
    assert bytes(out) == data
    assert peak_buf < (512 << 10), peak_buf
