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
