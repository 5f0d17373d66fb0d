"""Golden-file compatibility: every tests/testdata stream must decode
bit-exactly (mirrors the reference's compatibility suite,
CMakeLists.txt:295-312)."""

import re

import pytest

import brotli_tpu
from tests.conftest import ref_compress


def _pairs(testdata):
    for f in sorted(testdata.glob("*.compressed*")):
        base = re.sub(r"\.compressed(\.\d+)?$", "", f.name)
        yield f, testdata / base


def test_all_golden_files(testdata):
    count = 0
    for comp, raw in _pairs(testdata):
        assert brotli_tpu.decompress(comp.read_bytes()) == raw.read_bytes(), \
            comp.name
        count += 1
    assert count >= 40


@pytest.mark.parametrize("quality", [0, 1, 5, 9, 11])
def test_decode_reference_encoder_output(testdata, ref_cli, quality):
    for name in ("alice29.txt", "random_org_10k.bin", "monkey"):
        data = (testdata / name).read_bytes()
        comp = ref_compress(ref_cli, data, quality)
        assert brotli_tpu.decompress(comp) == data


def test_invalid_inputs_raise():
    for bad in (b"", b"\x00", b"\xff" * 16, b"garbage input here"):
        with pytest.raises(brotli_tpu.error):
            brotli_tpu.decompress(bad)


def test_trailing_garbage_rejected(testdata):
    comp = (testdata / "quickfox.compressed").read_bytes()
    with pytest.raises(brotli_tpu.error):
        brotli_tpu.decompress(comp + b"tail")


def test_fuzz_differential(testdata):
    """Chunk-mutation fuzz: Python and native decoders must agree on
    accept/reject and output (role parity: c/fuzz/decode_fuzzer.c)."""
    from brotli_tpu.tools.fuzz import run
    stats = run(iters=200, seed=1234, corpus=testdata)
    assert stats["accept"] + stats["reject"] == 200


def test_incremental_decoder_chunked():
    """Byte-at-a-time and odd-chunk feeding must produce identical
    output (resumable streaming; NEEDS_MORE_INPUT parity)."""
    import brotli_tpu
    from brotli_tpu.dec.decoder import IncrementalDecoder

    data = (b"incremental " * 3000) + bytes(range(256)) * 20
    blob = brotli_tpu.compress(data, quality=5, lgblock=16)
    for step in (1, 7, 113, 4096):
        inc = IncrementalDecoder()
        got = bytearray()
        for i in range(0, len(blob), step):
            got += inc.feed(blob[i:i + step])
        assert inc.finished and bytes(got) == data, step
    # Decompressor with output_buffer_limit drains progressively
    d = brotli_tpu.Decompressor()
    out = bytearray(d.process(blob, output_buffer_limit=1000))
    assert len(out) <= 1000
    while not d.is_finished():
        chunk = d.process(b"", output_buffer_limit=1000)
        out += chunk
        assert len(chunk) <= 1000
    assert bytes(out) == data


def test_device_decode_golden(testdata):
    """Device-path decode (SURVEY 7 step 2): host symbol parse +
    device LZ resolution by log-step pointer doubling. EVERY golden
    stream must decode bit-exactly -- context-modeled literals
    included (the parser peeks the <=2 context bytes through the
    deferred copy graph, decoder._dz_byte_at). Streams >100 KB are
    skipped for suite time by default; set BROTLI_TPU_FULL_SWEEP=1
    (the CI nightly job / pre-release check) to run the full 45/45
    contract machine-checked instead of trusting a docstring."""
    import os
    import re
    from brotli_tpu.dec.device_decode import decompress_device
    full = bool(os.environ.get("BROTLI_TPU_FULL_SWEEP"))
    ok = 0
    for f in sorted(testdata.glob("*.compressed*")):
        if not full and f.stat().st_size > 100_000:
            continue
        base = re.sub(r"\.compressed(\.\d+)?$", "", f.name)
        want = (testdata / base).read_bytes()
        assert decompress_device(f.read_bytes()) == want, f.name
        ok += 1
    assert ok >= (45 if full else 41), ok


def test_device_decode_own_streams(testdata):
    """Our own q1/q5 output (trivial context maps at small sizes)
    through the device decode path, including overlapping copies and
    dictionary words."""
    from brotli_tpu.dec.device_decode import (decompress_device,
                                              UnsupportedForDevice)
    import brotli_tpu
    payloads = [
        b"abcabcabcabc" * 400,                     # overlapping copies
        (testdata / "alice29.txt").read_bytes(),   # text w/ dict words
        b"\x00" * 100000,                          # RLE chains
    ]
    ok = 0
    for p in payloads:
        for q in (1, 5):
            blob = brotli_tpu.compress(p, quality=q)
            try:
                assert decompress_device(blob) == p
                ok += 1
            except UnsupportedForDevice:
                pass
    assert ok >= 3, ok
