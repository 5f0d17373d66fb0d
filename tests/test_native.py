"""Native (C) decoder: golden parity + fuzz-smoke + API wiring."""

import re

import numpy as np
import pytest

import brotli_tpu

try:
    from brotli_tpu.native import decode as native_decode
    HAVE_NATIVE = True
except Exception:  # pragma: no cover - toolchain missing
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native build unavailable")


def test_native_golden(testdata):
    for f in sorted(testdata.glob("*.compressed*")):
        base = re.sub(r"\.compressed(\.\d+)?$", "", f.name)
        assert native_decode(f.read_bytes()) == \
            (testdata / base).read_bytes(), f.name


def test_native_matches_python(testdata):
    from brotli_tpu.dec.decoder import decompress as py_decode
    comp = brotli_tpu.compress(
        (testdata / "asyoulik.txt").read_bytes(), quality=5)
    assert native_decode(comp) == py_decode(comp)


def test_native_rejects_invalid():
    for bad in (b"", b"\x00", b"\x91\x00\xff" * 7):
        with pytest.raises(ValueError):
            native_decode(bad)


def test_native_fuzz_smoke(testdata):
    rng = np.random.default_rng(3)
    base = bytearray((testdata / "quickfox.compressed").read_bytes())
    raw = (testdata / "quickfox").read_bytes()
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        try:
            native_decode(bytes(buf))
        except ValueError:
            pass
    # unmutated still fine afterwards
    assert native_decode(bytes(base)) == raw


def test_api_uses_native_by_default(testdata, monkeypatch):
    comp = (testdata / "monkey.compressed").read_bytes()
    want = (testdata / "monkey").read_bytes()
    assert brotli_tpu.decompress(comp) == want
    monkeypatch.setenv("BROTLI_TPU_DECODER", "python")
    assert brotli_tpu.decompress(comp) == want


def test_native_large_window(testdata, ref_cli):
    """Large-window extension in the native decoder (parity:
    c/dec/decode.c:146 DecodeWindowBits large branch)."""
    import subprocess
    from brotli_tpu.native import decode as native_decode
    data = (testdata / "alice29.txt").read_bytes()
    r = subprocess.run([ref_cli, "-c", "-q", "5", "--large_window=28"],
                       input=data, capture_output=True)
    assert r.returncode == 0
    assert native_decode(r.stdout, large_window=True) == data
    comp = brotli_tpu.compress(data, quality=5, lgwin=28,
                               large_window=True)
    assert native_decode(comp, large_window=True) == data
    with pytest.raises(ValueError):
        native_decode(comp)  # must be opted into


def test_native_compound_dictionary(testdata):
    """Attached raw (compound) dictionary decode in the native decoder
    (parity: decode.c:2230-2330 compound branch); static-dict address
    space shifts past the compound region."""
    from brotli_tpu.native import decode as native_decode
    data = (testdata / "alice29.txt").read_bytes()
    d = data[:30000]
    target = data[20000:80000]
    comp = brotli_tpu.compress(target, quality=5, dictionary=d)
    assert native_decode(comp, compound=d) == target
    # api routes the native path for raw dicts
    assert brotli_tpu.decompress(comp, dictionary=d) == target
    # q11 streams may also carry static-dict words alongside
    comp11 = brotli_tpu.compress(target, quality=11, dictionary=d)
    assert native_decode(comp11, compound=d) == target


def test_native_chunked_decode_golden(testdata):
    """Native chunked decoder (btpu_dec_chunk): metablock-granular
    resume must reproduce every golden stream fed in small pieces."""
    import re
    from brotli_tpu import native
    n = 0
    for f in sorted(testdata.glob("*.compressed")):
        base = re.sub(r"\.compressed$", "", f.name)
        comp = f.read_bytes()
        want = (testdata / base).read_bytes()
        d = native.StreamDecoder()
        out = []
        step = max(1, len(comp) // 7)
        for i in range(0, len(comp), step):
            out.append(d.feed(comp[i:i + step]))
        assert b"".join(out) == want, f.name
        assert d.finished, f.name
        n += 1
    assert n >= 10


def test_native_chunked_decode_flush_stream(testdata):
    """Flush-bounded streams decode incrementally: bytes of a flushed
    prefix arrive without seeing later input."""
    from brotli_tpu import native
    data = (testdata / "alice29.txt").read_bytes()
    enc = native.StreamEncoder(5, 22)
    half = len(data) // 2
    p1 = enc.process(data[:half]) + enc.flush()
    p2 = enc.process(data[half:]) + enc.finish()
    d = native.StreamDecoder()
    got1 = d.feed(p1)
    assert got1 == data[:half]  # flushed prefix fully decodable
    got2 = d.feed(p2)
    assert got1 + got2 == data and d.finished


def test_native_chunked_decode_trailing_garbage(testdata):
    from brotli_tpu import native
    import pytest
    data = (testdata / "asyoulik.txt").read_bytes()
    comp = native.encode(data, 5, 22)
    d = native.StreamDecoder()
    d.feed(comp)
    assert d.finished
    with pytest.raises(ValueError):
        d.feed(b"garbage")


def test_decompressor_streaming_compound_dict(testdata):
    """api.Decompressor with a raw compound dictionary rides the native
    chunked decoder (compound bytes pass straight through)."""
    import brotli_tpu
    data = (testdata / "alice29.txt").read_bytes()
    raw_dict = data[:30000]
    comp = brotli_tpu.compress(data, quality=5, dictionary=raw_dict)
    d = brotli_tpu.Decompressor(dictionary=raw_dict)
    out = []
    for i in range(0, len(comp), 4096):
        out.append(d.process(comp[i:i + 4096]))
    assert b"".join(out) == data and d.is_finished()


def test_chunked_decode_oneshot_agreement(testdata):
    """Random chunk feeding reproduces one-shot output; on mutated
    streams the chunked decoder never accepts what one-shot rejects."""
    import random
    from brotli_tpu import native
    rng = random.Random(99)
    data = (testdata / "alice29.txt").read_bytes()
    enc = native.encode(data, 5, 22)
    for t in range(12):
        bad = bytearray(enc)
        for _ in range(rng.randrange(1, 4)):
            bad[rng.randrange(len(bad))] = rng.randrange(256)
        bad = bytes(bad)
        try:
            one = native.decode(bad)
            one_ok = True
        except ValueError:
            one_ok = False
        d = native.StreamDecoder()
        got = []
        try:
            i = 0
            while i < len(bad):
                step = rng.randrange(1, 50000)
                got.append(d.feed(bad[i:i + step]))
                i += step
            chunk_ok = d.finished
        except ValueError:
            chunk_ok = False
        if one_ok and chunk_ok:
            assert b"".join(got) == one
        if not one_ok:
            assert not chunk_ok
