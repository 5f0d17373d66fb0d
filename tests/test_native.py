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
