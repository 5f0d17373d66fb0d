"""Round-5 native matcher/parse machinery: the long-range table's
repeat safety net, the binary-tree DP fallback, and the native
deferred symbol parse against its python oracle."""

import numpy as np
import pytest


def test_long_range_repeat_safety_net():
    """A window-scale exact repeat of high-entropy data must be caught
    at q5 (regression: 15-bit primary buckets flood on random bytes
    and the pre-LR matcher emitted the second half nearly raw,
    3.1 MB for a 2+2 MB dup; the 16-byte-keyed long-range table plus
    distance-ring propagation keeps it ~half)."""
    import brotli_tpu
    rng = np.random.default_rng(1)
    half = rng.integers(0, 256, 2 << 20).astype(np.uint8).tobytes()
    out = brotli_tpu.compress(half + half, quality=5)
    assert len(out) < len(half) * 1.05, len(out)
    assert brotli_tpu.decompress(out) == half + half


def test_q11_ring_fallback_matches_bt(testdata, ref_cli, monkeypatch):
    """BTPU_OPT_NO_BT=1 routes the q11 DP back to the bucket-ring
    walk; output must stay reference-decodable and within a whisker
    of the binary-tree build (the tree is a speed structure, not a
    format feature)."""
    import subprocess
    import brotli_tpu
    data = (testdata / "asyoulik.txt").read_bytes()
    bt = brotli_tpu.compress(data, quality=11)
    monkeypatch.setenv("BTPU_OPT_NO_BT", "1")
    rings = brotli_tpu.compress(data, quality=11)
    for blob in (bt, rings):
        r = subprocess.run([ref_cli, "-d", "-c"], input=blob,
                           capture_output=True)
        assert r.returncode == 0 and r.stdout == data
    assert abs(len(rings) - len(bt)) < len(bt) * 0.01, \
        (len(bt), len(rings))


def test_native_parse_stream_matches_python_oracle(testdata):
    """btpu_parse_stream's command graph must equal the python
    deferred parser's on real streams (context-modeled literals and
    folded dictionary words included) -- the python parser is the
    oracle for the device-decode front end."""
    from brotli_tpu import native
    from brotli_tpu.dec.decoder import Decoder
    for name in ("alice29.txt.compressed", "mapsdatazrh.compressed",
                 "cp852-utf8.compressed"):
        f = testdata / name
        if not f.exists():
            pytest.skip(f"{name} missing")
        blob = f.read_bytes()
        lits, cn, cc, cd, mdep = native.parse_stream(blob)
        d = Decoder()
        d.defer_lz = {"lits": bytearray(), "nlit": [], "ncopy": [],
                      "dist": []}
        d.decompress(blob)
        g = d.defer_lz
        assert lits == bytes(g["lits"]), name

        # the graphs coalesce literal runs differently (the C parse
        # rolls literals into the next copy); compare the canonical
        # form: (absolute output position, len, dist) of every copy
        def copies(nlit, ncopy, dist):
            out, pos = [], 0
            for a, b, c in zip(nlit, ncopy, dist):
                pos += a
                if b:
                    out.append((pos, int(b), int(c)))
                pos += b
            return out

        assert copies(cn, cc, cd) == \
            copies(g["nlit"], g["ncopy"], g["dist"]), name
        assert mdep >= 0
