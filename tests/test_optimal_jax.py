"""Device q10/11 optimal-parse DP (ops/optimal_jax.py) on the CPU
backend with shrunken segment buckets: the production TPU path must
produce valid, non-overlapping matches whose serialization decodes
through the reference CLI (zopfli role parity:
c/enc/backward_references_hq.c, validated end-to-end)."""

import subprocess

import numpy as np
import pytest

from brotli_tpu.format import constants as C


@pytest.fixture(scope="module")
def small_segments():
    from brotli_tpu.ops import optimal_jax as OJ
    old_seg, old_buckets = OJ.SEG, OJ._BUCKETS
    OJ.SEG, OJ._BUCKETS = 1 << 17, [1 << 17]
    yield OJ
    OJ.SEG, OJ._BUCKETS = old_seg, old_buckets


@pytest.mark.parametrize("dp_mode,size", [("v1", 300_000),
                                          ("v3", 140_000)])
def test_device_dp_parse_roundtrip(small_segments, testdata, ref_cli,
                                   monkeypatch, dp_mode, size):
    """Both DP pipelines: v1 (pure-XLA wavefront, the CPU path) and v3
    (Pallas suffix-min pre-reduction, the PRODUCTION TPU path, run here
    under pallas interpret mode — smaller input because interpret mode
    executes the kernel body per grid point)."""
    monkeypatch.setenv("BROTLI_TPU_DP", dp_mode)
    OJ = small_segments
    data = (testdata / "alice29.txt").read_bytes()[:size]
    arr = np.frombuffer(data, dtype=np.uint8)
    maxback = C.max_backward_distance(22)
    m, lens, dists, flags = OJ.find_matches_optimal_jax(arr, maxback, 11)
    assert len(m) > 1000
    # invariants: sorted, non-overlapping, valid lengths and distances
    assert np.all(np.diff(m) > 0)
    assert np.all(m[1:] >= (m + lens)[:-1])
    assert np.all(lens >= 2)
    lz = flags == 0
    assert np.all(dists[lz] >= 1)
    src = m - dists
    assert np.all(src[lz] >= 0)
    for s, p, l in zip(src[lz][:500], m[lz][:500], lens[lz][:500]):
        assert bytes(arr[s:s + l]) == bytes(arr[p:p + l])

    # serialize + reference CLI roundtrip
    from brotli_tpu.format.bitio import BitWriter
    from brotli_tpu.enc import bitstream, encoder as E
    bw = BitWriter()
    bitstream.write_stream_header(bw, 22)
    E._write_blocks(bw, arr, 0, len(arr), (m, lens, dists, flags), 22,
                    is_last=True, ring=None, quality=11, ctx_floor=0)
    bw.align_to_byte()
    comp = bw.getvalue()
    r = subprocess.run([ref_cli, "-d", "-c"], input=comp,
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == data
    # parse quality: within 10% of the reference's q11 output
    ref = subprocess.run([ref_cli, "-c", "-q", "11", "-w", "22"],
                         input=data, capture_output=True).stdout
    assert len(comp) <= len(ref) * 1.10


def test_cost_tables_cover_unseen_bytes(testdata):
    """Literal-cost marginalization must price EVERY [p1, byte] row
    positively, even for p1 values outside the sampled prefix
    (regression: zero-cost literals re-literalized whole regions)."""
    from brotli_tpu.ops import optimal_jax as OJ
    from brotli_tpu.enc.matcher import find_matches_vectorized
    # text prefix + binary tail beyond any plausible sample prefix cut
    text = (testdata / "alice29.txt").read_bytes()
    rng = np.random.default_rng(0)
    binary = rng.integers(0, 256, 1 << 16).astype(np.uint8).tobytes()
    data = np.frombuffer(text + binary, np.uint8)
    seed = find_matches_vectorized(data, C.max_backward_distance(22),
                                   num_candidates=2, use_dict=False)
    litbits_q, copyq, dist_bits_q = OJ._cost_tables(data, seed)
    assert litbits_q.shape == (256, 256)
    # every row must carry real cost (>= ~1 bit quantized)
    assert litbits_q.min() >= 0
    assert (litbits_q.max(axis=1) > 0).all()
    row_mean = litbits_q.mean(axis=1)
    assert (row_mean > OJ.QB).all(), row_mean.min()


def test_streamed_q11_matches_batch(small_segments, testdata, ref_cli):
    """The pipelined q11 encode (serialization overlapped with device
    compute; native matches-array serializer with byte-aligned span
    stitches) must be reference-decodable and within a whisker of the
    batch path's size (spans add ~2 bytes of flush stitch each)."""
    import subprocess
    from brotli_tpu.enc import bitstream, encoder as E
    from brotli_tpu.format.bitio import BitWriter
    OJ = small_segments
    data = (testdata / "alice29.txt").read_bytes() + \
        (testdata / "asyoulik.txt").read_bytes()
    arr = np.frombuffer(data, np.uint8)
    maxback = C.max_backward_distance(22)
    comp = E._encode_q11_streamed(arr, len(arr), maxback, 11, 17, 22)
    r = subprocess.run([ref_cli, "-d", "-c"], input=comp,
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == data
    m = OJ.find_matches_optimal_jax(arr, maxback, 11)
    bw2 = BitWriter()
    bitstream.write_stream_header(bw2, 22)
    E._write_blocks(bw2, arr, 0, len(arr), m, 17, is_last=True,
                    ring=None, quality=11, ctx_floor=0)
    bw2.align_to_byte()
    batch = bw2.getvalue()
    assert len(comp) < len(batch) * 1.02 + 64


def test_streamed_q11_mb_size_exceeds_segment(testdata, ref_cli,
                                              monkeypatch):
    """mb_size (1 << lgblock) larger than the v3 segment must NOT take
    the chunked streaming-collect path: its half-group boundaries are
    segment-aligned, so a metablock spanning the group seam was emitted
    by BOTH groups (overlapping spans -> reference decode fails with
    PADDING_2). Regression for the round-4 advisor finding."""
    from brotli_tpu.ops import optimal_jax as OJ
    from brotli_tpu.enc import encoder as E

    monkeypatch.setenv("BROTLI_TPU_DP", "v3")
    old_v3 = OJ.SEG_V3, OJ._BUCKETS_V3
    # two segments of 128 KiB; lgblock 18 -> one 256 KiB metablock
    # covering both (mb_size does not divide SEG_V3's span count)
    OJ.SEG_V3, OJ._BUCKETS_V3 = 1 << 17, [1 << 17]
    try:
        data = ((testdata / "alice29.txt").read_bytes() +
                (testdata / "asyoulik.txt").read_bytes())[:260_000]
        arr = np.frombuffer(data, np.uint8)
        spans = []
        orig_emit = OJ._emit_spans

        def spy_emit(arr_, m, lens, dists, flags, n, mb_size,
                     max_distance, base, on_block, lo=0, hi=None):
            def spy_block(lo_, hi_, matches):
                spans.append((lo_, hi_))
                on_block(lo_, hi_, matches)
            return orig_emit(arr_, m, lens, dists, flags, n, mb_size,
                            max_distance, base, spy_block, lo=lo, hi=hi)

        monkeypatch.setattr(OJ, "_emit_spans", spy_emit)
        comp = E._encode_q11_streamed(arr, len(arr),
                                      C.max_backward_distance(22),
                                      11, 18, 22)
        # spans must tile [0, n) without overlap
        assert spans == sorted(spans)
        for (l0, h0), (l1, h1) in zip(spans, spans[1:]):
            assert h0 == l1, spans
        assert spans[0][0] == 0 and spans[-1][1] == len(arr), spans
        r = subprocess.run([ref_cli, "-d", "-c"], input=comp,
                           capture_output=True)
        assert r.returncode == 0 and r.stdout == data
    finally:
        OJ.SEG_V3, OJ._BUCKETS_V3 = old_v3


def test_sharded_q11_mesh(small_segments, testdata, ref_cli):
    """compress_sharded at q11 dispatches the per-shard optimal-parse
    DP over the mesh (round-3 gap: it silently parsed greedily). The
    stitched stream must decode through the reference CLI and stay
    within a whisker of the device one-shot at the same segment
    config (seam/stitch overhead only)."""
    import numpy as np
    from brotli_tpu.ops import optimal_jax as OJ
    from brotli_tpu.parallel import shard
    from brotli_tpu.format import constants as C
    from brotli_tpu import native

    old_v3 = OJ.SEG_V3, OJ._BUCKETS_V3
    OJ.SEG_V3, OJ._BUCKETS_V3 = 1 << 17, [1 << 17]
    try:
        data = ((testdata / "alice29.txt").read_bytes() +
                (testdata / "asyoulik.txt").read_bytes())[:280_000]
        out = shard.compress_sharded(data, quality=11, n_shards=2)
        r = subprocess.run([ref_cli, "-d", "-c"], input=out,
                           capture_output=True)
        assert r.returncode == 0 and r.stdout == data
        # apples-to-apples: the device one-shot at the same config
        import os
        os.environ["BROTLI_TPU_DP"] = "v3"
        try:
            arr = np.frombuffer(data, np.uint8)
            m = OJ.find_matches_optimal_jax(
                arr, C.max_backward_distance(22), 11)
        finally:
            del os.environ["BROTLI_TPU_DP"]
        one, _ = native.serialize_region(data, 0, len(data), m, 11, 22,
                                         write_header=True, is_last=True)
        assert len(out) <= len(one) * 1.03, (len(out), len(one))
    finally:
        OJ.SEG_V3, OJ._BUCKETS_V3 = old_v3
