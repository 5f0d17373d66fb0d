"""Raw (compound) dictionary attach: both directions vs the reference,
plus concatenated-stream decode and sharded encode."""

import subprocess

import pytest

import brotli_tpu
from brotli_tpu.parallel.shard import compress_sharded
from tests.conftest import ref_decompress


@pytest.fixture
def dict_file(tmp_path, testdata):
    d = (testdata / "alice29.txt").read_bytes()[:30000]
    p = tmp_path / "raw.dict"
    p.write_bytes(d)
    return d, str(p)


@pytest.mark.parametrize("quality", [1, 5])
def test_dictionary_roundtrip_vs_reference(quality, dict_file, testdata,
                                           ref_cli):
    d, path = dict_file
    data = (testdata / "asyoulik.txt").read_bytes()
    comp = brotli_tpu.compress(data, quality=quality, dictionary=d)
    r = subprocess.run([ref_cli, "-d", "-c", "-D", path], input=comp,
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == data
    assert brotli_tpu.decompress(comp, dictionary=d) == data
    # and decode the reference's dictionary-compressed stream
    refc = subprocess.run([ref_cli, "-c", "-q", str(quality), "-D", path],
                          input=data, capture_output=True).stdout
    assert brotli_tpu.decompress(refc, dictionary=d) == data


def test_dictionary_improves_ratio(dict_file, testdata):
    d, _ = dict_file
    data = d[:5000] + b"NEW CONTENT " + d[10000:15000]
    with_d = brotli_tpu.compress(data, quality=5, dictionary=d)
    without = brotli_tpu.compress(data, quality=5)
    assert len(with_d) < len(without) / 2


def test_concatenated_streams(ref_cli):
    a = brotli_tpu.compress(b"first stream " * 100, quality=5)
    b = brotli_tpu.compress(b"second stream " * 50, quality=1)
    want = b"first stream " * 100 + b"second stream " * 50
    assert brotli_tpu.decompress_concatenated(a + b) == want
    rc, out = ref_decompress(ref_cli, a + b)  # ref needs -K; plain fails
    r = subprocess.run([ref_cli, "-d", "-c", "--concatenated"],
                       input=a + b, capture_output=True)
    assert r.returncode == 0 and r.stdout == want


def test_sharded_encode(testdata, ref_cli):
    data = (testdata / "lcet10.txt").read_bytes() + \
        (testdata / "plrabn12.txt").read_bytes()
    comp = compress_sharded(data, quality=5, use_device=False, n_shards=3)
    rc, out = ref_decompress(ref_cli, comp)
    assert rc == 0 and out == data
    assert brotli_tpu.decompress(comp) == data


def test_dictgen_tool(ref_cli, testdata):
    """Dictionary generator (research/dictionary_generator.cc role):
    the generated raw dictionary must help on in-domain data and the
    stream must decode through the reference CLI with -D."""
    import subprocess
    import tempfile
    import brotli_tpu
    from brotli_tpu.tools.dictgen import generate

    data = (testdata / "alice29.txt").read_bytes()
    train, target = data[:len(data) // 2], data[len(data) // 2:]
    d = generate(train, 32768)
    assert 0 < len(d) <= 32768
    plain = brotli_tpu.compress(target, quality=5)
    withd = brotli_tpu.compress(target, quality=5, dictionary=d)
    assert len(withd) < len(plain)
    assert brotli_tpu.decompress(withd, dictionary=d) == target
    with tempfile.NamedTemporaryFile(suffix=".dict") as f:
        f.write(d)
        f.flush()
        r = subprocess.run([ref_cli, "-d", "-c", "-D", f.name],
                           input=withd, capture_output=True)
    assert r.returncode == 0 and r.stdout == target
