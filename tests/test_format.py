"""Format-layer parity tests against the reference's normative data."""

import re

import numpy as np
import pytest

from brotli_tpu.format import constants as C
from brotli_tpu.format import context, dictionary, prefix, transforms

REF = "/root/reference"


def _parse_c_ints(text):
    return [int(t) for t in re.findall(r"-?\d+", text)]


def test_context_luts_match_reference_table():
    """Our generated LUTs must equal _kBrotliContextLookupTable."""
    src = open(f"{REF}/c/common/context.c").read()
    m = re.search(r"_kBrotliContextLookupTable\[2048\] = \{(.*?)\};",
                  src, re.S)
    ref = np.array(_parse_c_ints(re.sub(r"/\*.*?\*/", "", m.group(1),
                                        flags=re.S)), dtype=np.uint8)
    assert len(ref) == 2048
    for mode in range(4):
        lut0, lut1 = context.context_lut(mode)
        np.testing.assert_array_equal(lut0, ref[mode * 512:mode * 512 + 256])
        np.testing.assert_array_equal(
            lut1, ref[mode * 512 + 256:mode * 512 + 512])


def test_distance_short_codes_roundtrip():
    # all six delta codes against a simulated ring buffer
    rb = [100, 200, 300, 400]  # rb[idx-1] = last
    for code, (ring, delta) in enumerate(prefix.DISTANCE_SHORT_CODES):
        want = rb[(4 - 1 - ring) % 4] + delta
        assert want == rb[3 - ring] + delta


@pytest.mark.parametrize("npostfix,ndirect", [(0, 0), (1, 4), (2, 8),
                                              (3, 120)])
def test_distance_encode_decode_inverse(npostfix, ndirect):
    extra, offset = prefix.distance_lut(npostfix, ndirect)
    for distance in list(range(1, 2000)) + [16_000_000, (1 << 24) - 16]:
        dcode, ev, eb = prefix.encode_distance(distance, npostfix, ndirect)
        assert dcode < C.distance_alphabet_size(npostfix, ndirect)
        if dcode < C.NUM_DISTANCE_SHORT_CODES + ndirect:
            assert distance <= ndirect and eb == 0
            assert dcode - C.NUM_DISTANCE_SHORT_CODES + 1 == distance
        else:
            assert 0 <= ev < (1 << eb)
            assert eb == extra[dcode]
            got = int(offset[dcode]) + (ev << npostfix)
            assert got == distance


def test_cmd_code_roundtrip():
    lut = prefix.cmd_lut()
    for sym in range(704):
        ic, cc = int(lut["insert_code"][sym]), int(lut["copy_code"][sym])
        implicit = bool(lut["implicit_dist0"][sym])
        assert prefix.combine_cmd_code(ic, cc, implicit) == sym


def test_insert_copy_ranges():
    assert prefix.INSERT_BASE[0] == 0 and prefix.INSERT_BASE[23] == 22594
    assert prefix.COPY_BASE[0] == 2 and prefix.COPY_BASE[23] == 2118
    assert prefix.BLOCK_COUNT_BASE[0] == 1
    assert prefix.BLOCK_COUNT_BASE[25] == 16625


def test_dictionary_words():
    assert dictionary.word(4, 0) != b""
    assert len(dictionary.word(24, 3)) == 24
    assert dictionary.OFFSETS_BY_LENGTH[25] == 122784
    # known RFC Appendix A layout: first length-4 words
    assert dictionary.word(4, 0) == b"time"
    assert dictionary.word(4, 1) == b"down"
    assert dictionary.word(5, 0) == b"first"


def test_transforms_against_reference_data():
    """Replay every transform against the reference's packed tables."""
    src = open(f"{REF}/c/common/transform.c").read()
    m = re.search(r'kPrefixSuffix\[217\] =(.*?);', src, re.S)
    lit = "".join(re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1)))
    ps = lit.encode("latin1").decode("unicode_escape").encode("latin1")
    ps += b"\x00\x00"
    pmap = [int(t, 16) for t in re.findall(r"0x[0-9A-Fa-f]+", re.search(
        r"kPrefixSuffixMap\[50\] = \{(.*?)\}", src, re.S).group(1))]

    def getstr(idx):
        off = pmap[idx]
        return ps[off + 1:off + 1 + ps[off]]

    m2 = re.search(r"kTransformsData\[\] = \{(.*?)\};", src, re.S)
    toks = [t.strip() for t in m2.group(1).split(",") if t.strip()]
    assert len(toks) == 3 * transforms.NUM_TRANSFORMS
    for i in range(transforms.NUM_TRANSFORMS):
        p = getstr(int(toks[3 * i]))
        t = toks[3 * i + 1].replace("BROTLI_TRANSFORM_", "")
        s = getstr(int(toks[3 * i + 2]))
        ours = transforms.TRANSFORMS[i]
        assert ours == (p, t, s), f"transform {i}"


def test_transform_word_semantics():
    w = b"working"
    assert transforms.transform_word(w, 0) == b"working"
    # find " the " prefix identity transform (RFC id 41)
    assert transforms.TRANSFORMS[41] == (b" the ", "IDENTITY", b"")
    assert transforms.transform_word(w, 41) == b" the working"
    # uppercase-all
    idx = transforms.TRANSFORMS.index((b"", "UPPERCASE_ALL", b""))
    assert transforms.transform_word(b"abc", idx) == b"ABC"
    # omit-last cutoffs
    assert transforms.CUTOFF_TRANSFORMS[0] == 0
    for k in range(1, 10):
        tid = transforms.CUTOFF_TRANSFORMS[k]
        assert transforms.transform_word(b"abcdefghijkl", tid) == \
            b"abcdefghijkl"[:-k]


def test_params_surface():
    """Validated parameter bundle (BrotliEncoderParameter role)."""
    import pytest as _pytest
    import brotli_tpu
    from brotli_tpu.params import (EncoderParams, EncoderParameter,
                                   Mode, compress_with)

    p = EncoderParams(quality=5, lgwin=18).validate()
    data = b"the quick brown fox " * 200
    comp = compress_with(p, data)
    assert brotli_tpu.decompress(comp) == data

    for bad in (EncoderParams(quality=12), EncoderParams(quality=-1),
                EncoderParams(lgwin=25),  # needs large_window
                EncoderParams(mode=7)):
        with _pytest.raises(ValueError):
            bad.validate()
    EncoderParams(lgwin=28, large_window=True).validate()
    # sanitize clamps instead of raising
    s = EncoderParams(quality=5, lgwin=9).sanitize()
    assert s.lgwin >= 10
    # enum vocabulary matches the reference's numbering
    assert EncoderParameter.QUALITY == 1
    assert EncoderParameter.LARGE_WINDOW == 6
    assert Mode.FONT == 2


def test_platform_info_and_configure():
    """Capability report (the c/common/platform.h role): stable keys,
    honest native/backend state, validated configure()."""
    import os
    import pytest
    from brotli_tpu.utils import platform as plat
    rep = plat.info()
    for key in ("native_runtime", "decoder_path", "encoder_tiers",
                "jax_backend", "byteorder", "env_knobs"):
        assert key in rep, key
    assert rep["jax_backend"] == "cpu"  # conftest pins the CPU mesh
    assert rep["native_runtime"] is True
    assert rep["decoder_path"] == "native"
    with pytest.raises(ValueError):
        plat.configure(decoder="bogus")
    old = os.environ.get("BROTLI_TPU_DECODER")
    try:
        rep2 = plat.configure(decoder="python")
        assert rep2["decoder_path"] == "python"
    finally:
        if old is None:
            os.environ.pop("BROTLI_TPU_DECODER", None)
        else:
            os.environ["BROTLI_TPU_DECODER"] = old
