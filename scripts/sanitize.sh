#!/bin/sh
# Sanitizer harness for the native codec (role parity:
# c/fuzz/test_fuzzer.sh + the reference CI sanitizer matrix).
#
# Builds libbtpu with ASan+UBSan, then runs under it:
#   1. the full golden-corpus decode sweep,
#   2. the native encoder roundtrip sweep (q0-9, incl. streaming),
#   3. the differential decode fuzzer (mutated + random inputs).
# Any sanitizer report aborts with a nonzero exit.
set -e
cd "$(dirname "$0")/.."

BUILD=/tmp/btpu_san
mkdir -p "$BUILD"
python3 brotli_tpu/native/gen_tables.py
CC="${CC:-cc}"
$CC -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all \
    -shared -fPIC -o "$BUILD/libbtpu_san.so" \
    brotli_tpu/native/btpu_dec.c brotli_tpu/native/btpu_enc.c -lm

ASAN_LIB=$($CC -print-file-name=libasan.so)
export LD_PRELOAD="$ASAN_LIB"
export ASAN_OPTIONS="detect_leaks=0:abort_on_error=1"
export UBSAN_OPTIONS="halt_on_error=1:print_stacktrace=1"
export BROTLI_TPU_NATIVE_LIB="$BUILD/libbtpu_san.so"
export JAX_PLATFORMS=cpu

python3 - <<'PY'
import os, pathlib, random, re, sys
sys.path.insert(0, os.getcwd())
from brotli_tpu import native
from brotli_tpu.dec.decoder import Decoder

td = pathlib.Path("/root/reference/tests/testdata")

# 1. golden decode sweep -- whole-buffer decoder AND the deferred
# symbol parse (the device-decode front end, btpu_parse_stream):
# the parse graph must resolve to the same bytes. The replay is pure
# python (jax's C++ exception machinery is incompatible with the
# LD_PRELOADed ASan interceptors).
def replay(lits, cn, cc, cd):
    out = bytearray()
    li = 0
    for a, b, c in zip(cn.tolist(), cc.tolist(), cd.tolist()):
        out += lits[li:li + a]
        li += a
        for _ in range(b):
            out.append(out[len(out) - c])
    return bytes(out)

n = 0
for f in sorted(td.glob("*.compressed*")):
    base = re.sub(r"\.compressed(\.\d+)?$", "", f.name)
    want = (td / base).read_bytes()
    blob = f.read_bytes()
    assert native.decode(blob) == want, f.name
    lits, cn, cc, cd, mdep = native.parse_stream(blob)
    assert replay(lits, cn, cc, cd) == want, f.name
    n += 1
print(f"golden sweep: {n} files ok (decode + deferred parse)")

# 2. native encoder roundtrips (one-shot + streaming + metadata)
for name in ["alice29.txt", "mapsdatazrh", "random_org_10k.bin", "zeros"]:
    data = (td / name).read_bytes()
    for q in (0, 1, 2, 5, 9, 10, 11):
        comp = native.encode(data, q, 22)
        assert native.decode(comp) == data, (name, q)
    for q in (5, 11):  # large-window extension (140-sym dist alphabet)
        comp = native.encode(data, q, 30)
        assert native.decode(comp, large_window=True) == data, (name, q)
    # chunked decoder (btpu_dec_chunk): resume at every 1/7th
    comp5 = native.encode(data, 5, 22)
    sd = native.StreamDecoder()
    got = []
    step = max(1, len(comp5) // 7)
    for i in range(0, len(comp5), step):
        got.append(sd.feed(comp5[i:i + step]))
    assert b"".join(got) == data and sd.finished, (name, "chunked")
    # matches-array serializer (btpu_serialize)
    matches = native.opt_parse(data, 11, 22)
    comp, _ = native.serialize_region(data, 0, len(data), matches, 11,
                                      22, write_header=True,
                                      is_last=True)
    assert native.decode(comp) == data, (name, "serialize")
    enc = native.StreamEncoder(5, 22)
    parts = []
    for i in range(0, len(data), 7777):
        parts.append(enc.process(data[i:i + 7777]))
        if i % 3 == 0:
            parts.append(enc.flush())
    parts.append(enc.emit_metadata(b"meta"))
    parts.append(enc.finish())
    assert Decoder().decompress(b"".join(parts)) == data, name
print("encoder roundtrips ok")

# 3. differential mutation fuzz
rng = random.Random(99)
base = bytearray((td / "alice29.txt.compressed").read_bytes())
for _ in range(500):
    buf = bytearray(base)
    for _ in range(rng.randrange(1, 8)):
        buf[rng.randrange(len(buf))] = rng.randrange(256)
    try:
        out_n = native.decode(bytes(buf))
        ok_n = True
    except ValueError:
        ok_n = False
    try:
        out_p = Decoder().decompress(bytes(buf))
        ok_p = True
    except Exception:
        ok_p = False
    if ok_n and ok_p:
        assert out_n == out_p
for _ in range(300):
    blob = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 400)))
    try:
        native.decode(blob)
    except ValueError:
        pass
print("fuzz ok")
PY
echo "SANITIZERS CLEAN"
