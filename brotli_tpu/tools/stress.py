"""Cross-path stress fuzzer: every trial roundtrips one input through
the full matrix -- one-shot encode (native or python by quality),
whole-buffer native + python decoders, the suspend-anywhere stream
decoder under random chunking, and the streaming encoder with random
flushes (role parity: c/fuzz/ + the reference's roundtrip test rig,
driven across ALL our engines at once).

Usage: python -m brotli_tpu.tools.stress [N]
"""

import os
import pathlib
import random
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import brotli_tpu
from brotli_tpu import native
from brotli_tpu.dec.decoder import Decoder
from brotli_tpu.dec.stream import StreamDecoder

rng = random.Random(2026)
td = pathlib.Path(os.environ.get("BROTLI_TPU_TESTDATA",
                                 "/root/reference/tests/testdata"))
corpus = [f.read_bytes() for f in td.iterdir()
          if ".compressed" not in f.name and f.is_file() and f.stat().st_size < 300000]

fails = 0
N = int(sys.argv[1]) if len(sys.argv) > 1 else 400
for trial in range(N):
    kind = trial % 5
    n = rng.randrange(1, 60000)
    src = rng.choice(corpus)
    if kind == 0:
        data = bytes(rng.randrange(256) for _ in range(min(n, 3000)))
    elif kind == 1:
        off = rng.randrange(max(len(src) - n, 1))
        data = src[off:off + n]
    elif kind == 2:  # splice two sources
        a, b = rng.choice(corpus), rng.choice(corpus)
        data = a[:n // 2] + b[:n // 2]
    elif kind == 3:  # repetitive
        pat = src[:rng.randrange(1, 200) + 1]
        data = (pat * (n // max(len(pat), 1) + 1))[:n]
    else:  # sparse mutations of text
        buf = bytearray(src[:n])
        for _ in range(rng.randrange(1, 20)):
            if buf:
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        data = bytes(buf)
    if not data:
        continue
    q = rng.choice([0, 1, 2, 4, 5, 7, 9, 10, 11])
    lgwin = rng.choice([16, 18, 22])
    try:
        comp = brotli_tpu.compress(data, quality=q, lgwin=lgwin)
        # whole-buffer native + python decoders
        assert native.decode(comp) == data, "native mismatch"
        assert Decoder().decompress(comp) == data, "python mismatch"
        # suspend-anywhere random chunks
        sd = StreamDecoder()
        out = bytearray()
        i = 0
        while i < len(comp):
            step = rng.randrange(1, 97)
            out += sd.feed(comp[i:i+step]); i += step
        out += sd.finish()
        assert bytes(out) == data, "stream mismatch"
        # streaming encoder roundtrip at q<=9
        if q <= 9:
            c2 = brotli_tpu.Compressor(quality=q)
            blob = bytearray()
            j = 0
            while j < len(data):
                step = rng.randrange(1, 9000)
                blob += c2.process(data[j:j+step])
                if rng.random() < 0.3:
                    blob += c2.flush()
                j += step
            blob += c2.finish()
            assert Decoder().decompress(bytes(blob)) == data, "stream-enc mismatch"
    except Exception as e:
        fails += 1
        print(f"FAIL trial {trial} kind {kind} q {q} lgwin {lgwin} n {len(data)}: {type(e).__name__} {e}", flush=True)
        if fails > 5:
            break
print(f"done: {N} trials, {fails} failures", flush=True)
sys.exit(1 if fails else 0)
