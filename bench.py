"""Benchmark: q11 single-chip encode throughput (production path).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline: 0.5 MB/s -- the reference's published Canterbury quality-11
compression speed (BASELINE.md, brotli-comparison-study Table 1; the
enwik8/web rows are 0.4/0.6 MB/s). The corpus is the reference
testdata text concatenated to 16 MB, encoded at quality 11 through the
production pipeline (the native optimal-parse tier: two-iteration
cost-model DP with seed continuation and long-copy skip,
native/btpu_enc.c -- the backward_references_hq.c role) with lgwin 22.
Every output is validated by decoding back to the input, and the size
is compared against the reference CLI at the same quality and window
when the differential binary is present.

The metric string also reports the device (TPU) q11 pipeline --
sort-carry candidate discovery + wavefront DP, ops/optimal_jax.py,
the path the sharded multi-chip encoder scales across chips -- with
its device-vs-host-serialize stage split, plus the native q1/q5
one-shot throughputs for the fast tiers. The device pass is skipped
gracefully when the chip is unreachable.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

TESTDATA = pathlib.Path("/root/reference/tests/testdata")
REF_CLI = pathlib.Path(__file__).resolve().parent / "build/ref/brotli"
BASELINE_MBPS = 0.5  # published Canterbury q11 compression speed
QUALITY = 11


def build_corpus(target=16 << 20) -> bytes:
    names = ["alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt",
             "mapsdatazrh", "monkey", "cp852-utf8"]
    parts = []
    total = 0
    while total < target:
        for n in names:
            b = (TESTDATA / n).read_bytes()
            parts.append(b)
            total += len(b)
            if total >= target:
                break
    return b"".join(parts)[:target]


def device_pass(data: bytes) -> dict:
    """The TPU q11 pipeline: throughput + device/host stage split.

    Runs in a subprocess so a wedged tunnel cannot hang the bench."""
    code = r"""
import json, os, sys, time
sys.path.insert(0, %r)
import numpy as np
import brotli_tpu
from brotli_tpu.enc import encoder as E, bitstream
from brotli_tpu.format import constants as C
from brotli_tpu.format.bitio import BitWriter
data = open(%r, 'rb').read()
os.environ['BROTLI_TPU_ENCODER'] = 'device'
brotli_tpu.compress(data[: 1 << 20], quality=11)  # compile warmup
t0 = time.time()
comp = brotli_tpu.compress(data, quality=11)
dt = time.time() - t0
assert brotli_tpu.decompress(comp) == data
arr = np.frombuffer(data, dtype=np.uint8)
t0 = time.time()
matches = E.find_matches(arr, C.max_backward_distance(22), 11)
t1 = time.time()
bw = BitWriter()
bitstream.write_stream_header(bw, 22)
E._write_blocks(bw, arr, 0, len(arr), matches, 22, is_last=True,
                ring=None, quality=11, ctx_floor=0)
bw.align_to_byte()
t2 = time.time()
print(json.dumps({'mbps': round(len(data) / dt / 1e6, 2),
                  'size': len(comp),
                  'device_ms': round((t1 - t0) * 1000),
                  'serialize_ms': round((t2 - t1) * 1000)}))
"""
    here = str(pathlib.Path(__file__).resolve().parent)
    tmp = "/tmp/bench_corpus16"
    pathlib.Path(tmp).write_bytes(data)
    try:
        r = subprocess.run([sys.executable, "-c", code % (here, tmp)],
                           capture_output=True, timeout=1800)
        return json.loads(r.stdout.splitlines()[-1]) if r.returncode == 0 \
            else {}
    except Exception:
        return {}


def native_fast_mbps(data: bytes) -> dict:
    try:
        from brotli_tpu import native
        out = {}
        for q in (1, 5):
            native.encode(data[:1 << 20], q, 22)  # warm
            t0 = time.time()
            native.encode(data, q, 22)
            out[f"q{q}"] = round(len(data) / (time.time() - t0) / 1e6, 1)
        return out
    except Exception:
        return {}


def main():
    import brotli_tpu

    data = build_corpus()
    brotli_tpu.compress(data[: 1 << 20], quality=QUALITY)  # warm
    best = 0.0
    comp = b""
    for _ in range(3):
        t0 = time.time()
        comp = brotli_tpu.compress(data, quality=QUALITY)
        dt = time.time() - t0
        best = max(best, len(data) / dt / 1e6)
    assert brotli_tpu.decompress(comp) == data
    ratio = len(data) / len(comp)
    fast = native_fast_mbps(data)
    size_note = f"ratio {ratio:.2f}"
    if REF_CLI.exists():
        ref = subprocess.run(
            [str(REF_CLI), "-q", str(QUALITY), "-w", "22", "-c"],
            input=data, capture_output=True).stdout
        size_note += f", size {len(comp) / len(ref):.3f}x ref-q{QUALITY}"
    skip_dev = bool(os.environ.get("BENCH_SKIP_DEVICE"))
    dev = {} if skip_dev else device_pass(data)
    dev_note = (f"; device-DP pipeline {dev['mbps']} MB/s, "
                f"size {dev['size']}, device {dev['device_ms']}ms + "
                f"host-serialize {dev['serialize_ms']}ms"
                if dev else ("; device pass disabled" if skip_dev else
                            "; device pass skipped (chip unreachable)"))
    fast_note = (f", native one-shot q1 {fast.get('q1', '?')} / "
                 f"q5 {fast.get('q5', '?')} MB/s" if fast else "")
    print(json.dumps({
        "metric": f"q{QUALITY} encode MB/s single chip, production path "
                  f"(16MB text corpus, {size_note}{dev_note}{fast_note})",
        "value": round(best, 2),
        "unit": "MB/s",
        "vs_baseline": round(best / BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
