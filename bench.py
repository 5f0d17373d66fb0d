"""Benchmark: q11 encode throughput, DEVICE pipeline as the headline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

The headline VALUE is the TPU device-DP q11 pipeline
(BROTLI_TPU_ENCODER=device: sort-carry candidate discovery + Pallas
suffix-min wavefront DP + dictionary edges, ops/optimal_jax.py) on the
16 MB reference-testdata corpus, end-to-end wall clock including host
serialization, validated by decode. When no chip is reachable (or the
tunneled backend's kernel load exceeds the device budget) the value
falls back to the HOST-NATIVE C tier and the metric string says so
explicitly -- no number in the line can be mistaken for a chip
measurement when it is not one.

BUDGETED TO FINISH: round 3 timed out (rc=124) because first-touch
Mosaic kernel compiles on the tunneled backend cost ~12-30 min per
process and the old script serialized a 3000 s device pass after a
1200 s mesh pass. This version (a) runs the device pass CONCURRENTLY
with the host/ref/mesh passes, (b) warms exactly ONE pad bucket (the
4 MB bucket the 16 MB run uses; .jax_cache + scripts_prewarm.py keep
it warm across processes), (c) caps the device subprocess at
DEVICE_BUDGET and the whole script with a global alarm that emits the
host-tier fallback line, so the driver ALWAYS records a result.

Comparison fields reported inside the metric string:
  - device size vs the reference CLI at the same quality/window
  - host-native C tier (btpu_enc.c optimal-parse) MB/s + size ratio,
    labeled "host C, zero chips"
  - reference CLI local speed (same machine, single core)
  - native one-shot q1/q5 throughputs (host C fast tiers)
  - 8-virtual-device CPU-mesh sharded-encode scaling efficiency
    (dispatch-overhead proxy; real multi-chip is not available here)

Baseline: 0.5 MB/s -- the reference's published Canterbury quality-11
compression speed (BASELINE.md, brotli-comparison-study Table 1).
"""

import json
import os
import pathlib
import signal
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

TESTDATA = pathlib.Path("/root/reference/tests/testdata")
REF_CLI = pathlib.Path(__file__).resolve().parent / "build/ref/brotli"
BASELINE_MBPS = 0.5  # published Canterbury q11 compression speed
QUALITY = 11
DEVICE_BUDGET = int(os.environ.get("BENCH_DEVICE_BUDGET", "480"))
MESH_BUDGET = 180
GLOBAL_BUDGET = int(os.environ.get("BENCH_GLOBAL_BUDGET", "560"))

_fallback_line = {}


def _emit_and_exit(signum=None, frame=None):
    """Global alarm: emit the best line assembled so far (host tier)."""
    if _fallback_line:
        print(json.dumps(_fallback_line), flush=True)
        os._exit(0)
    os._exit(1)


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


def start_device_pass(corpus_path: str) -> subprocess.Popen:
    """Launch the device pass concurrently (own process so a wedged
    tunnel cannot hang the bench). It runs through scripts/
    device_warm.py -- the SAME driver file scripts_prewarm.py uses --
    because the persistent-cache key includes traced source locations:
    a different driver file means a cold recompile (round 3's rc=124).
    Warms the 4 MB pad bucket first, then times the 16 MB end-to-end
    run (4 MB segments: the same single kernel shape)."""
    here = pathlib.Path(__file__).resolve().parent
    return subprocess.Popen(
        [sys.executable, str(here / "scripts" / "device_warm.py"),
         corpus_path, "4", "16", "--json"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)


def collect_device(proc: subprocess.Popen, deadline: float) -> dict:
    """Parse the device driver's JSON lines: the {"mb": 16, ...} line
    is the headline; the {"mb": 4, ...} line is the bucket warmup."""
    timed_out = False
    try:
        out, _ = proc.communicate(timeout=max(5, deadline - time.time()))
    except subprocess.TimeoutExpired:
        proc.kill()
        timed_out = True
        try:
            out, _ = proc.communicate(timeout=10)
        except Exception:
            return {"timeout": True}
    res = {"timeout": True} if timed_out else {}
    for line in (out or b"").decode().splitlines():
        try:
            j = json.loads(line)
        except Exception:
            continue
        if j.get("mb") == 16:
            res.update(mbps=j["mbps"], size=j["size"])
        elif j.get("mb") == 4:
            res["warm_s"] = j.get("secs")
        elif "no_chip" in j:
            res.update(j)
    return res or {"failed": True}


def mesh_scaling(data: bytes) -> dict:
    """Sharded-encode scaling on the 8-virtual-device CPU mesh: NOT a
    chip measurement -- a dispatch/stitch overhead proxy."""
    code = r"""
import json, os, sys, time
sys.path.insert(0, %r)
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')
import jax
jax.config.update('jax_platforms', 'cpu')
import brotli_tpu
from brotli_tpu.parallel import shard
data = open(%r, 'rb').read()
shard.compress_sharded(data, quality=5, n_shards=8)  # warm
ts = {}
for ns in (1, 8):
    t0 = time.time()
    out = shard.compress_sharded(data, quality=5, n_shards=ns)
    ts[ns] = time.time() - t0
    assert brotli_tpu.decompress(out) == data
print(json.dumps({'eff': round(ts[1] / (8 * ts[8]), 3),
                  't1': round(ts[1], 2), 't8': round(ts[8], 2)}))
"""
    here = str(pathlib.Path(__file__).resolve().parent)
    tmp = "/tmp/bench_corpus2"
    pathlib.Path(tmp).write_bytes(data[: 2 << 20])
    try:
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS",)}
        r = subprocess.run([sys.executable, "-c", code % (here, tmp)],
                           capture_output=True, timeout=MESH_BUDGET,
                           env=env)
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
    global _fallback_line
    signal.signal(signal.SIGALRM, _emit_and_exit)
    signal.alarm(GLOBAL_BUDGET)
    t_start = time.time()
    import brotli_tpu

    data = build_corpus()
    tmp = "/tmp/bench_corpus16"
    pathlib.Path(tmp).write_bytes(data)

    skip_dev = bool(os.environ.get("BENCH_SKIP_DEVICE"))
    dev_proc = None if skip_dev else start_device_pass(tmp)
    dev = {}
    if dev_proc is not None:
        # WAIT for the device pass before touching the host tier: this
        # box has ONE core, and the device pipeline's own host stages
        # (seed parse, serialization) read 3-4x slow under a
        # concurrent host-tier run (measured 1.3 vs 4.4-6.0 MB/s).
        # The budget still bounds a cold-compile hang.
        # the tunneled backend's init alone fluctuates 70-390 s
        # (measured over one evening), so the device pass gets most
        # of the global budget; the remaining legs need ~15 s plus an
        # optional mesh leg that is skipped when time runs short
        deadline = min(t_start + GLOBAL_BUDGET - 60,
                       t_start + DEVICE_BUDGET)
        dev = collect_device(dev_proc, deadline)

    # host-native C tier (zero chips) -- comparison field
    brotli_tpu.compress(data[: 1 << 20], quality=QUALITY)  # warm
    host_best = 0.0
    host_comp = b""
    for _ in range(2):
        t0 = time.time()
        host_comp = brotli_tpu.compress(data, quality=QUALITY)
        dt = time.time() - t0
        host_best = max(host_best, len(data) / dt / 1e6)
    assert brotli_tpu.decompress(host_comp) == data

    # reference CLI local speed + size (same machine, single core)
    ref_size = ref_mbps = None
    if REF_CLI.exists():
        t0 = time.time()
        ref = subprocess.run(
            [str(REF_CLI), "-q", str(QUALITY), "-w", "22", "-c"],
            input=data, capture_output=True).stdout
        ref_mbps = round(len(data) / (time.time() - t0) / 1e6, 2)
        ref_size = len(ref)

    def ratio(sz):
        return f"{sz / ref_size:.4f}x ref" if ref_size else f"{sz} B"

    fast = native_fast_mbps(data)
    host_note = (f"host-native C tier (zero chips): {host_best:.2f} MB/s, "
                 f"size {ratio(len(host_comp))}")
    ref_note = (f"; reference CLI local: {ref_mbps} MB/s"
                if ref_mbps else "")
    fast_note = (f"; native one-shot q1 {fast.get('q1', '?')} / "
                 f"q5 {fast.get('q5', '?')} MB/s (host)" if fast else "")

    # host fallback line is ready: the global alarm can emit it
    _fallback_line = {
        "metric": (f"q{QUALITY} encode MB/s, HOST-NATIVE C tier -- NOT "
                   f"a chip measurement (global budget hit before the "
                   f"device pass finished; 16MB corpus, size "
                   f"{ratio(len(host_comp))}){ref_note}{fast_note}"),
        "value": round(host_best, 2),
        "unit": "MB/s",
        "vs_baseline": round(host_best / BASELINE_MBPS, 3),
    }

    mesh = (mesh_scaling(data)
            if time.time() - t_start < GLOBAL_BUDGET - 90 else {})
    mesh_note = (f"; 8-vdev CPU-mesh q5 scaling eff {mesh['eff']}"
                 f" (t1 {mesh['t1']}s / t8 {mesh['t8']}s; overhead proxy,"
                 f" not a chip number -- on a 1-core host the formula's"
                 f" ceiling is 0.125)" if mesh else "")

    if dev.get("mbps"):
        value = dev["mbps"]
        metric = (f"q{QUALITY} encode MB/s, TPU device-DP pipeline "
                  f"end-to-end (16MB corpus, real chip, decode-"
                  f"validated, size {ratio(dev['size'])}, kernel warm "
                  f"{dev.get('warm_s', '?')}s); {host_note}"
                  f"{ref_note}{fast_note}{mesh_note}")
    else:
        why = ("device pass disabled" if skip_dev else
               "device budget exceeded (tunneled kernel load)"
               if dev.get("timeout") else
               f"no chip reachable ({dev.get('no_chip', 'init failed')})")
        value = round(host_best, 2)
        metric = (f"q{QUALITY} encode MB/s, HOST-NATIVE C tier -- NOT a "
                  f"chip measurement ({why}; 16MB corpus, size "
                  f"{ratio(len(host_comp))}){ref_note}{fast_note}"
                  f"{mesh_note}")

    signal.alarm(0)
    print(json.dumps({
        "metric": metric,
        "value": value,
        "unit": "MB/s",
        "vs_baseline": round(value / BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
