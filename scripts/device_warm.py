"""Shared device-path driver: the ONE file through which both
scripts_prewarm.py and bench.py invoke the TPU q11 pipeline.

The persistent-compilation-cache key includes the traced module's
source LOCATIONS, so the same compress() issued from two different
driver files compiles twice (measured: four distinct cache keys for
byte-identical HLO from four scratch files). Funneling every device
invocation through this file keeps the key stable: prewarm compiles,
bench hits.

Usage:
  python scripts/device_warm.py CORPUS_FILE SIZE_MB [SIZE_MB...] [--json]

With --json, prints one JSON line per size:
  {"mb": N, "mbps": X, "size": S, "warm_s": W}
"""

import json
import pathlib
import sys
import time


def run(corpus_path: str, sizes_mb, as_json: bool = False):
    import os
    os.environ.setdefault("BROTLI_TPU_ENCODER", "device")
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import jax
    if jax.default_backend() != "tpu":
        if as_json:
            print(json.dumps({"no_chip": jax.default_backend()}),
                  flush=True)
        else:
            print(f"no chip: backend={jax.default_backend()}")
        return 1
    import brotli_tpu

    data = pathlib.Path(corpus_path).read_bytes()
    for mb in sizes_mb:
        chunk = data[: mb << 20]
        # best of 2 once warm: single-sample wall on this shared VM
        # swings +-20-50% and the first size in the list doubles as
        # the warmup (its first run pays the cache load)
        dt = None
        for _ in range(2):
            t0 = time.time()
            blob = brotli_tpu.compress(chunk, quality=11)
            dt = min(dt, time.time() - t0) if dt else time.time() - t0
        assert brotli_tpu.decompress(blob) == chunk
        if as_json:
            print(json.dumps({"mb": mb,
                              "mbps": round(len(chunk) / dt / 1e6, 2),
                              "size": len(blob),
                              "secs": round(dt, 1)}), flush=True)
        else:
            print(f"device {mb}MB q11: {dt:.1f}s -> {len(blob)} bytes",
                  flush=True)
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--json"]
    sys.exit(run(args[0], [int(x) for x in args[1:]],
                 as_json="--json" in sys.argv))
