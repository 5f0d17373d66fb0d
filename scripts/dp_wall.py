"""Wall-clock decomposition of one production v3 segment on the real
chip (warm kernels): host prep / H2D+dispatch / compute+fetch, plus a
16 MB end-to-end timing with the stage seam enabled.

Usage: python scripts/dp_wall.py [corpus]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main(corpus="/tmp/bench_corpus16"):
    os.environ.setdefault("BROTLI_TPU_TRACE", "1")
    import jax
    from brotli_tpu.ops import optimal_jax as oj
    from brotli_tpu.utils import trace

    data16 = np.frombuffer(pathlib.Path(corpus).read_bytes(), np.uint8)
    arr = data16[: oj.SEG_V3].copy()
    n = len(arr)
    maxd = (1 << 22) - 16
    seed = oj._seed_parse(arr, maxd, 0)
    tables = oj._cost_tables(arr, seed, lit_table=True)

    # warm
    handles, dt_ = oj._dispatch_v3(arr, n, maxd, tables, [seed])
    oj._collect_v3(handles, dt_, maxd)

    for tag in ("A", "B"):
        t0 = time.perf_counter()
        handles, dtab = oj._dispatch_v3(arr, n, maxd, tables, [seed])
        t1 = time.perf_counter()
        res = oj._collect_v3(handles, dtab, maxd)
        t2 = time.perf_counter()
        print(f"[{tag}] dispatch {t1 - t0:.3f}s  collect {t2 - t1:.3f}s  "
              f"total {t2 - t0:.3f}s  matches {sum(len(x) for x in res[0])}",
              flush=True)

    # 16 MB end-to-end through the public API (device encoder)
    os.environ["BROTLI_TPU_ENCODER"] = "device"
    import brotli_tpu
    trace.reset()
    blob = brotli_tpu.compress(data16.tobytes(), quality=11)  # warm
    trace.reset()
    t0 = time.perf_counter()
    blob = brotli_tpu.compress(data16.tobytes(), quality=11)
    dt = time.perf_counter() - t0
    print(f"16MB end-to-end: {dt:.2f}s = {16 / dt:.2f} MB/s, "
          f"{len(blob)} B", flush=True)
    print(trace.format_report(), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
