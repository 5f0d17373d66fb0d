"""Probe the tunnel's scheduling semantics: after an async dispatch,
does the device start executing immediately (fetch returns fast after
a host-side sleep) or only when a blocking fetch arrives (fetch pays
full compute regardless of the sleep)?

Usage: python scripts/tunnel_sched.py [corpus]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main(corpus="/tmp/bench_corpus16"):
    from brotli_tpu.ops import optimal_jax as oj

    arr = np.frombuffer(pathlib.Path(corpus).read_bytes(),
                        np.uint8)[: oj.SEG_V3].copy()
    n = len(arr)
    maxd = (1 << 22) - 16
    seed = oj._seed_parse(arr, maxd, 0)
    tables = oj._cost_tables(arr, seed, lit_table=True)

    # warm
    h, dt = oj._dispatch_v3(arr, n, maxd, tables, [seed])
    oj._collect_v3(h, dt, maxd)

    for sleep_s in (0.0, 1.5):
        t0 = time.perf_counter()
        h, dtab = oj._dispatch_v3(arr, n, maxd, tables, [seed])
        t1 = time.perf_counter()
        time.sleep(sleep_s)
        t2 = time.perf_counter()
        oj._collect_v3(h, dtab, maxd)
        t3 = time.perf_counter()
        print(f"sleep {sleep_s:3.1f}s: dispatch {t1 - t0:.3f}s  "
              f"fetch-after-sleep {t3 - t2:.3f}s  "
              f"(eager if fetch shrinks by the sleep)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
