"""Tunnel transfer microbenchmark: per-call latency vs bandwidth for
H2D and D2H at several sizes, plus the device cost of a small-table
gather (the litcost-on-device feasibility probe).

Usage: python scripts/tunnel_bench.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def timed(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.devices()[0].platform, flush=True)

    # H2D: asarray alone may be lazy on this backend; chase it with a
    # 1-element fetch so the timing includes the real upload
    for sz in (4, 64 << 10, 1 << 20, 4 << 20, 16 << 20):
        a = np.random.randint(0, 255, sz, np.uint8)
        def h2d():
            d = jnp.asarray(a)
            np.asarray(d[:1])
        t = timed(h2d)
        print(f"H2D {sz:>9} B: {t * 1e3:8.1f} ms "
              f"({sz / t / 1e6:8.1f} MB/s)", flush=True)

    # D2H: device-resident array fetched fully
    for sz in (4, 64 << 10, 1 << 20, 4 << 20, 16 << 20):
        d = jnp.zeros(sz, jnp.uint8) + 1
        np.asarray(d)  # warm/commit
        t = timed(lambda: np.asarray(d))
        print(f"D2H {sz:>9} B: {t * 1e3:8.1f} ms "
              f"({sz / t / 1e6:8.1f} MB/s)", flush=True)

    # many-small vs one-big H2D (per-call overhead)
    small = [np.random.randint(0, 255, 64 << 10, np.uint8)
             for _ in range(10)]
    def many():
        ds = [jnp.asarray(s) for s in small]
        np.asarray(ds[-1][:1])
    print(f"H2D 10 x 64KB: {timed(many) * 1e3:8.1f} ms", flush=True)

    # small-table gather on device: bits[idx] for 4M indices, 16K table
    n = 1 << 22
    tab = jnp.asarray(np.random.randint(0, 200, 1 << 14, np.int32))
    idx = jnp.asarray(np.random.randint(0, 1 << 14, n, np.int32))
    f_g = jax.jit(lambda t_, i_: t_[i_].sum())
    f_s = jax.jit(lambda i_: i_.sum())
    int(f_g(tab, idx)); int(f_s(idx))  # compile
    tg = timed(lambda: int(f_g(tab, idx)))
    ts = timed(lambda: int(f_s(idx)))
    print(f"gather 4M from 16K table: {tg * 1e3:.1f} ms "
          f"(baseline sum {ts * 1e3:.1f} ms)", flush=True)

    # 256-entry table (the context LUT case)
    tab2 = jnp.asarray(np.random.randint(0, 64, 256, np.int32))
    f_g2 = jax.jit(lambda t_, i_: t_[i_ & 255].sum())
    int(f_g2(tab2, idx))
    tg2 = timed(lambda: int(f_g2(tab2, idx)))
    print(f"gather 4M from 256 table: {tg2 * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
