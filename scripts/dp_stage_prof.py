"""Per-stage device timing of the v3 q11 DP pipeline (the roofline
study driving the device-speed work): jits each prefix of the
pipeline -- edges / +suffix(Pallas) / +scan / full(+backtrack) -- at
the production 4 MB segment shape and times them on a real segment,
so the stage costs are the differences. First run compiles three
extra programs (remote Mosaic service, minutes); afterwards they live
in .jax_cache like every other kernel.

Usage: python scripts/dp_stage_prof.py [corpus_file]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main(corpus="/tmp/bench_corpus16"):
    import jax
    import jax.numpy as jnp
    from brotli_tpu.ops import optimal_jax as oj

    data = np.frombuffer(pathlib.Path(corpus).read_bytes(),
                         np.uint8)[: oj.SEG_V3].copy()
    n = oj.SEG_V3
    maxd = (1 << 22) - 16
    seed = oj._seed_parse(data, maxd, 0)
    tables = oj._cost_tables(data, seed, exact_lit=True)
    litpos, copyq, distq = tables
    copyq_row = np.zeros((1, 128), np.int32)
    copyq_row[0, : oj.W] = copyq[: oj.W]
    dpos_g, dpay_g, _ = oj._dict_probe_global(data, [seed], 0, maxd)
    (padded, npos, lit, spos, slen, sdist, dp_loc, dp_val) = \
        oj._prep_segment_v3(data, litpos, [seed], dpos_g, dpay_g, 0, n,
                            n)
    capm = n // oj.CAPM_DIV

    args = (jnp.asarray(padded), jnp.int32(npos), jnp.int32(maxd),
            jnp.asarray(lit), jnp.asarray(copyq_row),
            jnp.asarray(distq), jnp.asarray(spos), jnp.asarray(slen),
            jnp.asarray(sdist), jnp.asarray(dp_loc),
            jnp.asarray(dp_val), jnp.int32(0))

    def edges_only(d, np_, md, lq, cq, dq, sp, sl, sd, dl, dv, sb):
        ls, cs, ds = oj._edges_slots(d, np_, md, dq, sp, sl, sd)
        return ls.sum() + cs.sum() + ds.sum()  # force, tiny D2H

    def thru_suffix(d, np_, md, lq, cq, dq, sp, sl, sd, dl, dv, sb):
        ls, cs, ds = oj._edges_slots(d, np_, md, dq, sp, sl, sd)
        pd = (ls << 25) | jnp.where(ls >= 2, ds, 0)
        mp = oj._suffix_pallas(pd, cs, cq, False)
        return mp.sum()

    def thru_scan(d, np_, md, lq, cq, dq, sp, sl, sd, dl, dv, sb):
        ls, cs, ds = oj._edges_slots(d, np_, md, dq, sp, sl, sd)
        pd = (ls << 25) | jnp.where(ls >= 2, ds, 0)
        mp = oj._suffix_pallas(pd, cs, cq, False)
        nb = n // oj.B
        mp_all = mp.reshape(nb, oj.B, 2 * oj.W).transpose(1, 0, 2)
        litq_b = (lq.astype(jnp.int32) * 2).reshape(nb, oj.B).T
        pay = oj._scan_math_v3(mp_all, litq_b)
        return pay.sum()

    import functools
    stages = [
        ("edges", jax.jit(edges_only)),
        ("edges+suffix", jax.jit(thru_suffix)),
        ("edges+suffix+scan", jax.jit(thru_scan)),
    ]
    results = {}
    for name, fn in stages:
        out = fn(*args)          # compile + first run
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        results[name] = min(ts)
        print(f"{name:22} {min(ts)*1000:8.1f} ms", flush=True)
    full = functools.partial(oj.dp_parse_block_v3, capm=capm,
                             interpret=False)
    out = full(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(full(*args))
        ts.append(time.perf_counter() - t0)
    results["full"] = min(ts)
    print(f"{'full (+backtrack)':22} {min(ts)*1000:8.1f} ms", flush=True)
    e = results["edges"]
    s = results["edges+suffix"] - e
    c = results["edges+suffix+scan"] - results["edges+suffix"]
    b = results["full"] - results["edges+suffix+scan"]
    tot = results["full"]
    print(f"\nstage deltas (4MB segment): edges {e:.3f}s | suffix "
          f"{s:.3f}s | scan {c:.3f}s | backtrack+compact {b:.3f}s | "
          f"full {tot:.3f}s -> {4 / tot:.1f} MB/s/segment", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
