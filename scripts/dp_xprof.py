"""Op-level device profile of the production v3 q11 DP segment.

Runs ONE already-cached production dispatch (dp_parse_block_v3 at the
4 MB bucket -- no new kernel compiles) under jax.profiler, then parses
the captured xplane with tensorboard_plugin_profile and aggregates
device op durations by stage:

  sort.*            -> edges (sort-carry candidate discovery)
  mosaic/custom-call -> suffix pre-reduction (Pallas kernel)
  while/scan loops  -> DP scan + backtrack
  everything else   -> elementwise glue (fused regions)

Usage: python scripts/dp_xprof.py [corpus_file]
"""

import glob
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def run_segment(corpus):
    import jax
    import jax.numpy as jnp
    from brotli_tpu.ops import optimal_jax as oj

    arr = np.frombuffer(pathlib.Path(corpus).read_bytes(),
                        np.uint8)[: oj.SEG_V3].copy()
    n = len(arr)
    maxd = (1 << 22) - 16
    seed = oj._seed_parse(arr, maxd, 0)
    tables = oj._cost_tables(arr, seed, lit_table=True)
    # production dispatch path (adds the dict slot row -> 35 slots)
    handles, dict_table = oj._dispatch_v3(arr, n, maxd, tables, [seed])
    oj._collect_v3(handles, dict_table, maxd)  # warm + force

    tdir = "/tmp/dp_xprof_trace"
    import shutil
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        handles, dict_table = oj._dispatch_v3(arr, n, maxd, tables,
                                              [seed])
        oj._collect_v3(handles, dict_table, maxd)
    return tdir


def aggregate(tdir):
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:  # proto layout moved; tensorflow carries a copy
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane captured (device trace unsupported here?)")
        return
    for f in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name \
                    and "Device" not in plane.name:
                continue
            evmeta = {m.id: m.name for m in plane.event_metadata.values()}
            agg = {}
            for line in plane.lines:
                for ev in line.events:
                    name = evmeta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # ms
                    agg[name] = agg.get(name, 0.0) + dur
            tot = sum(agg.values())
            print(f"== plane: {plane.name} (lines={len(plane.lines)}, "
                  f"total {tot:.1f} ms)")
            for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
                print(f"  {ms:9.2f} ms  {name}")


if __name__ == "__main__":
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_corpus16"
    tdir = run_segment(corpus)
    aggregate(tdir)
