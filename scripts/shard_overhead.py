"""Real-chip sharded-encode overhead: one-shot vs compress_sharded.

Round-4 verdict #5b: quantify the dispatch/stitch overhead of the
mesh path against the one-shot device pipeline ON THE REAL CHIP.
With a single chip only n_shards=1 runs; the measurement is the
sharding machinery's overhead (shard prep, halo handling, ordered
gather, stitch) at zero parallelism -- the lower bound any multi-chip
speedup must clear.

Usage: python scripts/shard_overhead.py [corpus] [mb]
Prints one JSON line.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(corpus="/tmp/bench_corpus16", mb="8"):
    import os
    os.environ.setdefault("BROTLI_TPU_ENCODER", "device")
    import jax
    if jax.default_backend() != "tpu":
        print(json.dumps({"no_chip": jax.default_backend()}))
        return 1
    import brotli_tpu
    from brotli_tpu.parallel import shard

    data = pathlib.Path(corpus).read_bytes()[: int(mb) << 20]

    # warm both programs
    brotli_tpu.compress(data, quality=11)
    shard.compress_sharded(data, quality=11, n_shards=1)

    t0 = time.perf_counter()
    one = brotli_tpu.compress(data, quality=11)
    t_one = time.perf_counter() - t0

    t0 = time.perf_counter()
    sh = shard.compress_sharded(data, quality=11, n_shards=1)
    t_sh = time.perf_counter() - t0

    assert brotli_tpu.decompress(one) == data
    assert brotli_tpu.decompress(sh) == data
    print(json.dumps({
        "mb": int(mb),
        "oneshot_s": round(t_one, 2),
        "oneshot_mbps": round(len(data) / t_one / 1e6, 2),
        "sharded1_s": round(t_sh, 2),
        "sharded1_mbps": round(len(data) / t_sh / 1e6, 2),
        "overhead_pct": round(100 * (t_sh - t_one) / t_one, 1),
        "oneshot_bytes": len(one),
        "sharded1_bytes": len(sh),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
