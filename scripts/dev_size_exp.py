"""Device-path q11 size experiments: sweep the host-side cost/seed
knobs (all read per call -- one process, no recompiles; the kernel
shapes stay cached) over full 16 MB device encodes and report
size + warm wall time per config.

Usage: python scripts/dev_size_exp.py [corpus] [config...]
  config: comma-separated KEY=VAL env sets, e.g.
    "BROTLI_TPU_DP_ITERS=2" "BROTLI_TPU_SEED_Q=9,BROTLI_TPU_INS_SCALE=0.8"
  With no configs, runs the default matrix.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

DEFAULT_MATRIX = [
    "",  # baseline
    "BROTLI_TPU_DP_ITERS=2",
    "BROTLI_TPU_SEED_Q=9",
    "BROTLI_TPU_SEED_Q=5",
    "BROTLI_TPU_INS_SCALE=0.8",
    "BROTLI_TPU_CMD_EXTRA=0.8",
    "BROTLI_TPU_LIT_SURCHARGE=1.2",
]


def main(corpus="/tmp/bench_corpus16", *configs):
    os.environ["BROTLI_TPU_ENCODER"] = "device"
    import brotli_tpu

    data = pathlib.Path(corpus).read_bytes()
    keys = ("BROTLI_TPU_DP_ITERS", "BROTLI_TPU_SEED_Q",
            "BROTLI_TPU_INS_SCALE", "BROTLI_TPU_CMD_EXTRA",
            "BROTLI_TPU_LIT_SURCHARGE", "BROTLI_TPU_LIT_UTF8")
    if not configs:
        configs = DEFAULT_MATRIX
    # warm the kernels once (first dispatch may load the cached
    # binaries over the tunnel)
    brotli_tpu.compress(data[: 4 << 20], quality=11)
    for cfg in configs:
        for k in keys:
            os.environ.pop(k, None)
        for kv in filter(None, cfg.split(",")):
            k, v = kv.split("=")
            os.environ[k] = v
        t0 = time.perf_counter()
        out = brotli_tpu.compress(data, quality=11)
        dt = time.perf_counter() - t0
        ok = brotli_tpu.decompress(out) == data
        print(f"{cfg or 'baseline':50} {len(out):8d} B  "
              f"{len(data) / dt / 1e6:5.2f} MB/s  "
              f"{'ok' if ok else 'DECODE MISMATCH'}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
