"""Pre-warm the persistent XLA compilation cache AND the tunnel-side
executable state: compile every device kernel at every pad-bucket
shape the encoder uses, THROUGH THE DEVICE PATH (BROTLI_TPU_ENCODER=
device), plus the host tiers. Run once per machine; afterwards cold
starts hit .jax_cache instead of the (slow) remote compile service.

The 16 MB q11 device encode uses 4 MB DP segments (one pad bucket);
smaller inputs use the 2 MB bucket. Both warm here. bench.py's device
pass warms only the 4 MB bucket itself, so running this script first
makes the bench's warmup a cache/server-state hit."""
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

TESTDATA = pathlib.Path("/root/reference/tests/testdata")


def corpus(target):
    names = ["alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt",
             "mapsdatazrh", "monkey", "cp852-utf8"]
    parts, total = [], 0
    while total < target:
        for n in names:
            b = (TESTDATA / n).read_bytes()
            parts.append(b)
            total += len(b)
            if total >= target:
                break
    return b"".join(parts)[:target]


def warm_device():
    """Device-path kernels (the slow remote compiles) THROUGH THE SAME
    DRIVER FILE bench.py uses (scripts/device_warm.py): the persistent
    cache key includes traced source locations, so warming through any
    other file compiles different cache entries. Own subprocess so a
    wedged compile doesn't block the host warms."""
    here = pathlib.Path(__file__).resolve().parent
    r = subprocess.run(
        [sys.executable, str(here / "scripts" / "device_warm.py"),
         "/tmp/prewarm_corpus", "4", "16", "1"],
        capture_output=True, text=True, timeout=5400)
    print(r.stdout.strip() or r.stderr.strip()[-300:], flush=True)


def main():
    pathlib.Path("/tmp/prewarm_corpus").write_bytes(corpus(16 << 20))
    if not os.environ.get("PREWARM_SKIP_DEVICE"):
        warm_device()
    import brotli_tpu

    for size, quality in [(1 << 20, 1), (1 << 20, 5), (1 << 20, 11),
                          (16 << 20, 1), (16 << 20, 5), (16 << 20, 11)]:
        data = corpus(size)
        t0 = time.time()
        blob = brotli_tpu.compress(data, quality=quality)
        dt = time.time() - t0
        assert brotli_tpu.decompress(blob) == data
        print(f"warm {size >> 20}MB q{quality}: {dt:.1f}s -> "
              f"{len(blob)} bytes", flush=True)


if __name__ == "__main__":
    main()
