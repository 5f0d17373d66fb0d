"""Pre-warm the persistent XLA compilation cache: compile every device
kernel at every pad-bucket shape the encoder uses. Run once per
machine; afterwards cold starts hit .jax_cache instead of the (slow)
remote compile service."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

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


def main():
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
