"""Device-decode path benchmark (SURVEY §7 step 2; round-4 verdict
missing #1): native symbol parse (btpu_dec.c btpu_parse_stream) +
on-device LZ copy resolution (ops/lz_resolve.py).

Prints one JSON line with the stage split so no number can be
mistaken for another: host parse MB/s, device resolve wall (incl.
H2D of literals/commands and D2H of output over the tunnel), and
end-to-end MB/s. Compares against the full native decoder and the
reference CLI on the same stream.

Usage: python scripts/device_decode_bench.py [corpus] [quality]
"""

import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF_CLI = pathlib.Path(__file__).resolve().parents[1] / "build/ref/brotli"


def main(corpus="/tmp/bench_corpus16", quality="9"):
    import brotli_tpu
    from brotli_tpu import native
    from brotli_tpu.ops.lz_resolve import resolve

    data = pathlib.Path(corpus).read_bytes()
    blob = brotli_tpu.compress(data, quality=int(quality))

    # host symbol parse alone
    t0 = time.perf_counter()
    lits, cn, cc, cd, mdep = native.parse_stream(blob)
    t_parse = time.perf_counter() - t0

    # device resolve (first call compiles; time the second)
    out = resolve(lits, cn, cc, cd, max_depth=mdep)
    assert out == data
    t0 = time.perf_counter()
    out = resolve(lits, cn, cc, cd, max_depth=mdep)
    t_resolve = time.perf_counter() - t0

    # end-to-end (parse + resolve, warm)
    from brotli_tpu.dec.device_decode import decompress_device
    t0 = time.perf_counter()
    assert decompress_device(blob) == data
    t_e2e = time.perf_counter() - t0

    # baselines on the same stream
    t0 = time.perf_counter()
    assert native.decode(blob) == data
    t_native = time.perf_counter() - t0
    t_ref = None
    if REF_CLI.exists():
        t0 = time.perf_counter()
        r = subprocess.run([str(REF_CLI), "-d", "-c"], input=blob,
                           capture_output=True)
        t_ref = time.perf_counter() - t0
        assert r.returncode == 0 and r.stdout == data

    mb = len(data) / 1e6
    import jax
    print(json.dumps({
        "backend": jax.default_backend(),
        "stream_mb": round(mb, 1),
        "parse_mbps": round(mb / t_parse, 1),
        "max_chain_depth": int(mdep),
        "resolve_s": round(t_resolve, 3),
        "e2e_mbps": round(mb / t_e2e, 1),
        "native_full_mbps": round(mb / t_native, 1),
        "ref_cli_mbps": round(mb / t_ref, 1) if t_ref else None,
    }))


if __name__ == "__main__":
    main(*sys.argv[1:])
