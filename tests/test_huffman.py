"""Prefix-code build + serialization property tests."""

import numpy as np
import pytest

from brotli_tpu.dec.decoder import read_huffman_code
from brotli_tpu.enc.entropy import package_merge, write_huffman_code
from brotli_tpu.format.bitio import BitReader, BitWriter
from brotli_tpu.format.huffman import DecodeTable, lengths_to_codes


def test_package_merge_kraft_and_optimality():
    rng = np.random.default_rng(1)
    for _ in range(50):
        freqs = rng.integers(0, 5000, size=256)
        lengths = package_merge(freqs, 15)
        used = np.flatnonzero(lengths)
        assert int(np.sum(1 << (15 - lengths[used]))) == 1 << 15
        assert lengths.max() <= 15
        # optimal code never beaten by the unconstrained Huffman entropy
        p = freqs[used] / freqs[used].sum()
        entropy = -(p * np.log2(p)).sum() * freqs[used].sum()
        cost = int((freqs[used] * lengths[used]).sum())
        assert cost >= entropy - 1e-6


def test_depth_limit_binds():
    # skewed distribution forcing depth > 5 without a limit
    freqs = np.array([1, 2, 4, 8, 16, 32, 64, 128, 256, 512], np.int64)
    lengths = package_merge(freqs, 5)
    assert lengths.max() <= 5
    used = np.flatnonzero(lengths)
    assert int(np.sum(1 << (5 - lengths[used]))) == 1 << 5


@pytest.mark.parametrize("alpha", [26, 64, 256, 704])
def test_serialization_roundtrip(alpha):
    rng = np.random.default_rng(alpha)
    for _ in range(40):
        k = int(rng.integers(2, min(alpha, 80)))
        syms = rng.choice(alpha, size=k, replace=False)
        freqs = np.zeros(alpha, np.int64)
        freqs[syms] = rng.integers(1, 1000, size=k)
        lengths = package_merge(freqs, 15)
        bw = BitWriter()
        write_huffman_code(bw, lengths, alpha)
        bw.write(0b1010101, 7)  # sentinel guards exact bit consumption
        br = BitReader(bw.getvalue())
        table = read_huffman_code(br, alpha)
        codes = lengths_to_codes(lengths)
        for s in np.flatnonzero(lengths):
            sym, used = table.decode(int(codes[s]))
            assert sym == s and used == lengths[s]
        assert br.take(7) == 0b1010101


def test_uniform_256_single_cl_symbol():
    """All literals at length 8 ride the decoder's initial prev_len."""
    freqs = np.ones(256, np.int64)
    lengths = package_merge(freqs, 15)
    assert (lengths == 8).all()
    bw = BitWriter()
    write_huffman_code(bw, lengths, 256)
    assert bw.bit_length < 60  # dramatically smaller than explicit form
    br = BitReader(bw.getvalue())
    table = read_huffman_code(br, 256)
    sym, used = table.decode(0b10101010 << 7 | 0b1010101)
    assert used == 8


def test_degenerate_tables():
    t = DecodeTable.degenerate(42)
    assert t.decode(0x7FFF) == (42, 0)
