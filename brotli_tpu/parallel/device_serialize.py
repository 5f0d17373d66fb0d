"""Host glue for device-side shard serialization (SURVEY section 7
step 3): per metablock, the device plans the symbol stream and packs
the payload bits (ops/bitpack.py); the host contributes only the
few-hundred-bit header (metablock length, trivial prelude, three
canonical tree descriptions from ~3 KB histograms) and splices the
byte streams.

Output framing matches the mesh path: every metablock is byte-aligned
via an empty metadata block (the FLUSH stitch) so metablocks and
shards concatenate freely; the final metablock of the last shard is
ISLAST. Reference role: BrotliStoreMetaBlockTrivial +
brotli_bit_stream.c:833-943, with the bit emission on-device.
"""

import numpy as np

from ..format import constants as C
from ..format.bitio import BitWriter
from ..format.huffman import lengths_to_codes
from ..enc import bitstream
from ..enc.entropy import package_merge, write_huffman_code

_BUCKETS = [1 << 18, 1 << 22]


def _bucket(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


def _tables(freq, alphabet):
    lens = package_merge(np.asarray(freq[:alphabet], np.int64),
                         C.HUFFMAN_MAX_CODE_LENGTH)
    lens_e = bitstream._emission(lens)
    codes = lengths_to_codes(lens_e)
    return lens, lens_e.astype(np.int32), codes.astype(np.int32)


def serialize_shard_device(arr, lo, hi, matches, ring, lgwin,
                           write_header, is_last, mb_bits=22):
    """Serialize shard [lo, hi) with device symbol planning + bit
    packing. Returns byte-aligned bytes, or None when the device path
    cannot take this shard (caller falls back to the host
    serializer)."""
    import jax
    import jax.numpy as jnp
    from ..ops import bitpack

    m, lens, dists, flags = (np.asarray(a, np.int64) for a in matches)
    if np.any((flags >= 1000) & (flags < 2000)):
        return None  # custom-word refs need the host serializer
    mb = 1 << mb_bits
    out = bytearray()
    if ring is None:
        ring = bitstream.initial_ring()
    ring = np.asarray(ring, np.int64)
    pos = lo
    first = True
    while pos < hi:
        bhi = min(pos + mb, hi)
        mlen = bhi - pos
        keep = (m >= pos) & (m + lens <= bhi)
        bm = (m[keep] - pos).astype(np.int32)
        bl = lens[keep].astype(np.int32)
        bd = dists[keep].astype(np.int32)
        bf = flags[keep].astype(np.int32)
        b = _bucket(mlen)
        ncap = b // 4 + 8
        if len(bm) > ncap - 2 or np.any(bd >= (1 << 25)):
            return None
        pad = ncap - len(bm)
        bm = np.pad(bm, (0, pad))
        bl = np.pad(bl, (0, pad))
        bd = np.pad(bd, (0, pad))
        bf = np.pad(bf, (0, pad))
        data = np.zeros(b, np.uint8)
        data[:mlen] = arr[pos:bhi]
        cap_words = b // 2 + 64

        vals, markers, h_lit, h_cmd, h_dist, new_ring = bitpack.plan_kernel(
            jnp.asarray(data), jnp.asarray(bm), jnp.asarray(bl),
            jnp.asarray(bd), jnp.asarray(bf),
            jnp.int32(int(keep.sum())),
            jnp.asarray(ring.astype(np.int32)), jnp.int32(mlen),
            cap_words=cap_words)
        h_lit = np.asarray(h_lit)
        h_cmd = np.asarray(h_cmd)
        h_dist = np.asarray(h_dist)

        # host: trees + header
        lit_l, lit_le, lit_c = _tables(np.maximum(h_lit, 0), 256)
        cmd_l, cmd_le, cmd_c = _tables(np.maximum(h_cmd, 0),
                                       C.NUM_COMMAND_SYMBOLS)
        dist_alpha = C.distance_alphabet_size(0, 0,
                                              C.MAX_DISTANCE_BITS)
        h_dist_full = np.zeros(dist_alpha, np.int64)
        h_dist_full[:64] = np.maximum(h_dist, 0)
        dist_l, dist_le64, dist_c64 = _tables(h_dist_full, dist_alpha)
        dist_le = np.zeros(64, np.int32)
        dist_c = np.zeros(64, np.int32)
        dist_le[:] = dist_le64[:64]
        dist_c[:] = dist_c64[:64]
        hb = BitWriter()
        if write_header and first:
            bitstream.write_stream_header(hb, lgwin)
        bitstream.write_metablock_header_mlen(
            hb, mlen, is_last and bhi >= hi)
        for _ in range(3):
            bitstream.write_varlen_uint8(hb, 0)  # NBLTYPES = 1
        hb.write(0, 2)  # NPOSTFIX
        hb.write(0, 4)  # NDIRECT
        hb.write(0, 2)  # context mode (no context modeling)
        bitstream.write_varlen_uint8(hb, 0)  # NTREES_L = 1
        bitstream.write_varlen_uint8(hb, 0)  # NTREES_D = 1
        write_huffman_code(hb, lit_l, 256)
        write_huffman_code(hb, cmd_l, C.NUM_COMMAND_SYMBOLS)
        write_huffman_code(hb, dist_l, dist_alpha)
        bit0 = hb.bit_length & 7

        words, total_bits = bitpack.pack_kernel(
            vals, markers, jnp.asarray(lit_c), jnp.asarray(lit_le),
            jnp.asarray(cmd_c), jnp.asarray(cmd_le),
            jnp.asarray(dist_c), jnp.asarray(dist_le),
            jnp.uint32(bit0), cap_words=cap_words)
        total_bits = int(np.asarray(total_bits))
        if total_bits > 32 * cap_words:
            return None  # payload overflow: host fallback
        nbytes = (total_bits + 7) // 8
        payload = np.asarray(words[: (nbytes + 3) // 4]).view(
            np.uint8)[:nbytes]

        header = bytearray(hb.getvalue())  # byte-padded
        hbits = hb.bit_length
        if bit0:
            # the device payload's first byte overlaps the header's
            # ragged last byte: OR-splice
            header[hbits // 8] |= int(payload[0])
            out += header[: hbits // 8 + 1]
            out += payload[1:].tobytes()
        else:
            out += header[: hbits // 8]
            out += payload.tobytes()
        # trailing partial byte of the payload: the next metablock
        # starts byte-aligned via the FLUSH stitch below
        tail_bits = total_bits & 7
        ring = np.asarray(new_ring).astype(np.int64)
        pos = bhi
        first = False
        last_now = is_last and pos >= hi
        if not last_now:
            # empty metadata block starting at bit offset tail_bits of
            # the last payload byte: ISLAST=0, MNIBBLES=3 (metadata),
            # reserved 0, MSKIPBYTES=0, then align
            sb = BitWriter()
            if tail_bits:
                lastb = out[-1]
                del out[-1]
                sb.write(lastb & ((1 << tail_bits) - 1), tail_bits)
            sb.write(0, 1)
            sb.write(3, 2)
            sb.write(0, 1)
            sb.write(0, 2)
            sb.align_to_byte()
            out += sb.getvalue()
        # ISLAST metablocks already end on... (total_bits may be
        # ragged; stream ends are zero-padded by the byte slice)
    return bytes(out)
