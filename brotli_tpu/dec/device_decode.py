"""Device-path decompression: host symbol parse + device LZ resolve.

The blueprint's decode split (SURVEY §7 step 2): stage A on the host
parses headers, Huffman tables and the symbol stream (inherently
bit-serial — each code's length gates the next code's position);
stage B resolves the LZ copy graph ON DEVICE with log-step pointer
doubling (ops/lz_resolve.py), where the FLOP/byte-movement work lives.
Reference role: c/dec/decode.c:2401-2406 ProcessCommands, re-split so
the byte movement is data-parallel.

Context-MODELED literal trees are fully supported: decoding a literal
symbol needs only the two previous OUTPUT bytes (RFC 7932 7.1), and
those are either literals the parser already holds or the trailing
1-2 bytes of the preceding copy — `Decoder._dz_byte_at` resolves
exactly those bytes on the host by chasing the copy graph (one
modulo jump collapses overlapping/RLE chains), so the parse never
waits on bulk resolution. Dictionary words and uncompressed blocks
fold into the literal stream as pre-resolved runs. Only attached
(compound/shared) dictionaries still raise UnsupportedForDevice.
"""

from .decoder import Decoder, UnsupportedForDevice  # noqa: F401


def decompress_device(data: bytes) -> bytes:
    """Decode a brotli stream with the copy resolution on-device.

    Raises UnsupportedForDevice for context-modeled literal streams.
    """
    d = Decoder()
    d.defer_lz = {"lits": bytearray(), "nlit": [], "ncopy": [],
                  "dist": []}
    d.decompress(data)  # symbol parse only; output stays deferred
    g = d.defer_lz
    from ..ops.lz_resolve import resolve
    return resolve(bytes(g["lits"]), g["nlit"], g["ncopy"], g["dist"])
