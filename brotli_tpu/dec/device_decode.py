"""Device-path decompression: host symbol parse + device LZ resolve.

The blueprint's decode split (SURVEY §7 step 2): stage A on the host
parses headers, Huffman tables and the symbol stream (inherently
bit-serial — each code's length gates the next code's position);
stage B resolves the LZ copy graph ON DEVICE with log-step pointer
doubling (ops/lz_resolve.py), where the FLOP/byte-movement work lives.
Reference role: c/dec/decode.c:2401-2406 ProcessCommands, re-split so
the byte movement is data-parallel.

Scope: streams whose literal trees are context-INDEPENDENT (trivial
context maps). With context modeling, decoding a literal symbol needs
the two previous OUTPUT bytes — possibly unresolved copies — so the
symbol parse cannot run ahead of resolution. Context-modeled streams
raise UnsupportedForDevice and callers fall back to the host decoder;
covering them would need speculative decode + re-sync (future work).
Dictionary words and uncompressed blocks fold into the literal stream
as pre-resolved runs.
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
