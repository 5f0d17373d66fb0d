"""Public Python API, parity with the reference binding.

Mirrors python/brotli.py + python/_brotli.c of the reference: module-level
``compress``/``decompress``, streaming ``Compressor``/``Decompressor``
(with ``output_buffer_limit`` back-pressure), and a single ``error``
exception type.
"""

from .dec.decoder import Decoder, FormatError

# Compression modes (parity: c/include/brotli/encode.h BrotliEncoderMode).
MODE_GENERIC = 0
MODE_TEXT = 1
MODE_FONT = 2

_QUALITY_DEFAULT = 11
_LGWIN_DEFAULT = 22


class error(Exception):
    """Raised on invalid input or parameters (parity: brotli.error)."""


# reporting seam (parity: BrotliEncoderOnStart/OnFinish +
# BrotliDecoderOnFinish behind BROTLI_REPORTING, CHANGELOG 1.1.0):
# process-wide hooks observing every (de)compression call
_on_start = None
_on_finish = None


def set_reporting_callbacks(on_start=None, on_finish=None):
    """Install metrics hooks: on_start(op: str, in_len: int) and
    on_finish(op: str, in_len: int, out_len: int)."""
    global _on_start, _on_finish
    _on_start = on_start
    _on_finish = on_finish


def estimate_peak_memory(input_size, quality=_QUALITY_DEFAULT,
                         lgwin=_LGWIN_DEFAULT) -> int:
    """Upper bound (bytes) on the native encoder's transient heap for
    a one-shot `compress` of `input_size` bytes — the
    BrotliEncoderEstimatePeakMemoryUsage role
    (/root/reference/c/enc/encode.c:1886). The bound is computed from
    the same formulas the allocation sites use (hasher bucket rings,
    DP arrays, command buffers, serializer scratch, output writer) and
    excludes the caller's own input/output copies. The JAX device
    paths budget memory separately (device HBM, XLA-managed)."""
    from . import native
    lib = native.get_lib()
    return int(lib.btpu_peak_memory(int(input_size), int(quality),
                                    int(lgwin)))


def compress(string, mode=MODE_GENERIC, quality=_QUALITY_DEFAULT,
             lgwin=_LGWIN_DEFAULT, lgblock=0, dictionary=None,
             large_window=False, base64_mode=False) -> bytes:
    """One-shot compression. `large_window` allows lgwin up to 30
    (non-RFC extension; the receiver must opt in too). `dictionary`
    may be raw LZ77 bytes or a serialized shared dictionary (raw
    prefixes attach as compound data; custom word lists are matched
    by the encoder for non-context-based dictionaries)."""
    from .enc.encoder import encode
    shared = None
    if dictionary and bytes(dictionary[:2]) == b"\x91\x00":
        from .format import shared_dictionary as shd
        sd = shd.parse(bytes(dictionary))
        dictionary = b"".join(sd.prefixes) or None
        if sd.word_lists:
            shared = sd  # custom-word matching in the encoder
    if _on_start is not None:
        _on_start("compress", len(string))
    try:
        out = encode(bytes(string), quality=quality, lgwin=lgwin,
                     lgblock=lgblock, mode=mode, dictionary=dictionary,
                     large_window=large_window, base64_mode=base64_mode,
                     shared=shared)
    except ValueError as e:
        raise error(str(e)) from e
    if _on_finish is not None:
        _on_finish("compress", len(string), len(out))
    return out


def decompress(string, dictionary=None, large_window=False) -> bytes:
    """One-shot decompression (native fast path, Python fallback).
    `large_window`: opt in to decoding beyond-RFC window streams
    (parity: BROTLI_DECODER_PARAM_LARGE_WINDOW). `dictionary` may be
    raw LZ77 bytes or a serialized shared dictionary (magic 0x91 00;
    parity: BrotliDecoderAttachDictionary RAW / SERIALIZED)."""
    data = bytes(string)
    import os
    dec_sel = os.environ.get("BROTLI_TPU_DECODER", "native")
    use_native = dec_sel == "native"
    if dec_sel == "device" and not dictionary and not large_window:
        # device decode path (SURVEY 7 step 2): host symbol parse +
        # on-device LZ resolution; context-modeled literal streams
        # fall back to the host decoder below
        from .dec.device_decode import (decompress_device,
                                        UnsupportedForDevice)
        try:
            return decompress_device(data)
        except UnsupportedForDevice:
            pass
        except FormatError as e:
            raise error(str(e)) from e
    if dictionary or large_window:
        shared = None
        if dictionary and bytes(dictionary[:2]) == b"\x91\x00":
            from .format import shared_dictionary as shd
            shared = shd.parse(bytes(dictionary))
            dictionary = None
        # native handles raw compound dicts + large windows; custom
        # word lists / transforms need the Python decoder
        if use_native and (shared is None or
                           not (shared.word_lists or
                                shared.transform_lists)):
            compound = bytes(dictionary) if dictionary else b""
            if shared is not None:
                compound = b"".join(shared.prefixes) + compound
            try:
                from .native import decode as native_decode
                try:
                    return native_decode(data, compound=compound,
                                         large_window=large_window)
                except ValueError as e:
                    raise error(str(e)) from e
            except (ImportError, OSError, subprocess_error()):
                pass
        try:
            return Decoder(dictionary=dictionary, shared=shared,
                           large_window=large_window).decompress(data)
        except FormatError as e:
            raise error(str(e)) from e
        except Exception as e:
            raise error(f"decompression failed: {e}") from e
    if use_native:
        try:
            from .native import decode as native_decode
            try:
                return native_decode(data)
            except ValueError as e:
                raise error(str(e)) from e
        except (ImportError, OSError, subprocess_error()):
            pass
    try:
        return Decoder().decompress(data)
    except FormatError as e:
        raise error(str(e)) from e
    except Exception as e:  # truncated input etc.
        raise error(f"decompression failed: {e}") from e


def subprocess_error():
    import subprocess
    return subprocess.CalledProcessError


def decompress_concatenated(string) -> bytes:
    """Decode back-to-back concatenated streams (parity: the reference
    CLI's brcat / --concatenated mode, c/tools/brotli.c -K).

    Native fast path: the chunked C decoder reports the exact consumed
    offset of each stream end, so every stream decodes at native
    speed; the spec-driven Python decoder remains the fallback."""
    data = bytes(string)
    import os
    native_mod = None
    if os.environ.get("BROTLI_TPU_DECODER", "native") == "native":
        try:
            from . import native as native_mod
            native_mod.get_lib()
        except (ImportError, OSError, subprocess_error()):
            native_mod = None
    if native_mod is not None:
        out = []
        offset = 0
        while offset < len(data):
            sd = native_mod.StreamDecoder(allow_trailing=True)
            try:
                out.append(sd.feed(data[offset:]))
            except native_mod.DecodeError as e:
                raise error(str(e)) from e
            if not sd.finished:
                raise error("truncated concatenated stream")
            consumed = sd.consumed
            if consumed == 0:
                raise error("stalled decoding concatenated stream")
            offset += consumed
        return b"".join(out)
    from .dec.decoder import Decoder
    out = []
    offset = 0
    while offset < len(data):
        dec = Decoder()
        chunk, consumed = dec.decompress_prefix(data[offset:])
        out.append(chunk)
        offset += consumed
        if consumed == 0:
            raise error("stalled decoding concatenated stream")
    return b"".join(out)


class Compressor:
    """Streaming compressor (process/flush/finish).

    Each ``process`` chunk is buffered; ``flush`` emits a byte-aligned,
    independently decodable prefix (FLUSH semantics of
    BrotliEncoderCompressStream); ``finish`` closes the stream.
    """

    def __init__(self, mode=MODE_GENERIC, quality=_QUALITY_DEFAULT,
                 lgwin=_LGWIN_DEFAULT, lgblock=0):
        from .enc.encoder import StreamingEncoder
        self._enc = StreamingEncoder(quality=quality, lgwin=lgwin,
                                     lgblock=lgblock, mode=mode)

    def process(self, string) -> bytes:
        return self._enc.process(bytes(string))

    def flush(self) -> bytes:
        return self._enc.flush()

    def emit_metadata(self, payload) -> bytes:
        """Emit buffered input, then a metadata block (parity:
        BROTLI_OPERATION_EMIT_METADATA)."""
        return self._enc.emit_metadata(bytes(payload))

    def finish(self) -> bytes:
        return self._enc.finish()


class Decompressor:
    """Streaming decompressor with output back-pressure.

    ``output_buffer_limit`` caps the bytes returned by a single
    ``process`` call (parity: python/_brotli.c Decompressor, 1.2.0
    SECURITY change). Both backends apply TRUE back-pressure:
    the native decoder SUSPENDS at the limit (mid-metablock, even
    mid-copy); the pure-python core (custom-words dictionaries) parks
    its decoder thread at the limit (dec/stream.py), at one emitted
    chunk (<= 64 KB) granularity. Either way a small fed chunk that
    expands enormously is never materialized -- retained memory stays
    O(limit + window). While undelivered output is pending,
    ``can_accept_more_data()`` is False and ``process(b"")`` drains
    the next slice.
    """

    def __init__(self, dictionary=None):
        import os
        self._inc = None
        self._native = False
        # a serialized shared dictionary (magic 0x91 0x00) must be
        # PARSED for either backend -- passing the container blob as
        # raw compound bytes would silently corrupt output
        raw = None
        shared = None
        if dictionary:
            d = bytes(dictionary)
            if d[:2] == b"\x91\x00":
                from .format import shared_dictionary as shd
                shared = shd.parse(d)
            else:
                raw = d
        use_native = os.environ.get("BROTLI_TPU_DECODER",
                                    "native") == "native"
        if use_native and (shared is None or
                           not (shared.word_lists or
                                shared.transform_lists)):
            # native chunked decoder: metablock-granular resume at
            # one-shot speed; raw compound / prefix dicts ride along,
            # custom word lists / transforms need the Python decoder
            compound = raw or b""
            if shared is not None:
                compound = b"".join(shared.prefixes) + compound
            try:
                from .native import StreamDecoder as NSD
                self._inc = NSD(compound=compound)
                self._native = True
            except (ImportError, OSError, subprocess_error()):
                self._inc = None
        if self._inc is None:
            # suspend-anywhere streaming core (dec/stream.py): any-bit
            # suspension + window-bounded memory
            from .dec.stream import StreamDecoder
            self._inc = StreamDecoder(dictionary=raw, shared=shared)
        self._pending = bytearray()

    def process(self, string=b"", output_buffer_limit=None) -> bytes:
        if string and not self.can_accept_more_data():
            raise error("cannot accept more data: drain pending output")
        if self._native:
            # true back-pressure: the native decoder stops producing
            # at the limit and resumes on the next call
            self._inc.set_output_limit(output_buffer_limit or 0)
            try:
                return self._inc.feed(bytes(string))
            except ValueError as e:
                raise error(str(e)) from e
        # pure-python fallback core (custom-words dictionaries):
        # same true back-pressure as the native path -- the decoder
        # THREAD parks once undrained output reaches the limit
        # (dec/stream.py _WindowBuffer._gate), so a decompression
        # bomb never materializes past O(limit + window)
        self._inc.set_output_limit(output_buffer_limit)
        try:
            self._pending += self._inc.feed(bytes(string))
        except (FormatError, ValueError) as e:
            raise error(str(e)) from e
        if output_buffer_limit is None:
            out = bytes(self._pending)
            self._pending.clear()
            return out
        out = bytes(self._pending[:output_buffer_limit])
        del self._pending[:output_buffer_limit]
        return out

    def is_finished(self) -> bool:
        return (self._inc.finished and not self._pending
                and not getattr(self._inc, "pending_output", False))

    def can_accept_more_data(self) -> bool:
        return (not self._inc.finished and not self._pending
                and not getattr(self._inc, "pending_output", False))
