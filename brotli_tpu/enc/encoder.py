"""Encoder orchestration: quality dispatch, metablock partitioning,
uncompressed fallback, streaming. (Parity anchor: c/enc/encode.c
EncodeData / WriteMetaBlockInternal / BrotliEncoderCompress.)

Pipeline: match-find over the whole input (vectorized; JAX path on TPU)
-> split matches at metablock boundaries -> per-block command streams ->
histograms + package-merge trees -> vectorized bit emission.
"""

import numpy as np

from ..format import constants as C
from ..format.bitio import BitWriter
from . import bitstream, matcher

_DEFAULT_MB_BITS = 22  # metablock size (lgblock); <= 24
_VECTOR_THRESHOLD = 1 << 16  # below this the serial matcher is faster


def _sanitize_params(quality, lgwin, lgblock, large_window=False):
    quality = max(0, min(11, int(quality)))
    cap = C.LARGE_MAX_WINDOW_BITS if large_window else C.MAX_WINDOW_BITS
    lgwin = max(C.MIN_WINDOW_BITS, min(cap, int(lgwin)))
    if lgblock == 0:
        lgblock = min(_DEFAULT_MB_BITS, max(16, lgwin))
    lgblock = max(C.MIN_INPUT_BLOCK_BITS,
                  min(C.MAX_INPUT_BLOCK_BITS, int(lgblock)))
    return quality, lgwin, lgblock


import os  # noqa: E402


def find_matches(arr, max_distance, quality, large=False):
    """Quality-dispatched match finder over the full buffer (policy
    table: enc/quality.py, the quality.h role)."""
    from .quality import policy
    pol = policy(quality)
    backend = os.environ.get("BROTLI_TPU_BACKEND", "auto")
    if large:
        # device paths pack distances in 24/25 bits; beyond-RFC windows
        # take the int64 host pipeline
        return matcher.find_matches_vectorized(
            arr, max_distance, num_candidates=pol.num_candidates,
            use_dict=pol.use_dict)
    ncand = pol.num_candidates
    if pol.optimal_parse and len(arr) >= (1 << 18) and backend != "numpy":
        try:
            from ..utils.jaxcfg import backend_or_cpu
            if backend_or_cpu() != "cpu":
                # device DP (zopfli role): candidates + wavefront DP +
                # backtrack all on chip (ops/optimal_jax.py)
                from ..ops.optimal_jax import find_matches_optimal_jax
                return find_matches_optimal_jax(arr, max_distance,
                                                quality)
        except ImportError:
            pass
    if pol.optimal_parse and (1 << 10) <= len(arr) <= (8 << 20):
        # blocked optimal-parse DP (zopfli role, batched across blocks)
        from .optimal import find_matches_optimal
        return find_matches_optimal(arr, max_distance,
                                    nc=pol.dp_candidates)
    if pol.optimal_parse and len(arr) > (8 << 20):
        # very large inputs: iterated cost-model parse until the
        # device DP path covers this size class
        return matcher.find_matches_costmodel(
            arr, max_distance, num_candidates=6, use_dict=True)
    if len(arr) >= _VECTOR_THRESHOLD and backend != "numpy":
        try:
            from ..ops.matcher_jax import find_matches_jax
            return find_matches_jax(arr, max_distance, quality)
        except ImportError:
            pass
        return matcher.find_matches_vectorized(arr, max_distance,
                                               num_candidates=ncand,
                                               use_dict=pol.use_dict)
    if len(arr) >= _VECTOR_THRESHOLD:
        return matcher.find_matches_vectorized(arr, max_distance,
                                               num_candidates=ncand,
                                               use_dict=pol.use_dict)
    m, lens, dists = matcher.find_matches_greedy(arr, max_distance)
    flags = np.zeros(len(m), np.int64)
    if pol.use_dict and len(arr) >= 8:
        return matcher.add_dictionary_matches(arr, m, lens, dists, flags,
                                              max_distance)
    return m, lens, dists, flags


def encode(data: bytes, quality: int = 11, lgwin: int = 22,
           lgblock: int = 0, mode: int = 0, dictionary=None,
           large_window: bool = False, base64_mode: bool = False,
           shared=None) -> bytes:
    """One-shot encode. `dictionary`: optional raw LZ77 (compound)
    dictionary -- matches may reach into it via beyond-window distances
    (parity: BrotliEncoderPrepareDictionary RAW +
    AttachPreparedDictionary). `large_window`: allow lgwin up to 30
    (non-RFC extension, BROTLI_PARAM_LARGE_WINDOW). `base64_mode`:
    detect ';base64,' payload regions, skip LZ there and emit them
    under a forced flat 6-bit literal code (parity:
    BROTLI_PARAM_BASE64_MODE, 1.2.0)."""
    quality, lgwin, lgblock = _sanitize_params(quality, lgwin, lgblock,
                                               large_window)
    # native fast path (role of the reference's C encoder tiers,
    # native/btpu_enc.c): one-shot, standard or large window, no
    # custom dictionary, every quality. The q10/11 optimal-parse tier
    # beats the single-chip device DP in both size and speed (16MB
    # corpus: 539,535 bytes at 7-9 MB/s vs 575,385 at 3.1), so it is
    # the one-shot default; the JAX/device pipeline stays authoritative
    # for the sharded multi-chip path (parallel/shard.py scales
    # per-chip) and compound/serialized dictionaries, and
    # BROTLI_TPU_ENCODER=device forces it for one-shot q10/11.
    # BROTLI_TPU_ENCODER=python routes q10/11 to the ratio-max Python
    # host DP instead.
    enc_sel = os.environ.get("BROTLI_TPU_ENCODER", "auto")
    # raw (compound) dictionary attach rides the native streaming
    # encoder: the dictionary preloads the match window and distances
    # are remapped into the compound address space (encode.c:1756-1884
    # role; round-2 gap: -D workloads ran the NumPy pipeline)
    if (enc_sel not in ("python", "device")
            and dictionary is not None and shared is None and mode == 0
            and not base64_mode and len(data) > 0
            and lgwin <= C.MAX_WINDOW_BITS and len(dictionary) > 0):
        try:
            from .. import native
            return native.encode_with_dict(bytes(data), quality, lgwin,
                                           bytes(dictionary))
        except (ImportError, OSError, ValueError,
                __import__("subprocess").CalledProcessError):
            if enc_sel == "native":
                raise
    if (enc_sel not in ("python", "device")
            and dictionary is None and shared is None
            and mode in (0, 1, 2)
            and not base64_mode and len(data) > 0):
        use_native = True
        if use_native:
            try:
                from .. import native
                return native.encode(bytes(data), quality, lgwin,
                                     mode=mode)
            except (ImportError, OSError, ValueError,
                    __import__("subprocess").CalledProcessError):
                if enc_sel == "native":
                    raise
    bw = BitWriter()
    bitstream.write_stream_header(bw, lgwin)
    raw = bytes(data)
    n = len(raw)
    if n == 0:
        bitstream.write_last_empty(bw)
        return bw.getvalue()
    D = len(dictionary) if dictionary else 0
    arr = np.frombuffer((bytes(dictionary) if D else b"") + raw,
                        dtype=np.uint8)
    maxback = C.max_backward_distance(lgwin)

    from ..utils import trace
    large = lgwin > C.MAX_WINDOW_BITS
    # pipelined q11 device path: serialization of finished metablocks
    # overlaps later segments' device compute
    if (quality >= 10 and n >= (1 << 18) and D == 0 and shared is None
            and not base64_mode and not large and mode == 0
            and enc_sel != "python"
            and os.environ.get("BROTLI_TPU_BACKEND", "auto") != "numpy"):
        try:
            from ..utils.jaxcfg import backend_or_cpu
            if backend_or_cpu() != "cpu":
                out = _encode_q11_streamed(arr, n, maxback, quality,
                                           lgblock, lgwin)
                if len(out) >= n + 4:
                    return _store_uncompressed(arr, lgwin)
                return out
        except ImportError:
            pass
    with trace.stage("match-find"):
        matches = find_matches(arr, maxback, quality, large=large)
    if D:
        matches = _lift_dictionary_matches(matches, D, maxback)
    if shared is not None:
        # custom word lists of an attached serialized dictionary
        # (encoder_dict.c BROTLI_EXPERIMENTAL role)
        from .custom_dict import build_index, add_custom_matches
        idx = build_index(shared)
        if idx is not None:
            m0, l0, d0, f0 = matches
            # a custom word list REPLACES dictionary 0: builtin
            # static-dict references (flags 2..999 legacy cutoffs and
            # 2000+ general transforms) would address the wrong word
            # space at decode -- drop them, their spans become gaps
            # the custom pass can fill
            keep = (f0 < 2) | ((f0 >= 1000) & (f0 < 2000))
            matches = (m0[keep], l0[keep], d0[keep], f0[keep])
            m0, l0, d0, f0 = matches
            # work in stream coordinates for gap/dist math
            matches = add_custom_matches(arr[D:], (m0 - D, l0, d0, f0),
                                         idx, maxback, D)
            m0, l0, d0, f0 = matches
            matches = (m0 + D, l0, d0, f0)
    b64_mask = None
    if base64_mode:
        from . import base64_mode as b64
        starts, lengths = b64.detect_regions(arr[D:])
        if len(starts):
            b64_mask = np.zeros(len(arr), bool)
            b64_mask[D:] = b64.region_mask(arr[D:], starts, lengths)
            matches = b64.drop_matches_in_regions(matches, b64_mask)
    # mode hint (parity: BrotliEncoderMode + ChooseContextMode): TEXT
    # forces the UTF8 context model, FONT the signed-byte model
    ctx_mode = {1: 2, 2: 3}.get(mode)
    _write_blocks(bw, arr, D, D + n, matches, lgblock, is_last=True,
                  ring=None, quality=quality, ctx_floor=D, large=large,
                  context_mode=ctx_mode, b64_mask=b64_mask)
    bw.align_to_byte()
    out = bw.getvalue()
    if len(out) >= n + 4:
        return _store_uncompressed(arr[D:], lgwin)
    return out


def _encode_q11_streamed(arr, n, maxback, quality, lgblock, lgwin):
    """Producer/consumer q11 encode: the device DP streams finished
    metablock spans (ops/optimal_jax) into a serialization worker,
    hiding the host writer under device time.

    Every span serializes to a byte-aligned blob (non-last spans end
    with an empty metadata block -- the BROTLI_OPERATION_FLUSH stitch,
    ~2 bytes per span), so the native matches-array serializer
    (native.serialize_region, ~20x the Python host stage) and the
    Python store_metablock fallback can interleave freely; the 4-slot
    distance ring carries across spans in either representation
    (both are newest-first)."""
    import queue
    import threading

    from ..ops.optimal_jax import find_matches_optimal_jax
    from ..utils import trace

    q = queue.Queue(maxsize=4)
    err = []
    state = {"ring": None}
    parts = []
    try:
        from .. import native
        native.get_lib()
    except (ImportError, OSError, ValueError,
            __import__("subprocess").CalledProcessError):
        native = None
    data_bytes = arr.tobytes() if native is not None else None

    def serialize_span(lo, hi, matches):
        if native is not None:
            try:
                blob, ring = native.serialize_region(
                    data_bytes, lo, hi, matches, quality, lgwin,
                    ring=state["ring"], write_header=(lo == 0),
                    is_last=hi >= n, align_end=True)
                state["ring"] = ring
                parts.append(blob)
                return
            except ValueError:
                pass  # unsupported flags: python span below
        bw = BitWriter()
        if lo == 0:
            bitstream.write_stream_header(bw, lgwin)
        cmds = matcher.matches_to_commands(*matches, lo, hi)
        state["ring"] = bitstream.store_metablock(
            bw, arr, lo, hi - lo, cmds, hi >= n, state["ring"],
            quality=quality)
        if hi < n:
            bw.write(0, 1)   # ISLAST
            bw.write(3, 2)   # MNIBBLES code -> metadata block
            bw.write(0, 1)   # reserved
            bw.write(0, 2)   # MSKIPBYTES = 0
        bw.align_to_byte()
        parts.append(bw.getvalue())

    def worker():
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                with trace.stage("serialize"):
                    serialize_span(*item)
        except BaseException as e:  # surfaced on the producer thread
            err.append(e)
            # keep draining so a blocked producer can always make
            # progress (a dead consumer + full queue would deadlock)
            while True:
                if q.get() is None:
                    return

    t = threading.Thread(target=worker)
    t.start()

    def on_block(lo, hi, matches):
        if err:
            raise err[0]
        q.put((lo, hi, matches))

    try:
        find_matches_optimal_jax(arr, maxback, quality,
                                 on_block=on_block,
                                 mb_size=1 << lgblock)
    finally:
        q.put(None)
        t.join()
    if err:
        raise err[0]
    return b"".join(parts)


def _lift_dictionary_matches(matches, D, maxback):
    """Convert concat-space matches whose source lies in the dictionary
    prefix into compound-dictionary references (RFC shared-brotli):
    stream distance = min(pos, window) + (D - source_offset)."""
    m, lens, dists, flags = matches
    src = m - dists
    in_dict = (src < D) & (flags == 0)
    # source must not cross the dict/data boundary (decoder copies from
    # the dictionary buffer only): trim, drop if too short
    lens = np.where(in_dict, np.minimum(lens, D - src), lens)
    p = m - D  # stream position
    dists = np.where(in_dict,
                     np.minimum(p, maxback) + (D - src), dists)
    flags = np.where(in_dict, 1, flags)
    keep = lens >= 2
    return m[keep], lens[keep], dists[keep], flags[keep]


def _write_blocks(bw, arr, lo, hi, matches, lgblock, is_last,
                  ring=None, quality=1, ctx_floor=0, large=False,
                  context_mode=None, b64_mask=None):
    """Serialize region [lo, hi) as metablocks; returns the distance
    ring state after the last block."""
    from ..utils import trace
    mb_size = 1 << lgblock
    boundaries = list(range(lo + mb_size, hi, mb_size)) + [hi]
    m, lens, dists, flags = matcher.split_matches_at(*matches, boundaries)
    pos = lo
    for bi, b in enumerate(boundaries):
        block_last = is_last and bi == len(boundaries) - 1
        cmds = matcher.matches_to_commands(m, lens, dists, flags, pos, b)
        with trace.stage("serialize"):
            ring = bitstream.store_metablock(
                bw, arr, pos, b - pos, cmds, block_last, ring,
                quality=quality, ctx_floor=ctx_floor, large=large,
                context_mode=context_mode, b64_mask=b64_mask)
        pos = b
    return ring


def _store_uncompressed(arr, lgwin) -> bytes:
    """Whole-input uncompressed fallback (parity: encode.c
    MakeUncompressedStream)."""
    bw = BitWriter()
    bitstream.write_stream_header(bw, lgwin)
    n = len(arr)
    pos = 0
    while pos < n:
        chunk = min(n - pos, bitstream.MAX_MLEN)
        bitstream.write_uncompressed_metablock(
            bw, arr[pos:pos + chunk].tobytes())
        pos += chunk
    bitstream.write_last_empty(bw)
    bw.align_to_byte()
    return bw.getvalue()


class StreamingEncoder:
    """Streaming wrapper around the block encoder.

    Buffered input is emitted on flush()/finish(); each flush ends with
    an empty metadata block to byte-align the stream, so every flushed
    prefix is independently decodable (parity: BROTLI_OPERATION_FLUSH,
    c/include/brotli/encode.h:100-116). Later chunks may reference
    earlier output through the LZ window (`_history`).
    """

    def __init__(self, quality=11, lgwin=22, lgblock=0, mode=0,
                 large_window=False):
        self.params = _sanitize_params(quality, lgwin, lgblock,
                                       large_window)
        self._large = large_window
        self.mode = mode
        self._buf = bytearray()
        self._started = False
        self._finished = False
        self._bw = BitWriter()
        self._history = bytearray()
        self._ring = None
        # native streaming path (persistent hash/DP state across
        # chunks; no re-finding over history): every quality incl. the
        # q10/11 optimal-parse tier (flush = O(chunk); parity:
        # encode.h:100-116), generic mode
        self._native = None
        enc_sel = os.environ.get("BROTLI_TPU_ENCODER", "auto")
        if enc_sel != "python" and mode == 0:
            try:
                from .. import native
                self._native = native.StreamEncoder(self.params[0],
                                                    self.params[1])
            except (ImportError, OSError, ValueError,
                    __import__("subprocess").CalledProcessError):
                if enc_sel == "native":
                    raise
                self._native = None

    def _ensure_header(self):
        if not self._started:
            bitstream.write_stream_header(self._bw, self.params[1])
            self._started = True

    def process(self, chunk: bytes) -> bytes:
        if self._finished:
            raise ValueError("encoder already finished")
        if self._native is not None:
            return self._native.process(bytes(chunk))
        self._buf += chunk
        return b""

    def _emit_buffered(self, is_last: bool):
        quality, lgwin, lgblock = self.params
        self._ensure_header()
        if not self._buf:
            if is_last:
                bitstream.write_last_empty(self._bw)
            return
        data = bytes(self._history) + bytes(self._buf)
        arr = np.frombuffer(data, dtype=np.uint8)
        start = len(self._history)
        large = self._large and lgwin > C.MAX_WINDOW_BITS
        matches = find_matches(arr, C.max_backward_distance(lgwin),
                               quality, large=large)
        # clip matches to the new region (window lookback still works)
        m, lens, dists, flags = matcher.split_matches_at(
            *matches, [start, len(arr)])
        keep = m >= start
        self._ring = _write_blocks(
            self._bw, arr, start, len(arr),
            (m[keep], lens[keep], dists[keep], flags[keep]),
            lgblock, is_last, self._ring, quality=quality, large=large)
        self._history = bytearray(data[-(1 << lgwin):])
        self._buf.clear()

    def emit_metadata(self, payload: bytes) -> bytes:
        """Flush buffered input, then write one metadata block
        (byte-aligned, opaque to decompression)."""
        if self._finished:
            raise ValueError("encoder already finished")
        if self._native is not None:
            return self._native.emit_metadata(bytes(payload))
        self._ensure_header()
        self._emit_buffered(is_last=False)
        bitstream.write_metadata_block(self._bw, payload)
        out = self._bw.getvalue()
        self._bw = BitWriter()
        return out

    def flush(self) -> bytes:
        if self._finished:
            return b""
        if self._native is not None:
            return self._native.flush()
        self._emit_buffered(is_last=False)
        # empty metadata block byte-aligns the stream (decodable prefix)
        self._bw.write(0, 1)   # ISLAST
        self._bw.write(3, 2)   # MNIBBLES code -> metadata block
        self._bw.write(0, 1)   # reserved
        self._bw.write(0, 2)   # MSKIPBYTES = 0
        self._bw.align_to_byte()
        out = self._bw.getvalue()
        self._bw = BitWriter()
        return out

    def finish(self) -> bytes:
        if self._finished:
            return b""
        if self._native is not None:
            self._finished = True
            return self._native.finish()
        self._ensure_header()
        self._emit_buffered(is_last=True)
        self._finished = True
        self._bw.align_to_byte()
        out = self._bw.getvalue()
        self._bw = BitWriter()
        return out
