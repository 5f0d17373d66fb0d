"""Native host runtime (C): fast whole-buffer decoder.

Compiled on demand with the system compiler; falls back cleanly (callers
catch ImportError/OSError and use the Python decoder).
"""

import ctypes
import os
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent
_LIB = _DIR / "_build" / "libbtpu.so"

_lib = None


def _build():
    (_DIR / "_build").mkdir(exist_ok=True)
    tables = _DIR / "btpu_tables.h"
    if not tables.exists() or tables.stat().st_mtime < \
            (_DIR / "gen_tables.py").stat().st_mtime:
        subprocess.run(["python3", str(_DIR / "gen_tables.py")],
                       check=True, capture_output=True)
    srcs = [_DIR / "btpu_dec.c", _DIR / "btpu_enc.c"]
    newest = max(tables.stat().st_mtime,
                 *(s.stat().st_mtime for s in srcs))
    if _LIB.exists() and _LIB.stat().st_mtime >= newest:
        return
    cc = os.environ.get("CC", "cc")
    subprocess.run(
        [cc, "-O2", "-march=native", "-shared", "-fPIC", "-o",
         str(_LIB)] + [str(s) for s in srcs] + ["-lm"],
        check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is None:
        override = os.environ.get("BROTLI_TPU_NATIVE_LIB")
        if override:
            # pre-built library (e.g. the sanitizer harness,
            # scripts/sanitize.sh); no rebuild
            lib = ctypes.CDLL(override)
        else:
            _build()
            lib = ctypes.CDLL(str(_LIB))
        lib.btpu_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_decode.restype = ctypes.c_int
        lib.btpu_decode_ex.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_decode_ex.restype = ctypes.c_int
        lib.btpu_free.argtypes = [ctypes.c_void_p]
        lib.btpu_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_encode.restype = ctypes.c_int
        lib.btpu_encode2.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_encode2.restype = ctypes.c_int
        lib.btpu_pm_lengths.restype = ctypes.c_int
        lib.btpu_find_matches.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_find_matches.restype = ctypes.c_int
        lib.btpu_opt_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_opt_parse.restype = ctypes.c_int
        lib.btpu_enc_new.argtypes = [ctypes.c_int, ctypes.c_int,
                                     ctypes.c_char_p]
        lib.btpu_enc_new.restype = ctypes.c_void_p
        lib.btpu_enc_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_enc_chunk.restype = ctypes.c_int
        lib.btpu_enc_free_stream.argtypes = [ctypes.c_void_p]
        lib.btpu_enc_attach.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.btpu_enc_attach.restype = ctypes.c_int
        lib.btpu_enc_metadata.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_enc_metadata.restype = ctypes.c_int
        lib.btpu_serialize.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p]
        lib.btpu_serialize.restype = ctypes.c_int
        lib.btpu_peak_memory.argtypes = [
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int]
        lib.btpu_peak_memory.restype = ctypes.c_size_t
        lib.btpu_parse_stream.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_uint32)]
        lib.btpu_parse_stream.restype = ctypes.c_int
        lib.btpu_lit_cost.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_double,
            ctypes.c_int, ctypes.c_void_p]
        lib.btpu_lit_cost.restype = ctypes.c_int
        lib.btpu_dict_post.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_dict_post.restype = ctypes.c_int
        lib.btpu_dict_probe_all.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_dict_probe_all.restype = ctypes.c_int
        lib.btpu_dec_new.restype = ctypes.c_void_p
        lib.btpu_dec_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t)]
        lib.btpu_dec_chunk.restype = ctypes.c_int
        lib.btpu_dec_consumed.argtypes = [ctypes.c_void_p]
        lib.btpu_dec_consumed.restype = ctypes.c_size_t
        lib.btpu_dec_finished.argtypes = [ctypes.c_void_p]
        lib.btpu_dec_finished.restype = ctypes.c_int
        lib.btpu_dec_allow_trailing.argtypes = [ctypes.c_void_p,
                                                ctypes.c_int]
        lib.btpu_dec_allow_trailing.restype = None
        lib.btpu_dec_set_output_limit.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_size_t]
        lib.btpu_dec_set_output_limit.restype = None
        lib.btpu_dec_retained.argtypes = [ctypes.c_void_p]
        lib.btpu_dec_retained.restype = ctypes.c_size_t
        lib.btpu_dec_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class DecodeError(ValueError):
    """Native decode failure; `code` mirrors the reference's
    BrotliDecoderErrorCode values (see dec/errors.py)."""

    def __init__(self, code: int):
        from ..dec.errors import NAMES
        self.code = code
        super().__init__(
            f"decode error {NAMES.get(code, code)} ({code})")


def decode(data: bytes, compound: bytes = b"",
           large_window: bool = False) -> bytes:
    """Fast native decode; raises ValueError on invalid streams.
    `compound`: attached raw (compound) dictionary bytes.
    `large_window`: accept the non-RFC large-window extension."""
    from ..format.dictionary import dictionary_data
    lib = get_lib()
    out_ptr = ctypes.c_void_p()
    out_len = ctypes.c_size_t()
    rc = lib.btpu_decode_ex(data, len(data), dictionary_data(),
                            compound or None, len(compound),
                            1 if large_window else 0,
                            ctypes.byref(out_ptr), ctypes.byref(out_len))
    if rc != 0:
        raise DecodeError(rc)
    try:
        return ctypes.string_at(out_ptr, out_len.value)
    finally:
        lib.btpu_free(out_ptr)


_ENC_ERRORS = {
    -3: "out of memory",
    -6: "unsupported parameters for the native encoder",
}


def encode(data: bytes, quality: int, lgwin: int,
           mode: int = 0) -> bytes:
    """Fast native one-shot encode (quality 0-11, lgwin 10-30 incl.
    the large-window extension; q10/11 run the native optimal-parse
    tier). `mode`: BrotliEncoderMode hint (1 TEXT forces the UTF8
    context model, 2 FONT the signed-byte model)."""
    from ..format.dictionary import dictionary_data
    lib = get_lib()
    out_ptr = ctypes.c_void_p()
    out_len = ctypes.c_size_t()
    rc = lib.btpu_encode2(data, len(data), quality, lgwin, mode,
                          dictionary_data(), ctypes.byref(out_ptr),
                          ctypes.byref(out_len))
    if rc != 0:
        raise ValueError(_ENC_ERRORS.get(rc, f"encode error {rc}"))
    try:
        return ctypes.string_at(out_ptr, out_len.value)
    finally:
        lib.btpu_free(out_ptr)


def find_matches(data: bytes, quality: int, lgwin: int):
    """Native greedy/lazy match finder (no emission, no dictionary):
    (pos, len, dist) uint32 numpy arrays in position order. Used as the
    DP seed parse by the device optimal-parse pipeline."""
    import numpy as np
    lib = get_lib()
    n = len(data)
    cap = n // 4 + 16
    pos = np.empty(cap, np.uint32)
    lens = np.empty(cap, np.uint32)
    dist = np.empty(cap, np.uint32)
    cnt = ctypes.c_size_t()
    rc = lib.btpu_find_matches(
        data, n, quality, lgwin,
        pos.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        dist.ctypes.data_as(ctypes.c_void_p),
        cap, ctypes.byref(cnt))
    if rc != 0:
        raise ValueError(_ENC_ERRORS.get(rc, f"match-find error {rc}"))
    k = cnt.value
    return pos[:k], lens[:k], dist[:k]


def opt_parse(data: bytes, quality: int, lgwin: int):
    """Native q10/11 optimal parse (seed -> calibrated cost model ->
    shortest-path DP with dictionary and distance-cache edges): (pos,
    len, dist, flag) int64 numpy arrays for the Python serializer
    (flag = 2000 + base word length marks static-dict references)."""
    import numpy as np
    from ..format.dictionary import dictionary_data
    lib = get_lib()
    n = len(data)
    cap = n // 4 + 16
    pos = np.empty(cap, np.uint32)
    lens = np.empty(cap, np.uint32)
    dist = np.empty(cap, np.uint32)
    flag = np.empty(cap, np.uint32)
    cnt = ctypes.c_size_t()
    rc = lib.btpu_opt_parse(
        data, n, quality, lgwin, dictionary_data(),
        pos.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        dist.ctypes.data_as(ctypes.c_void_p),
        flag.ctypes.data_as(ctypes.c_void_p),
        cap, ctypes.byref(cnt))
    if rc != 0:
        raise ValueError(_ENC_ERRORS.get(rc, f"opt parse error {rc}"))
    k = cnt.value
    return (pos[:k].astype(np.int64), lens[:k].astype(np.int64),
            dist[:k].astype(np.int64), flag[:k].astype(np.int64))


class StreamEncoder:
    """Native streaming encoder: persistent hash-chain state across
    chunks (role parity: BrotliEncoderCompressStream PROCESS/FLUSH/
    FINISH, c/enc/encode.c:1634)."""

    def __init__(self, quality: int, lgwin: int,
                 dictionary: bytes = None):
        from ..format.dictionary import dictionary_data
        self._lib = get_lib()
        self._st = self._lib.btpu_enc_new(quality, lgwin,
                                          dictionary_data())
        if not self._st:
            raise ValueError("unsupported native stream parameters")
        if dictionary:
            # raw LZ77 (compound) dictionary preloaded as history;
            # emitted distances land in the shared-brotli compound
            # address space (encode.c:1828 attach role)
            d = bytes(dictionary)
            rc = self._lib.btpu_enc_attach(self._st, d, len(d))
            if rc != 0:
                raise ValueError(
                    _ENC_ERRORS.get(rc, f"attach error {rc}"))

    def _chunk(self, data: bytes, op: int) -> bytes:
        out_ptr = ctypes.c_void_p()
        out_len = ctypes.c_size_t()
        rc = self._lib.btpu_enc_chunk(self._st, data, len(data), op,
                                      ctypes.byref(out_ptr),
                                      ctypes.byref(out_len))
        if rc != 0:
            raise ValueError(_ENC_ERRORS.get(rc, f"encode error {rc}"))
        if not out_ptr.value:
            return b""
        try:
            return ctypes.string_at(out_ptr, out_len.value)
        finally:
            self._lib.btpu_free(out_ptr)

    def process(self, data: bytes) -> bytes:
        return self._chunk(bytes(data), 0)

    def flush(self) -> bytes:
        return self._chunk(b"", 1)

    def emit_metadata(self, payload: bytes) -> bytes:
        out_ptr = ctypes.c_void_p()
        out_len = ctypes.c_size_t()
        rc = self._lib.btpu_enc_metadata(self._st, payload, len(payload),
                                         ctypes.byref(out_ptr),
                                         ctypes.byref(out_len))
        if rc != 0:
            raise ValueError(_ENC_ERRORS.get(rc, f"encode error {rc}"))
        if not out_ptr.value:
            return b""
        try:
            return ctypes.string_at(out_ptr, out_len.value)
        finally:
            self._lib.btpu_free(out_ptr)

    def finish(self) -> bytes:
        out = self._chunk(b"", 2)
        return out

    def __del__(self):
        st = getattr(self, "_st", None)
        if st:
            self._lib.btpu_enc_free_stream(st)
            self._st = None


def lit_cost(data: bytes, mpos, mlen, surcharge: float = 1.1,
             use_utf8: bool = True):
    """Exact per-position literal bit cost for the device DP, uint8 at
    1/8 bit: 2nd-order context-modeled bits from the seed parse's
    literal histogram, optionally blended with the sliding-window UTF8
    position-in-codepoint model (c/enc/literal_cost.c role)."""
    import numpy as np
    lib = get_lib()
    mp = np.ascontiguousarray(mpos, np.uint32)
    ml = np.ascontiguousarray(mlen, np.uint32)
    out = np.empty(len(data), np.uint8)
    rc = lib.btpu_lit_cost(
        data, len(data), mp.ctypes.data_as(ctypes.c_void_p),
        ml.ctypes.data_as(ctypes.c_void_p), len(mp), surcharge,
        1 if use_utf8 else 0, out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(_ENC_ERRORS.get(rc, f"lit_cost error {rc}"))
    return out


def dict_post(data: bytes, mpos, mlen, max_distance: int,
              base: int = 0, active_from: int = 0):
    """Static-dictionary post-pass over parse gaps (the
    add_dictionary_matches role in one O(n) C pass): returns the NEW
    word references as (pos, out_advance, dist, flag) int64 arrays
    (flag = 2000 + word length)."""
    import numpy as np
    from ..format.dictionary import dictionary_data
    lib = get_lib()
    mp = np.ascontiguousarray(mpos, np.uint32)
    ml = np.ascontiguousarray(mlen, np.uint32)
    cap = max(len(data) // 8 + 64, 1024)
    op = np.empty(cap, np.uint32)
    ol = np.empty(cap, np.uint32)
    od = np.empty(cap, np.uint32)
    of = np.empty(cap, np.uint32)
    cnt = ctypes.c_size_t()
    rc = lib.btpu_dict_post(
        data, len(data), base, active_from, max_distance,
        dictionary_data(), mp.ctypes.data_as(ctypes.c_void_p),
        ml.ctypes.data_as(ctypes.c_void_p), len(mp),
        op.ctypes.data_as(ctypes.c_void_p),
        ol.ctypes.data_as(ctypes.c_void_p),
        od.ctypes.data_as(ctypes.c_void_p),
        of.ctypes.data_as(ctypes.c_void_p), cap, ctypes.byref(cnt))
    if rc != 0:
        raise ValueError(_ENC_ERRORS.get(rc, f"dict_post error {rc}"))
    k = cnt.value
    return (op[:k].astype(np.int64), ol[:k].astype(np.int64),
            od[:k].astype(np.int64), of[:k].astype(np.int64))


def parse_stream(data: bytes, large_window: bool = False):
    """Native deferred symbol parse (device-decode front end; see
    btpu_dec.c btpu_parse_stream): decodes the bit-serial symbol
    stream at native speed and returns the copy graph for device-side
    LZ resolution (ops/lz_resolve.py).

    Returns (lits, nlit_runs, copy_lens, dists, max_depth): the
    literal byte stream, per-command arrays, and the copy-chain depth
    bound (the device resolver needs ceil(log2(depth)) gather steps).
    Raises DecodeError (compound dictionaries and invalid streams
    fall back to the host decoder)."""
    import numpy as np
    from ..format.dictionary import dictionary_data
    lib = get_lib()
    lits_p = ctypes.c_void_p()
    nlit = ctypes.c_size_t()
    cn_p = ctypes.c_void_p()
    cc_p = ctypes.c_void_p()
    cd_p = ctypes.c_void_p()
    ncmd = ctypes.c_size_t()
    max_depth = ctypes.c_uint32()
    rc = lib.btpu_parse_stream(data, len(data), dictionary_data(),
                               1 if large_window else 0,
                               ctypes.byref(lits_p), ctypes.byref(nlit),
                               ctypes.byref(cn_p), ctypes.byref(cc_p),
                               ctypes.byref(cd_p), ctypes.byref(ncmd),
                               ctypes.byref(max_depth))
    if rc != 0:
        raise DecodeError(rc)
    try:
        lits = ctypes.string_at(lits_p, nlit.value)
        k = ncmd.value
        cn = np.ctypeslib.as_array(
            ctypes.cast(cn_p, ctypes.POINTER(ctypes.c_uint32)),
            (k,)).copy() if k else np.zeros(0, np.uint32)
        cc = np.ctypeslib.as_array(
            ctypes.cast(cc_p, ctypes.POINTER(ctypes.c_uint32)),
            (k,)).copy() if k else np.zeros(0, np.uint32)
        cd = np.ctypeslib.as_array(
            ctypes.cast(cd_p, ctypes.POINTER(ctypes.c_uint32)),
            (k,)).copy() if k else np.zeros(0, np.uint32)
    finally:
        for p in (lits_p, cn_p, cc_p, cd_p):
            if p.value:
                lib.btpu_free(p)
    return lits, cn, cc, cd, max_depth.value


def dict_probe_all(data: bytes, mpos, mlen, base: int = 0,
                   maxback: int = (1 << 22) - 16):
    """Static-dictionary probe wherever the seed parse is weak (dict
    edges for the device DP), gated by the synthetic-distance
    word-length rule. Returns (pos u32, payload u32) sparse arrays;
    payload = out_advance << 22 | word_len << 17 | dictoff."""
    import numpy as np
    from ..format.dictionary import dictionary_data
    lib = get_lib()
    mp = np.ascontiguousarray(mpos, np.uint32)
    ml = np.ascontiguousarray(mlen, np.uint32)
    cap = max(len(data) // 8 + 64, 1024)
    op = np.empty(cap, np.uint32)
    pl = np.empty(cap, np.uint32)
    cnt = ctypes.c_size_t()
    rc = lib.btpu_dict_probe_all(
        data, len(data), base, maxback, dictionary_data(),
        mp.ctypes.data_as(ctypes.c_void_p),
        ml.ctypes.data_as(ctypes.c_void_p), len(mp),
        op.ctypes.data_as(ctypes.c_void_p),
        pl.ctypes.data_as(ctypes.c_void_p), cap, ctypes.byref(cnt))
    if rc != 0:
        raise ValueError(_ENC_ERRORS.get(rc, f"probe error {rc}"))
    k = cnt.value
    return op[:k].copy(), pl[:k].copy()


def serialize_region(data: bytes, lo: int, hi: int, matches,
                     quality: int, lgwin: int, ring=None,
                     write_header: bool = False, is_last: bool = False,
                     align_end: bool = True):
    """Native serialization of a parsed region from (pos, len, dist,
    flag) match arrays -- the host stage of the device/sharded
    pipelines (BrotliStoreMetaBlock role). Returns (bytes, exit_ring).
    Raises ValueError for unsupported flags (compound / custom words);
    callers fall back to the Python serializer."""
    import numpy as np
    lib = get_lib()
    m, lens, dists, flags = (np.ascontiguousarray(a, np.uint32)
                             for a in matches)
    ring_in = None
    if ring is not None:
        ring_in = np.ascontiguousarray(ring, np.uint32)
    ring_out = np.zeros(4, np.uint32)
    out_ptr = ctypes.c_void_p()
    out_len = ctypes.c_size_t()
    rc = lib.btpu_serialize(
        data, len(data), lo, hi, quality, lgwin,
        m.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        dists.ctypes.data_as(ctypes.c_void_p),
        flags.ctypes.data_as(ctypes.c_void_p), len(m),
        ring_in.ctypes.data_as(ctypes.c_void_p)
        if ring_in is not None else None,
        1 if write_header else 0, 1 if is_last else 0,
        1 if align_end else 0,
        ctypes.byref(out_ptr), ctypes.byref(out_len),
        ring_out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(_ENC_ERRORS.get(rc, f"serialize error {rc}"))
    try:
        return (ctypes.string_at(out_ptr, out_len.value),
                ring_out.astype(np.int64))
    finally:
        lib.btpu_free(out_ptr)


def encode_with_dict(data: bytes, quality: int, lgwin: int,
                     dictionary: bytes) -> bytes:
    """One-shot native encode with an attached raw compound
    dictionary (the CLI -D / BrotliEncoderAttachPreparedDictionary
    workload, c/enc/encode.c:1756-1884)."""
    enc = StreamEncoder(quality, lgwin, dictionary=dictionary)
    return enc._chunk(bytes(data), 2)


class StreamDecoder:
    """Native chunked decoder: resumes INSIDE a metablock at command /
    literal-run granularity (role parity: BrotliDecoderDecompressStream,
    c/dec/bit_reader.h:73 save/restore), so a single 16 MB metablock
    fed in small chunks needs O(window + chunk) memory -- `consumed`
    advances mid-metablock and the consumed prefix is dropped.
    Accumulates input; each feed() returns the newly decoded bytes.
    `finished` mirrors dec/stream.StreamDecoder."""

    def __init__(self, compound: bytes = b"", large_window: bool = False,
                 allow_trailing: bool = False):
        from ..format.dictionary import dictionary_data
        self._lib = get_lib()
        self._st = self._lib.btpu_dec_new()
        if not self._st:
            raise MemoryError("decoder state")
        if allow_trailing:
            # brcat mode: bytes after the stream end belong to the
            # next concatenated stream (`consumed` marks the boundary)
            self._lib.btpu_dec_allow_trailing(self._st, 1)
        self._dict = dictionary_data()
        self._compound = bytes(compound or b"")
        self._large = 1 if large_window else 0
        self._buf = bytearray()
        self._base = 0  # absolute offset of _buf[0] (consumed prefix
                        # is dropped: memory stays window-bounded)
        self.finished = False
        self.pending_output = False  # suspended at the output limit:
                                     # feed(b"") resumes, no new input

    def set_output_limit(self, limit: int) -> None:
        """Cap NEW output bytes per feed() call (0 = unlimited). At the
        cap decoding SUSPENDS -- a bomb chunk is never eagerly expanded
        (python/_brotli.c output_buffer_limit role, 1.2.0 SECURITY)."""
        if self._st is None:
            raise ValueError("decoder closed")
        self._lib.btpu_dec_set_output_limit(self._st, int(limit))

    def feed(self, data: bytes, final: bool = False) -> bytes:
        if self._st is None:
            raise ValueError("decoder closed")
        self._buf += data
        inp = bytes(self._buf)
        out_ptr = ctypes.c_void_p()
        out_len = ctypes.c_size_t()
        rc = self._lib.btpu_dec_chunk(
            self._st, inp, len(inp), self._base, self._dict,
            self._compound or None, len(self._compound), self._large,
            1 if final else 0, ctypes.byref(out_ptr),
            ctypes.byref(out_len))
        if rc < 0:
            raise DecodeError(rc)
        self.pending_output = (rc == 2)
        out = (ctypes.string_at(out_ptr, out_len.value)
               if out_ptr.value and out_len.value else b"")
        consumed = self._lib.btpu_dec_consumed(self._st)
        if consumed > self._base:
            del self._buf[: consumed - self._base]
            self._base = consumed
        if rc == 0 and self._lib.btpu_dec_finished(self._st):
            self.finished = True
        return out

    @property
    def retained_output(self) -> int:
        """Bytes held in the native output buffer (window retention +
        undelivered back-pressure slices)."""
        if self._st is None:
            raise ValueError("decoder closed")
        return int(self._lib.btpu_dec_retained(self._st))

    @property
    def consumed(self) -> int:
        """Absolute input bytes consumed so far (after `finished`,
        the exact end of the stream -- the brcat concatenation
        point)."""
        if self._st is None:
            raise ValueError("decoder closed")
        return int(self._lib.btpu_dec_consumed(self._st))

    def __del__(self):
        st = getattr(self, "_st", None)
        if st:
            self._lib.btpu_dec_free(st)
            self._st = None
