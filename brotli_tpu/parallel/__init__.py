

def serialize_shard_native(raw, lo, hi, matches, quality, lgwin, ring,
                           write_header, is_last):
    """Shared fast path: serialize one shard's matches through the
    native serializer (btpu_serialize). Returns the bytes or None when
    the native path is unavailable / the flags need the Python
    serializer (compound or custom-word refs) / it is disabled via
    BROTLI_TPU_SERIALIZER=python."""
    import os
    if os.environ.get("BROTLI_TPU_SERIALIZER", "auto") == "python":
        return None
    try:
        from .. import native
        out, _ = native.serialize_region(
            raw, lo, hi, matches, quality, lgwin, ring=ring,
            write_header=write_header, is_last=is_last)
        return out
    except (ImportError, OSError, ValueError,
            __import__("subprocess").CalledProcessError):
        return None
