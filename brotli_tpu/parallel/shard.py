"""Data-parallel sharded compression over a device mesh.

The TPU-native equivalent of the reference's stream-stitching
affordance (BROTLI_PARAM_STREAM_OFFSET, c/include/brotli/encode.h:231-246
+ SURVEY.md section 2.9): the input splits into per-device shards, every
device runs the match kernel on its shard via shard_map, and the host
serializes each shard as whole byte-aligned metablock sequences that
concatenate into ONE valid stream (non-last shards end with an empty
metadata block, the byte-aligning trick behind FLUSH).

Mesh-path shards carry the previous shard's tail as window history
(halo), so matches reach across shard seams; the stitched stream's
decoder window is continuous, which makes those distances valid.
"""

import concurrent.futures as futures

import numpy as np

from ..format import constants as C
from ..format.bitio import BitWriter
from ..enc import bitstream, matcher


def _device_count():
    import jax
    return len(jax.devices())


def compress_sharded(data: bytes, quality: int = 5, lgwin: int = 22,
                     n_shards: int = None, use_device: bool = True,
                     gather: str = "host",
                     serializer: str = "native") -> bytes:
    """Compress with one shard per device; returns a single RFC 7932
    stream (decodable by any conforming decoder). `gather`: "host"
    concatenates shard bytes locally; "collective" all-gathers the
    ordered payloads over the mesh first (multi-host pods: ICI/DCN
    instead of a hand-rolled transport). `serializer`: "native" runs
    the host C matches-array serializer per shard; "device" plans the
    symbol stream and packs the payload bits ON each shard's device
    (ops/bitpack.py -- trivial single-tree metablocks, slightly larger
    output, near-zero host bytes/shard: SURVEY section 7 step 3)."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(arr)
    if n_shards is None:
        n_shards = max(_device_count(), 1) if use_device else 4
    if n == 0 or n < n_shards * (1 << 16):
        from ..enc.encoder import encode
        return encode(data, quality=quality, lgwin=lgwin)

    bounds = np.linspace(0, n, n_shards + 1).astype(np.int64)
    max_distance = C.max_backward_distance(lgwin)

    # Stage 1: device-parallel match finding per shard.
    shard_matches = _find_matches_sharded(arr, bounds, max_distance,
                                          quality, use_device)

    # split matches at metablock boundaries first: splitting can drop
    # tiny straddlers, and the ring derivation below must see exactly
    # the commands that will be serialized
    mb = 1 << min(22, C.MAX_INPUT_BLOCK_BITS)
    shard_bounds = []
    for si in range(n_shards):
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        boundaries = list(range(lo + mb, hi, mb)) + [hi]
        m, lens, dists, flags = shard_matches[si]
        shard_matches[si] = matcher.split_matches_at(
            m + lo, lens, dists, flags, boundaries)
        shard_bounds.append(boundaries)

    # the decoder's distance ring crosses shard seams: derive each
    # shard's entry ring from the previous shard's matches (exact,
    # no serialization needed)
    entry_rings = [None]
    for si in range(n_shards - 1):
        _, _, sdists, sflags = shard_matches[si]
        entry_rings.append(bitstream.ring_after(sdists, sflags,
                                                entry_rings[-1]))

    # Stage 2: host serialization per shard, each shard byte-aligned.
    # The native serializer (btpu_serialize) is the fast path; the
    # Python store_metablock path remains for unsupported flags
    # (compound / custom-word refs) or when forced.
    from . import serialize_shard_native
    raw = bytes(data)

    def serialize(si):
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        # matches were lifted to absolute positions above so the
        # decoder-visible context bytes (p1/p2 across the shard seam)
        # and literal gathers stay exact
        m, lens, dists, flags = shard_matches[si]
        is_last = si == n_shards - 1
        if serializer == "device":
            from .device_serialize import serialize_shard_device
            out = serialize_shard_device(
                arr, lo, hi, (m, lens, dists, flags),
                entry_rings[si], lgwin, si == 0, is_last)
            if out is not None:
                return out
        out = serialize_shard_native(raw, lo, hi, (m, lens, dists, flags),
                                     quality, lgwin, entry_rings[si],
                                     si == 0, is_last)
        if out is not None:
            return out
        bw = BitWriter()
        if si == 0:
            bitstream.write_stream_header(bw, lgwin)
        boundaries = shard_bounds[si]
        pos = lo
        ring = entry_rings[si]
        for bi, b in enumerate(boundaries):
            cmds = matcher.matches_to_commands(m, lens, dists, flags,
                                               pos, b)
            ring = bitstream.store_metablock(
                bw, arr, pos, b - pos, cmds,
                is_last and bi == len(boundaries) - 1, ring,
                quality=quality)
            pos = b
        if not is_last:
            # byte-align with an empty metadata block so shards
            # concatenate on byte boundaries
            bw.write(0, 1)
            bw.write(3, 2)
            bw.write(0, 1)
            bw.write(0, 2)
        bw.align_to_byte()
        return bw.getvalue()

    with futures.ThreadPoolExecutor(max_workers=min(n_shards, 8)) as ex:
        parts = list(ex.map(serialize, range(n_shards)))
    if gather == "collective":
        return _gather_payloads_collective(parts)
    return b"".join(parts)


def _gather_payloads_collective(parts):
    """In-order all-gather of the serialized shard payloads over the
    device mesh (SURVEY 2.9.4: sizes all-gather + padded payload
    all-gather via XLA collectives -- ICI within a slice, DCN across
    hosts -- then host stitching from one gathered replica). On a
    multi-host pod this is how shard bytes reach the writer without a
    hand-rolled transport; single-process it exercises the same
    collective program."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    n = len(parts)
    devs = jax.devices()
    if n == 1 or len(devs) < n:
        return b"".join(parts)
    mesh = Mesh(np.array(devs[:n]), axis_names=("data",))
    sizes = np.array([len(p) for p in parts], np.int32)
    maxlen = int(sizes.max())
    pad = np.zeros((n, maxlen), np.uint8)
    for i, p in enumerate(parts):
        pad[i, :len(p)] = np.frombuffer(p, np.uint8)

    def gather(payload, size):
        return (jax.lax.all_gather(payload[0], "data")[None],
                jax.lax.all_gather(size[0], "data")[None])

    step = jax.jit(shard_map(
        gather, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P("data")), check_vma=False))
    gp, gs = step(jnp.asarray(pad), jnp.asarray(sizes))
    gp = np.asarray(gp)[0]  # every device holds the full ordered set
    gs = np.asarray(gs)[0]
    return b"".join(gp[i, : int(gs[i])].tobytes() for i in range(n))


def _find_matches_sharded(arr, bounds, max_distance, quality, use_device):
    """Per-shard match finding. With several devices, all shards run as
    ONE shard_map dispatch over the mesh (each device match-finds its
    shard; SURVEY 2.9.4); otherwise shards run through the single-device
    kernel (or NumPy when no device path is available)."""
    n_shards = len(bounds) - 1
    if use_device:
        try:
            import jax
            if len(jax.devices()) >= n_shards > 1:
                if quality >= 10:
                    # the expensive tier scales too: per-shard optimal
                    # DP over the mesh (one shard_map program; round-3
                    # gap: q11 silently parsed greedily here)
                    from ..ops.optimal_jax import \
                        find_matches_optimal_sharded
                    return find_matches_optimal_sharded(
                        arr, bounds, max_distance, quality)
                return _find_matches_mesh(arr, bounds, max_distance,
                                          quality)
        except ImportError:
            pass
    out = []
    for si in range(n_shards):
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        shard = arr[lo:hi]
        if use_device:
            try:
                if quality >= 10:
                    from ..ops.optimal_jax import \
                        find_matches_optimal_jax
                    out.append(find_matches_optimal_jax(
                        shard, max_distance, quality, base=lo))
                else:
                    from ..ops.matcher_jax import find_matches_jax
                    out.append(find_matches_jax(shard, max_distance,
                                                quality, base=lo))
                continue
            except ImportError:
                pass
        m, lens, dists, flags = matcher.find_matches_vectorized(
            shard, max_distance, num_candidates=4 if quality >= 5 else 2,
            use_dict=quality >= 5, base=lo)
        out.append((m, lens, dists, flags))
    return out


def _find_matches_mesh(arr, bounds, max_distance, quality):
    """One shard per device via shard_map: the production multi-chip
    match-finding stage. Shards pad to one common bucket; every device
    runs the sort-carry matcher + chain walk + on-device compaction on
    its shard, and only packed matches come back (one D2H per shard).
    Host post-pass (cap extension + static-dictionary probe) mirrors
    ops/matcher_jax.find_matches_jax."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from ..ops.matcher_jax import match_block, CAP, _bucket
    from ..enc.matcher import _extend_capped, add_dictionary_matches

    n_shards = len(bounds) - 1
    sizes = [int(bounds[i + 1] - bounds[i]) for i in range(n_shards)]
    # halo: each shard carries preceding input as window history
    # (match_block's `start` prefix), so matches reach across shard
    # seams up to the full LZ window -- the decoder's window is
    # continuous over the stitched stream, making those distances
    # valid. The bucket doubles to make room for the halo.
    bucket = _bucket(2 * max(sizes))
    if bucket < max(sizes):  # shard exceeds the largest kernel bucket
        raise ValueError("shard too large for the mesh matcher")
    halos = [min(int(max_distance), int(bounds[i]), bucket - sizes[i])
             for i in range(n_shards)]
    batch = np.zeros((n_shards, bucket), np.uint8)
    nposv = np.zeros(n_shards, np.int32)
    startv = np.zeros(n_shards, np.int32)
    for si in range(n_shards):
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        h = halos[si]
        batch[si, :h + hi - lo] = arr[lo - h:hi]
        nposv[si] = max(h + hi - lo - 3, 0)
        startv[si] = h

    ncand = 4 if quality >= 5 else 2
    mesh = Mesh(np.array(jax.devices()[:n_shards]), axis_names=("data",))

    def shard_step(chunk, npos, start):
        count, packed = match_block(chunk[0], npos[0],
                                    jnp.int32(max_distance),
                                    num_candidates=ncand,
                                    start=start[0])
        return count[None], packed[None]

    step = jax.jit(shard_map(
        shard_step, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data")), check_vma=False))
    counts, packed = step(jnp.asarray(batch), jnp.asarray(nposv),
                          jnp.asarray(startv))
    counts = np.asarray(counts)
    packed = np.asarray(packed)

    use_dict = quality >= 5
    out = []
    for si in range(n_shards):
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        h = halos[si]
        cnt = int(counts[si])
        m = packed[si, 0, :cnt].astype(np.int64)
        pay = packed[si, 1, :cnt]
        lens = (pay >> 25).astype(np.int64)
        dists = (pay & np.uint32((1 << 25) - 1)).astype(np.int64)
        flags = np.zeros(cnt, np.int64)
        buf = arr[lo - h:hi]
        m, lens, dists, flags = _extend_capped(buf, m, lens, dists,
                                               flags, CAP, 1 << 24)
        if use_dict:
            m, lens, dists, flags = add_dictionary_matches(
                buf, m, lens, dists, flags, max_distance, lo - h,
                active_from=h)
        keep = m >= h
        out.append((m[keep] - h, lens[keep], dists[keep], flags[keep]))
    return out
