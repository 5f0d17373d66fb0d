"""Multi-process (multi-host) sharded compression.

The N>=2-host leg of the distributed design (SURVEY 2.9: shard the
input across every device of every process, broadcast the dictionary,
all-gather the ordered compressed payloads). Process boundaries play
the DCN role: on this machine the collectives ride gloo between
processes; on a pod slice the same program rides ICI within a host and
DCN across hosts.

Every process calls compress_sharded_mp with IDENTICAL input after
jax.distributed.initialize; each process match-finds and serializes
only the shards its local devices own, the 4-slot distance-ring chain
crosses process boundaries through a tiny per-shard push summary
(process_allgather), and the byte payloads all-gather so every process
returns the same single RFC 7932 stream.
"""

import numpy as np

from ..format import constants as C
from ..format.bitio import BitWriter
from ..enc import bitstream, matcher


# ring summaries live next to ring_after (one authority for the push
# rule): bitstream.ring_push_summary / ring_apply_summary


def compress_sharded_mp(data: bytes, quality: int = 5,
                        lgwin: int = 22) -> bytes:
    """Multi-process sharded compress. Call from EVERY process with the
    same arguments after jax.distributed.initialize(); returns the same
    stitched stream on every process."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map
    from jax.experimental import multihost_utils as mh
    from ..ops.matcher_jax import match_block, CAP, _bucket
    from ..enc.matcher import _extend_capped, add_dictionary_matches

    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(arr)
    devs = jax.devices()
    n_shards = len(devs)
    if n < n_shards * (1 << 16):
        raise ValueError("input too small for the multi-process path")
    bounds = np.linspace(0, n, n_shards + 1).astype(np.int64)
    max_distance = C.max_backward_distance(lgwin)
    sizes = [int(bounds[i + 1] - bounds[i]) for i in range(n_shards)]
    bucket = _bucket(2 * max(sizes))
    if bucket < max(sizes):
        raise ValueError("shard too large for the mesh matcher")
    halos = [min(int(max_distance), int(bounds[i]), bucket - sizes[i])
             for i in range(n_shards)]

    mesh = Mesh(np.array(devs), axis_names=("data",))
    sharding = NamedSharding(mesh, P("data"))
    proc = jax.process_index()
    local_sis = [si for si in range(n_shards)
                 if devs[si].process_index == proc]

    # batch rows for LOCAL shards only (global-order slab)
    lb = np.zeros((len(local_sis), bucket), np.uint8)
    lnp = np.zeros(len(local_sis), np.int32)
    lst = np.zeros(len(local_sis), np.int32)
    for r, si in enumerate(local_sis):
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        h = halos[si]
        lb[r, : h + hi - lo] = arr[lo - h:hi]
        lnp[r] = max(h + hi - lo - 3, 0)
        lst[r] = h
    batch = jax.make_array_from_process_local_data(sharding, lb)
    nposv = jax.make_array_from_process_local_data(sharding, lnp)
    startv = jax.make_array_from_process_local_data(sharding, lst)

    ncand = 4 if quality >= 5 else 2

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
    counts, packed = step(batch, nposv, startv)

    # local post-pass (cap extension + dictionary + halo filter)
    use_dict = quality >= 5
    local_matches = {}
    cshards = {s.index[0].start: np.asarray(s.data)
               for s in counts.addressable_shards}
    pshards = {s.index[0].start: np.asarray(s.data)
               for s in packed.addressable_shards}
    for si in local_sis:
        cnt = int(cshards[si][0])
        pk = pshards[si][0]
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        h = halos[si]
        m = pk[0, :cnt].astype(np.int64)
        pay = pk[1, :cnt]
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
        local_matches[si] = (m[keep] - h, lens[keep], dists[keep],
                             flags[keep])

    # split at metablock boundaries BEFORE deriving rings (splitting
    # can drop tiny straddlers; the chain must see the serialized set)
    mb = 1 << min(22, C.MAX_INPUT_BLOCK_BITS)
    shard_bounds = {}
    for si in local_sis:
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        boundaries = list(range(lo + mb, hi, mb)) + [hi]
        m, lens, dists, flags = local_matches[si]
        local_matches[si] = matcher.split_matches_at(
            m + lo, lens, dists, flags, boundaries)
        shard_bounds[si] = boundaries

    # ring chain across processes: tiny per-shard push summaries
    TAIL = 5
    lsum = np.zeros((len(local_sis), TAIL), np.int64)
    for r, si in enumerate(local_sis):
        _, _, dists, flags = local_matches[si]
        lsum[r] = bitstream.ring_push_summary(dists, flags, TAIL)
    gsum = np.asarray(mh.process_allgather(lsum, tiled=True))
    entry = {0: None}
    ring = bitstream.initial_ring()
    for si in range(n_shards - 1):
        ring = bitstream.ring_apply_summary(ring, gsum[si])
        entry[si + 1] = ring

    # serialize LOCAL shards (byte-aligned via trailing empty
    # metadata); the native fast path is shared with parallel.shard
    from . import serialize_shard_native
    raw = bytes(data)
    payloads = {}
    for si in local_sis:
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        m, lens, dists, flags = local_matches[si]
        is_last = si == n_shards - 1
        out = serialize_shard_native(raw, lo, hi, (m, lens, dists, flags),
                                     quality, lgwin, entry[si],
                                     si == 0, is_last)
        if out is not None:
            payloads[si] = out
            continue
        bw = BitWriter()
        if si == 0:
            bitstream.write_stream_header(bw, lgwin)
        pos = lo
        ring_s = entry[si]
        for bi, b in enumerate(shard_bounds[si]):
            cmds = matcher.matches_to_commands(m, lens, dists, flags,
                                               pos, b)
            ring_s = bitstream.store_metablock(
                bw, arr, pos, b - pos, cmds,
                is_last and bi == len(shard_bounds[si]) - 1, ring_s,
                quality=quality)
            pos = b
        if not is_last:
            bw.write(0, 1)
            bw.write(3, 2)
            bw.write(0, 1)
            bw.write(0, 2)
        bw.align_to_byte()
        payloads[si] = bw.getvalue()

    # ordered payload all-gather (sizes first, then padded bytes)
    lsz = np.array([len(payloads[si]) for si in local_sis], np.int64)
    gsz = np.asarray(mh.process_allgather(lsz, tiled=True))
    maxlen = int(gsz.max())
    lpad = np.zeros((len(local_sis), maxlen), np.uint8)
    for r, si in enumerate(local_sis):
        lpad[r, : len(payloads[si])] = np.frombuffer(payloads[si],
                                                     np.uint8)
    gpad = np.asarray(mh.process_allgather(lpad, tiled=True))
    return b"".join(gpad[si, : int(gsz[si])].tobytes()
                    for si in range(n_shards))
