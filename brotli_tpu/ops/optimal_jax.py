"""Device optimal-parse DP (q10/q11) -- the zopfli role on TPU.

The host DP in enc/optimal.py is the semantics reference; this is the
same blocked wavefront mapped to XLA primitives so the whole parse
stays on device:

  * candidates come from tiered multi-operand sorts (sort-carry, like
    ops/matcher_jax.py) -- positions plus 32 bytes of data ride each
    sort, so the k nearest prior occurrences sharing a 4/8/16-byte
    prefix and their capped match lengths are shifted-vector compares,
    no gathers (see LEVELS);
  * the DP is a lax.scan over in-block position i with the block axis
    as the vector dimension. All edges are <= W-1 long, so relaxation
    targets live in a rolling (nb, W) cost window carried through the
    scan; per-slot updates are length-range masks over W (every prefix
    of a match relaxes, priced per landed length) -- pure VPU work,
    zero scatter/gather in the loop;
  * long matches enter as *continuation* edges: every position inside a
    previous-parse match gets an edge (min(W-1, end-i), dist). Chunks
    re-coalesce into single long commands after backtracking (the
    emitter's ring code 0 makes mid-chain chunks nearly free anyway);
  * backtracking walks each block in a second scan (one small gather
    per step), then selected matches compact through a final sort so
    only ~8 bytes per match cross the host boundary.

Cost model tables (context-modeled literal bits, copy/distance symbol
bits) are built on host from the greedy seed parse -- they are a few KB.
"""

import functools
import subprocess

import jax
import jax.numpy as jnp

from ..utils.jaxcfg import ensure_cache

ensure_cache()
import numpy as np

HASH_MUL = np.uint32(0x1E35A7BD)
HASH_MUL2 = np.uint32(0x9E3779B1)
CAPD = 32         # candidate match-length cap (8 carried words)
W = 64            # DP window: max edge length W-1
B = 4096          # DP block size (hard parse boundary)
# hierarchical candidate levels (prefix bytes, occurrence ranks):
# rank r = the r-th nearest prior occurrence sharing the prefix, via
# sort-carry row shifts. Common 4-grams flood a nearest-k list and
# hide longer matches farther back, so longer-prefix levels carry
# exponentially spaced FAR ranks too -- the reference H10 binary tree
# remembers window-wide sources, and the round-3 native sweep showed
# shallow pools lose ~1,300 long matches at median distance ~150 KB
# on plrabn12 alone (mirrors the native DP's 2048-entry rings).
LEVELS = (
    (4, tuple(range(1, 13)) + (16,)),
    (8, tuple(range(1, 9)) + (16, 32, 64, 128, 256, 512)),
)
# (a third 16-byte level with 10 far ranks was part of the round-3
# pool design; BROTLI_TPU_LEVEL3=1 restores it. Dropped by default in
# round 5: the q9 seed's long-range table now finds the window-scale
# repeats the level existed for, and its sort stack was ~25% of the
# per-segment device time)
if _dp_level3_env := __import__("os").environ.get("BROTLI_TPU_LEVEL3"):
    if _dp_level3_env == "1":
        LEVELS = LEVELS + ((16, (1, 2, 3, 4, 8, 16, 32, 64, 128, 256)),)
QB = 16           # cost quantization (1/16 bit), matches host DP
SEG = 1 << 21     # DP segment size: one pad-bucket shape keeps the
                  # (expensive) kernel compile count at one; long-range
                  # matches still flow in as seed/continuation edges
                  # found by the 8MB-segment greedy matcher

# one bucket shape: every distinct padded shape compiles its own
# kernels, and sort compiles are minutes-expensive on this backend
# (remote compile service)
_BUCKETS = [1 << 21]

# DP pipeline modes (BROTLI_TPU_DP env; default picked per backend):
#   v1 -- pure-XLA wavefront: the scan step reduces all nslots slots
#         (measured 460 ms of the ~610 ms per 2 MB segment on TPU v5e;
#         the step is compute-bound at (nslots, nb, W) work).
#   v3 -- Pallas suffix-min pre-reduction: a kernel collapses the
#         nslots edge slots into a dense per-position (cost, payload)
#         table over the W window columns (embarrassingly parallel,
#         VMEM-resident tiles), so the sequential scan step shrinks to
#         one (nb, W) compare-update. Round-2's "V2" attempted the
#         same pre-reduction in raw XLA and materialized 29 full
#         (n, W) intermediates (measured 194 s vs v1's 6 s on the
#         16 MB corpus) -- the fusion Pallas provides is the point.
# v3 is the TPU default; v1 remains the CPU/testing path (v3 runs
# under pallas interpret mode off-TPU for correctness tests).
import os as _os_mod


def _dp_mode() -> str:
    forced = _os_mod.environ.get("BROTLI_TPU_DP", "")
    if forced in ("v1", "v3"):
        return forced
    from ..utils.jaxcfg import backend_or_cpu
    return "v3" if backend_or_cpu() == "tpu" else "v1"


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


def _shift_up(x, k, fill):
    return jnp.concatenate([jnp.full((k,), fill, x.dtype), x[:-k]])


def _tz_bytes_u32(x):
    b0 = (x & 0xFF) == 0
    b1 = (x & 0xFFFF) == 0
    b2 = (x & 0xFFFFFF) == 0
    b3 = x == 0
    return (b0.astype(jnp.int32) + b1 + b2 + b3)


def _dist_cost_q(dist, dist_sym_bits_q):
    """Quantized explicit-distance cost: symbol bits + extra bits
    (npostfix = ndirect = 0; matches enc/optimal._dist_sym_extra)."""
    d = jnp.maximum(dist, 1) - 1
    v = (d + 4) >> 2
    nbits = 32 - jax.lax.clz(v | 1)  # bit_length(v)
    half = ((d + 4 - (jnp.int32(2) << nbits)) >> nbits) & 1
    sym = jnp.clip(16 + ((nbits - 1) << 1 | half), 0, 63)
    return dist_sym_bits_q[sym] + nbits * QB


def _level_candidates(w, pos, npos, max_distance, ranks, hval):
    """One prefix level's rank-r candidates via sort-carry.

    hval: uint32 hash of this level's prefix (17 significant bits).
    Returns a list of len(ranks) packed (len<<25 | dist) arrays in
    position order (rank r = r-th nearest prior same-hash row)."""
    n = pos.shape[0]
    nw = len(w)
    # single packed sort key: 17-bit hash | coarse position. Variadic
    # 2-key sorts compile ~20x slower on this backend, and coarse
    # in-bucket ordering only shuffles which k a neighbor lands at
    # (validity is re-checked with dist > 0).
    key = jnp.where(pos < npos,
                    (hval << 14) | (pos.astype(jnp.uint32) >> 9),
                    jnp.uint32(1 << 31) | pos.astype(jnp.uint32))
    key_s, pos_u, *w_s = jax.lax.sort(
        (key, pos.astype(jnp.uint32)) + tuple(w), num_keys=1)
    h_s = key_s >> 14  # padding rows keep the high bit -> never equal
    pos_s = pos_u.astype(jnp.int32)

    packed_s = []
    for k in ranks:
        same = (h_s == _shift_up(h_s, k, jnp.uint32(0xFFFFFFFF))) & \
            (key_s < (jnp.uint32(1) << 31))
        dist = pos_s - _shift_up(pos_s, k, jnp.int32(-1))
        valid = same & (dist > 0) & (dist <= max_distance)
        mlen = jnp.zeros(n, jnp.int32)
        alive = valid
        for r in range(nw):
            x = w_s[r] ^ _shift_up(w_s[r], k, jnp.uint32(0))
            tz = _tz_bytes_u32(x)
            mlen = mlen + jnp.where(alive, tz, 0)
            alive = alive & (x == 0)
        mlen = jnp.minimum(mlen, jnp.maximum(npos + 3 - pos_s, 0))
        mlen = jnp.where(valid & (mlen >= 2), mlen, 0)
        packed_s.append(mlen.astype(jnp.uint32) << 25 |
                        jnp.where(mlen > 0, dist, 0).astype(jnp.uint32))
    # back to position order: pos_u is unique, so splitting into
    # lower-arity sorts (compile cost grows superlinearly with operand
    # count on this backend) yields the same permutation
    cand_packed = []
    for j in range(0, len(packed_s), 8):
        back = jax.lax.sort((pos_u,) + tuple(packed_s[j:j + 8]),
                            num_keys=1)
        cand_packed.extend(back[1:])
    return cand_packed


def _edges_slots(data, npos, max_distance, dist_sym_bits_q,
                 seed_pos, seed_len, seed_dist):
    """Per-slot edges shared by the v1 and v3 pipelines: tiered
    sort-carry candidate levels + seed continuation edges, flat
    (nslots, n) layout, block-boundary clipped. Returns
    (ls_flat, cs_flat, ds_flat)."""
    n = data.shape[0]
    d32 = data.astype(jnp.uint32)
    nw = CAPD // 4
    w = [None] * nw
    w[0] = d32 | jnp.roll(d32, -1) << 8 | jnp.roll(d32, -2) << 16 | \
        jnp.roll(d32, -3) << 24
    for r in range(1, nw):
        w[r] = jnp.roll(w[0], -4 * r)
    pos = jnp.arange(n, dtype=jnp.int32)
    cand_packed = []
    for plen, ranks in LEVELS:
        if plen == 4:
            hval = (w[0] * HASH_MUL) >> jnp.uint32(15)
        elif plen == 8:
            hval = ((w[0] * HASH_MUL) ^ (w[1] * HASH_MUL2)) >> \
                jnp.uint32(15)
        else:
            hval = ((w[0] * HASH_MUL) ^ (w[1] * HASH_MUL2) ^
                    (w[2] * jnp.uint32(0x85EBCA77)) ^
                    (w[3] * jnp.uint32(0xC2B2AE3D))) >> jnp.uint32(15)
        lvl_npos = jnp.maximum(npos - (plen - 4), 0)
        cand_packed.extend(_level_candidates(
            w, pos, lvl_npos, max_distance, ranks, hval))
    num_candidates = len(cand_packed)

    # continuation edges from seed matches: scatter (end, dist) at each
    # match start, then forward-fill over the interior. Seed matches
    # come from a parse, so they never overlap -- a "latest non-zero"
    # fill (associative) recovers the covering match at every position.
    ends = jnp.zeros(n, jnp.int32)
    sdist = jnp.zeros(n, jnp.int32)
    sp = jnp.clip(seed_pos, 0, n - 1)
    ends = ends.at[sp].max(jnp.where(seed_len > 0,
                                     seed_pos + seed_len, 0))
    sdist = sdist.at[sp].max(jnp.where(seed_len > 0, seed_dist, 0))
    last_nz = lambda a, b: jnp.where(b > 0, b, a)
    end_fill = jax.lax.associative_scan(last_nz, ends)
    dist_fill = jax.lax.associative_scan(last_nz, sdist)
    cont_len = jnp.clip(end_fill - pos, 0, W - 1)
    cont_dist = jnp.where(cont_len >= 2, dist_fill, 0)

    # (ring modeling lives IN THE SCAN, not here: a round-5 ablation
    # on the native DP isolated path-ring distance-cache pricing as
    # the dominant parse feature -- 37.7K bytes on Canterbury-5 --
    # but a precomputed slot can only know the SEED-timeline ring,
    # which recovers 2.9K of 35.7K on the 16MB corpus (measured both
    # on the host emulation, BTPU_OPT_NO_RING=3, and as a device
    # slot: 1.3K). ring[0] of the best path INTO each position is
    # path state, so _scan_math_v3 carries it and prices one
    # ring-code edge per step -- see its docstring.)

    # per-slot edge (len, dist-costq), flat (nslots, n). The copy-code
    # side of the command cost is added per relaxed length downstream
    # -- the rolling W-window gives the all-length relaxation of the
    # reference zopfli DP for free (the length axis IS the window).
    slots_len = []
    slots_cost = []
    for k in range(num_candidates):
        le = (cand_packed[k] >> 25).astype(jnp.int32)
        le = jnp.minimum(le, W - 1)
        di = (cand_packed[k] & jnp.uint32((1 << 25) - 1)).astype(
            jnp.int32)
        cost = _dist_cost_q(di, dist_sym_bits_q)
        slots_len.append(le)
        slots_cost.append(jnp.where(le >= 2, cost, 1 << 28))
    # continuation slot: if chunks of a long match end up adjacent they
    # coalesce after backtracking, so the real cost is at most the
    # modeled cost (never a broken promise). Measured A/B (8MB corpus,
    # CPU backend): pricing interior chunks at ~epsilon instead of the
    # full explicit-distance cost is size-neutral-to-worse -- the DP
    # already rides long seeds at full pricing because local
    # alternatives price no better.
    ccost = _dist_cost_q(cont_dist, dist_sym_bits_q)
    slots_len.append(jnp.where(cont_dist > 0, cont_len, 0))
    slots_cost.append(jnp.where((cont_len >= 2) & (cont_dist > 0),
                                ccost, 1 << 28))

    ls_flat = jnp.stack(slots_len)          # (nslots, n)
    cs_flat = jnp.stack(slots_cost)
    slots_dist = [(cp & jnp.uint32((1 << 25) - 1)).astype(jnp.int32)
                  for cp in cand_packed[:num_candidates]] + [cont_dist]
    ds_flat = jnp.stack(slots_dist)
    # clip edges that would cross the block boundary; kill sub-2 stubs
    i_in_b = (pos % B)[None, :]
    ls_flat = jnp.minimum(ls_flat, B - i_in_b)
    cs_flat = jnp.where(ls_flat >= 2, cs_flat, 1 << 28)
    return (ls_flat.astype(jnp.int32), cs_flat.astype(jnp.int32),
            ds_flat.astype(jnp.int32), dist_fill)


@jax.jit
def _edges_kernel(data, npos, max_distance, litbits_q, copyq,
                  dist_sym_bits_q, seed_pos, seed_len, seed_dist):
    """v1 edges: slots + table-marginalized literal costs, emitted in
    blocked (B, nslots, nb) layout for the all-slots DP scan."""
    n = data.shape[0]
    nb = n // B
    pos = jnp.arange(n, dtype=jnp.int32)
    ls_flat, cs_flat, ds_flat, _ = _edges_slots(
        data, npos, max_distance, dist_sym_bits_q, seed_pos, seed_len,
        seed_dist)
    nslots = ls_flat.shape[0]
    # literal cost per position: host prepares litbits_q as a
    # [p1, byte] (256 x 256) table -- the p1-driven part of the context
    # model with p2 marginalized out (v3 ships the exact per-position
    # cost instead; see dp_parse_block_v3).
    p1 = jnp.where(pos >= 1, jnp.roll(data, 1), 0).astype(jnp.int32)
    litq = litbits_q.reshape(-1)[(p1 << 8) | data.astype(jnp.int32)]
    # payload = len<<25 | dist: the winning edge's distance rides the
    # DP scan, so backtracking needs no per-slot candidate gathers
    litq_b = litq.reshape(nb, B).T
    pd_flat = (ls_flat << 25) | jnp.where(ls_flat >= 2, ds_flat, 0)
    pd_all = pd_flat.reshape(nslots, nb, B).transpose(2, 0, 1)
    cs_all = cs_flat.reshape(nslots, nb, B).transpose(2, 0, 1)
    return (pd_all.astype(jnp.int32), cs_all.astype(jnp.int32), litq_b)


@jax.jit
def _scan_kernel(pd_all, cs_all, litq_b, copyq):
    """The DP wavefront: lax.scan over in-block position, blocks as
    the vector axis, relaxation into a rolling (nb, W) window.

    Every PREFIX length 2..len of an edge relaxes in the same step: the
    window columns are exactly the candidate lengths, so the one-hot
    equality mask becomes a <= range mask and each column c prices as
    dist_cost + copyq[c] (the all-length relaxation of the reference
    zopfli UpdateNodes, exact on device). Edge payloads are
    len<<25|dist with len = the landed column."""
    nb = litq_b.shape[1]
    INF = jnp.int32(1 << 30)
    iota_w = jnp.arange(W, dtype=jnp.int32)
    copyq_w = copyq[jnp.minimum(iota_w, copyq.shape[0] - 1)]

    def step(carry, xs):
        F, P = carry  # (nb, W) cost, payload
        lq, pd, cs = xs  # (nb,), (nslots, nb), (nslots, nb)
        cost_i = F[:, 0]
        pay_i = P[:, 0]
        # literal relax into +1
        lv = cost_i + lq
        upd = lv < F[:, 1]
        F = F.at[:, 1].set(jnp.where(upd, lv, F[:, 1]))
        P = P.at[:, 1].set(jnp.where(upd, 0, P[:, 1]))
        # all slots at once: each edge relaxes every window column up
        # to its length (range mask), min-reduce cost over the slot
        # axis, then recover the winner's payload with a second masked
        # reduction (no int64: x64 mode is off)
        ls = pd >> 25                                 # (nslots, nb)
        di = pd & jnp.int32((1 << 25) - 1)
        v = cost_i[None, :] + cs                      # (nslots, nb)
        hit = (iota_w[None, None, :] <= ls[:, :, None]) & \
            (iota_w[None, None, :] >= 2)              # (nslots, nb, W)
        M = jnp.where(hit, v[:, :, None] + copyq_w[None, None, :], INF)
        minv = M.min(axis=0)                          # (nb, W)
        # per-column payload: landed length | the edge's distance;
        # sentinel must exceed any real len<<25|dist packing
        paycol = (iota_w[None, None, :] << 25) | di[:, :, None]
        PM = jnp.where(M == minv[None, :, :], paycol,
                       jnp.int32(0x7FFFFFFF))
        pay = PM.min(axis=0)
        better = minv < F
        F = jnp.where(better, minv, F)
        P = jnp.where(better, pay, P)
        # shift the window
        F = jnp.concatenate([F[:, 1:], jnp.full((F.shape[0], 1), INF)],
                            axis=1)
        P = jnp.concatenate([P[:, 1:], jnp.zeros((P.shape[0], 1),
                                                 jnp.int32)], axis=1)
        return (F, P), pay_i

    F0 = jnp.full((nb, W), INF, jnp.int32).at[:, 0].set(0)
    P0 = jnp.zeros((nb, W), jnp.int32)
    (Fend, Pend), pays = jax.lax.scan(step, (F0, P0),
                                      (litq_b, pd_all, cs_all))
    # pays[i] = final payload of position i (every edge into i comes
    # from j < i); the block end B needs the post-scan window head
    return jnp.concatenate([pays.T, Pend[:, 0][:, None]], axis=1)


def _scan_math_v3(mp_all, litq_b, wc_all=None, w_full=None,
                  ring_init=None, ring_cost=None, copyq_row=None,
                  npos=None, icell_row=None):
    """The v3 DP wavefront: the Pallas pre-reduction already collapsed
    the slots into per-position (cost, payload) tables over the W
    columns (packed [M | P] in the 128-lane minor dim), so a step is
    one (nb, W) compare-update -- nslots-times less sequential work
    than _scan_kernel.

    Distance-cache modeling (pass the ring args together; None = off):
    ring[0] of the best path INTO a position is PATH STATE -- a
    precomputed slot can only know the seed-timeline ring, which
    recovers 2.9K of the 35.7K bytes path-ring pricing is worth on
    the 16MB corpus (native-DP ablation, BTPU_OPT_NO_RING). So the
    scan carries R, the ring[0] per window column, updated alongside
    every cost win (match -> its distance; literal -> inherited), and
    each step prices ONE extra edge: the match at the CURRENT path
    ring distance (length from a 16-byte gather-compare against the
    full segment), at the short-code symbol cost `ring_cost` instead
    of explicit distance bits (the host DP's s==0 probe,
    opt_parse_block; reference ComputeDistanceCache role,
    backward_references_hq.c).

    wc_all: (B, 4, nb) u32 -- the 16-byte window of each lane's
    position, scanned in. w_full: (4, n) u32 -- the same words over
    the whole segment, gathered at pos - ring. ring_init: (nb,) seed
    ring at block starts (blocks are hard parse boundaries, so the
    true entry ring is unknowable; the seed timeline warms up within
    a few matches)."""
    INF = jnp.int32(1 << 30)
    nb = litq_b.shape[1]
    with_ring = wc_all is not None
    if with_ring:
        n_full = w_full.shape[1]
        iota_w = jnp.arange(W, dtype=jnp.int32)
        cq_w = copyq_row[0, :W]
        # min-pricing the ring edge against the implicit-cell row was
        # measured WORSE on the real chip (16MB 536,399 -> 538,084 B:
        # the seed replay's sparse implicit-cell stats smooth into an
        # over-optimistic price and the DP overbuys short ring
        # copies), so the cell row ships but stays out of the price
        # unless BROTLI_TPU_ICELL=1 (re-test hook; traced at compile)
        use_icell = (icell_row is not None and
                     _os_mod.environ.get("BROTLI_TPU_ICELL") == "1")
        ring_w = jnp.minimum(ring_cost + cq_w,
                             icell_row if use_icell
                             else jnp.int32(1 << 28))
        lane_base = jnp.arange(nb, dtype=jnp.int32) * B

    def step(carry, xs):
        if with_ring:
            F, P, R, i = carry
            lq, mp, wc = xs  # (nb,), (nb, 2*W), (4, nb)
        else:
            F, P = carry
            lq, mp = xs
        M = mp[:, :W]
        PY = mp[:, W:]
        cost_i = F[:, 0]
        pay_i = P[:, 0]
        lv = cost_i + lq
        upd = lv < F[:, 1]
        F = F.at[:, 1].set(jnp.where(upd, lv, F[:, 1]))
        P = P.at[:, 1].set(jnp.where(upd, 0, P[:, 1]))
        if with_ring:
            ring_i = R[:, 0]
            # literal advance inherits the ring
            R = R.at[:, 1].set(jnp.where(upd, ring_i, R[:, 1]))
            # ring edge: match length at dist = ring_i (16-byte cap)
            src = lane_base + i - ring_i
            ok = (ring_i > 0) & (src >= 0)
            srcc = jnp.clip(src, 0, n_full - 1)
            rl = jnp.zeros(nb, jnp.int32)
            alive = ok
            for k in range(4):
                x = wc[k] ^ w_full[k][srcc]
                tz = _tz_bytes_u32(x.astype(jnp.uint32))
                rl = rl + jnp.where(alive, tz, 0)
                alive = alive & (x == 0)
            rl = jnp.minimum(rl, B - (i % B))
            rl = jnp.minimum(rl, jnp.maximum(
                npos + 3 - (lane_base + i), 0))  # wrapped-pad guard
            rv = jnp.where((iota_w[None, :] >= 2) &
                           (iota_w[None, :] <= rl[:, None]),
                           cost_i[:, None] + ring_w[None, :],
                           INF)
            rbet = rv < F
            F = jnp.where(rbet, rv, F)
            P = jnp.where(rbet, (iota_w[None, :] << 25) | ring_i[:, None],
                          P)
            R = jnp.where(rbet, ring_i[:, None], R)
            # pre-reduced edges
            minv = cost_i[:, None] + M
            better = minv < F
            F = jnp.where(better, minv, F)
            P = jnp.where(better, PY, P)
            R = jnp.where(better, PY & jnp.int32((1 << 25) - 1), R)
            F = jnp.concatenate([F[:, 1:], jnp.full((nb, 1), INF)],
                                axis=1)
            P = jnp.concatenate([P[:, 1:],
                                 jnp.zeros((nb, 1), jnp.int32)], axis=1)
            R = jnp.concatenate([R[:, 1:],
                                 jnp.zeros((nb, 1), jnp.int32)], axis=1)
            return (F, P, R, i + 1), pay_i
        minv = cost_i[:, None] + M
        better = minv < F
        F = jnp.where(better, minv, F)
        P = jnp.where(better, PY, P)
        F = jnp.concatenate([F[:, 1:], jnp.full((nb, 1), INF)], axis=1)
        P = jnp.concatenate([P[:, 1:], jnp.zeros((nb, 1), jnp.int32)],
                            axis=1)
        return (F, P), pay_i

    F0 = jnp.full((nb, W), INF, jnp.int32).at[:, 0].set(0)
    P0 = jnp.zeros((nb, W), jnp.int32)
    # unroll: the per-step vector work is tiny (nb x 2W), so the while
    # loop is overhead-bound (~21 us/step profiled); 4 steps per
    # iteration amortize it
    if with_ring:
        R0 = jnp.zeros((nb, W), jnp.int32) + ring_init[:, None]
        (Fend, Pend, _, _), pays = jax.lax.scan(
            step, (F0, P0, R0, jnp.int32(0)), (litq_b, mp_all, wc_all),
            unroll=4)
    else:
        (Fend, Pend), pays = jax.lax.scan(step, (F0, P0),
                                          (litq_b, mp_all), unroll=4)
    return jnp.concatenate([pays.T, Pend[:, 0][:, None]], axis=1)


def _finish_math(paymat, npos):
    """Backtrack every block and compact matches (the payload already
    carries len<<25|dist, so no candidate lookups are needed)."""
    nb = paymat.shape[0]
    n = nb * B
    bidx = jnp.arange(nb, dtype=jnp.int32)

    def bstep(posv, _):
        v = paymat[bidx, posv]
        ln = v >> 25
        stepb = jnp.where(posv > 0, jnp.maximum(ln, 1), 0)
        src = posv - stepb
        is_match = (ln >= 2) & (posv > 0)
        return src, (jnp.where(is_match, src, -1), v)

    pos0 = jnp.full((nb,), B, jnp.int32)
    _, (srcs, vs) = jax.lax.scan(bstep, pos0, None, length=B, unroll=4)
    # srcs: (B, nb) local match starts (-1 = none); recover global pos
    gsrc = jnp.where(srcs >= 0, srcs + (bidx[None, :] * B),
                     -1).reshape(-1)
    vflat = vs.reshape(-1)

    valid = (gsrc >= 0) & (gsrc < npos)
    key = jnp.where(valid, gsrc.astype(jnp.uint32),
                    jnp.uint32(0xFFFFFFFF))
    pos_c, pay_c = jax.lax.sort(
        (key, vflat.astype(jnp.uint32)), num_keys=1)
    count = jnp.sum(valid.astype(jnp.int32))
    half = n // 2
    return count, jnp.stack([pos_c[:half], pay_c[:half]])


_finish_kernel = jax.jit(_finish_math)


def dp_parse_block(data, npos, max_distance, litbits_q, copyq,
                   dist_sym_bits_q, seed_pos, seed_len, seed_dist):
    """One segment's optimal parse, entirely on device (three jits;
    intermediates never leave the chip). See module docstring."""
    a, b, litq_b = _edges_kernel(
        data, npos, max_distance, litbits_q, copyq, dist_sym_bits_q,
        seed_pos, seed_len, seed_dist)
    paymat = _scan_kernel(a, b, litq_b, copyq)
    return _finish_kernel(paymat, npos)


# ---------------------------------------------------------------------
# v3 pipeline: Pallas suffix-min pre-reduction + light scan + batched
# single-transfer collect. One jit per segment (one tunnel dispatch).
# ---------------------------------------------------------------------

SEG_V3 = 1 << 22          # v3 segment size
_BUCKETS_V3 = [1 << 21, 1 << 22]
CAPM_DIV = 8              # batched-collect match cap = bucket // 8


def _bucket_v3(n: int) -> int:
    for b in _BUCKETS_V3:
        if n <= b:
            return b
    return _BUCKETS_V3[-1]


def _suffix_kernel(pd_ref, cs_ref, cq_ref, mp_ref):
    """Collapse the edge slots of one DP block into dense per-position
    (cost, payload) tables over the W window columns.

    pd/cs: (nslots, B) packed len<<25|dist and dist-cost per slot;
    slot layout: [candidates... (len <= 32), dict (ATOMIC: only its
    exact output length relaxes -- a word reference cannot be taken
    partially), continuation (<= W-1)].
    cq: (1, 128) with the per-landed-length copy-code cost in [:W];
    mp out: (2W, B) = [M ; P] stacked row-blocks. Row c of M = min cost
    over edges with len >= c, plus copyq[c]; P = (c << 25) | argmin
    edge's distance.

    This is the reduction round-2's raw-XLA "V2" materialized as 29
    full (n, W) intermediates (190 s); here each tile lives in VMEM and
    HBM sees only the final packed write.

    Layout: (W, CH) with positions on the 128-lane MINOR axis. The
    first version used (CH, W_CAND=33) tiles -- 33 in the lane dim
    wastes 74% of every vreg -- and unrolled the slot loop in python,
    whose live temporaries scale with nslots (34 slots at CH=256 hit
    17.96 MB of VMEM), forcing CH=128; it profiled at 242 ms per 4 MB
    segment (47% of device time, xprof). Transposed + a fori_loop over
    slots (constant live set; the dict slot's ==-mask folds into the
    range mask by raising the lower bound to ls) runs the same
    reduction at full lane occupancy: the synchronous warm segment
    dropped 1.70 s -> 1.28 s on the real chip, identical parse."""
    from jax.experimental import pallas as pl
    nslots = pd_ref.shape[0]
    Bk = pd_ref.shape[1]
    INF = jnp.int32(1 << 28)
    BIGD = jnp.int32(0x7FFFFFFF)
    MASK25 = jnp.int32((1 << 25) - 1)
    CH = 2048

    def chunk(j, carry):
        base = pl.multiple_of(j * CH, CH)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, CH), 0)

        def slot(s, ap):
            acc, pay = ap
            pd = pd_ref[s, pl.ds(base, CH)]
            ls = pd >> 25
            ds = pd & MASK25
            cs = cs_ref[s, pl.ds(base, CH)]
            # dict slot (nslots-2) is ATOMIC: only its exact length
            # relaxes -- expressed as the same range mask with the
            # lower bound raised to ls
            lo = jnp.where(s == nslots - 2, jnp.maximum(ls, 2),
                           jnp.int32(2))
            hit = (iota_w <= ls[None, :]) & (iota_w >= lo[None, :])
            v = jnp.where(hit, cs[None, :], INF)
            upd = v < acc
            return (jnp.where(upd, v, acc),
                    jnp.where(upd, ds[None, :], pay))

        acc0 = jnp.full((W, CH), INF, jnp.int32)
        pay0 = jnp.full((W, CH), BIGD, jnp.int32)
        acc, pay = jax.lax.fori_loop(0, nslots, slot, (acc0, pay0))
        cq = cq_ref[0, :W]
        m = jnp.where(acc < INF, acc + cq[:, None], jnp.int32(1 << 29))
        p = jnp.where(pay != BIGD, (iota_w << 25) | pay, 0)
        mp_ref[:, pl.ds(base, CH)] = jnp.concatenate([m, p], axis=0)
        return carry

    jax.lax.fori_loop(0, Bk // CH, chunk, 0)


def _suffix_pallas(pd_flat, cs_flat, copyq_row, interpret):
    """(nslots, n) slots -> (2W, n) packed [M ; P] tables (one DP block
    of positions per grid step; positions on the minor axis so every
    (8, 128) tile is fully occupied)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nslots, n = pd_flat.shape
    nb = n // B
    return pl.pallas_call(
        _suffix_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((nslots, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nslots, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * W, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * W, n), jnp.int32),
        interpret=interpret,
    )(pd_flat, cs_flat, copyq_row)


def _dp_v3_impl(data, npos, max_distance, bits_tab, ctx_tab, copyq_row,
                dist_sym_bits_q, seed_pos, seed_len, seed_dist,
                dict_pos, dict_pay, seg_base, *, capm,
                interpret=False):
    """One segment's v3 optimal parse as a single dispatch: edges ->
    Pallas suffix-min -> light scan -> backtrack, with the compacted
    matches packed for a batched one-transfer collect.

    bits_tab / ctx_tab: the (64*256,) quantized context-model literal
    bits and the (256*256,) p1p2 -> context lookup. Per-position
    literal costs are two on-device gathers (~60 ms per 4 MB segment)
    instead of an n-byte tunnel upload (~140 ms + a host pass) -- the
    tunnel moves ~29 MB/s, so bytes ARE time. The 2 context bytes at
    the segment head fall back to p=0 (the host path used global
    context there; 2 of 4 M positions is noise).

    dict_pos/dict_pay: sparse static-dictionary edges from the host
    probe (payload = advance << 22 | wlen << 17 | dictoff); they
    become an ATOMIC slot in the DP so word references compete inside
    the parse instead of only patching its gaps (the parse-stats diff
    vs the native DP showed 19x fewer word refs without this).
    seg_base: absolute stream offset of data[0] (dictionary distances
    are position-dependent).

    Returns (packed, full): packed is (2, capm + 8) uint32 with the
    match count at [0, 0] and matches at [:, 8 : 8 + capm] -- the
    count-first layout lets the collect fetch HALF the buffer (counts
    rarely exceed capm // 2) and still see the count; full is the
    uncapped (2, n//2) compaction, fetched only on capm overflow."""
    n = data.shape[0]
    nb = n // B
    icell_row = dist_sym_bits_q[64:64 + W]  # see _dispatch_v3 packing
    dist_sym_bits_q = dist_sym_bits_q[:64]
    ls_flat, cs_flat, ds_flat, dist_fill = _edges_slots(
        data, npos, max_distance, dist_sym_bits_q, seed_pos, seed_len,
        seed_dist)
    pd_flat = (ls_flat << 25) | jnp.where(ls_flat >= 2, ds_flat, 0)
    # dict slot row (inserted before the continuation slot)
    pos_i = jnp.arange(n, dtype=jnp.int32)
    val = dict_pay.astype(jnp.int32)
    dpp = jnp.clip(dict_pos, 0, n - 1)
    dls = jnp.zeros(n, jnp.int32).at[dpp].max(
        jnp.where(val > 0, (val >> 22) & 0x3FF, 0))
    doff = jnp.zeros(n, jnp.int32).at[dpp].max(
        jnp.where(val > 0, val & ((1 << 17) - 1), 0))
    dls = jnp.where(dls <= B - (pos_i % B), dls, 0)  # atomic: no split
    maxd_at = jnp.minimum(seg_base + pos_i, max_distance)
    ddist = jnp.where(dls >= 2, maxd_at + 1 + doff, 0)
    dcost = jnp.where(dls >= 2,
                      _dist_cost_q(ddist, dist_sym_bits_q),
                      jnp.int32(1 << 28))
    pdD = (dls << 25) | jnp.where(dls >= 2, ddist, 0)
    pd_flat = jnp.concatenate([pd_flat[:-1], pdD[None, :],
                               pd_flat[-1:]], axis=0)
    cs_flat = jnp.concatenate([cs_flat[:-1], dcost[None, :],
                               cs_flat[-1:]], axis=0)
    mp_flat = _suffix_pallas(pd_flat, cs_flat, copyq_row, interpret)
    mp_all = mp_flat.reshape(2 * W, nb, B).transpose(2, 1, 0)
    # per-position literal cost: ctx = lut0[p1]|lut1[p2] then
    # bits[ctx, byte], both as device gathers (u8 at 1/8 bit ->
    # 1/16 units)
    d32 = data.astype(jnp.int32)
    p1 = _shift_up(d32, 1, jnp.int32(0))
    p2 = _shift_up(d32, 2, jnp.int32(0))
    cid = ctx_tab[(p1 << 8) | p2].astype(jnp.int32)
    litq_u8 = bits_tab[(cid << 8) | d32]
    litq_b = (litq_u8.astype(jnp.int32) * 2).reshape(nb, B).T
    # in-scan path-ring pricing (see _scan_math_v3). Default OFF on
    # speed grounds: the per-step gathers profiled at 354 ms per 4 MB
    # segment (xprof while.13; 43 ms without) and the edge recovers
    # only ~400 B on the 16 MB corpus -- the path-ring feedback loop
    # that makes the host DP's probes worth 2.6K needs 4 ring slots +
    # unbounded lengths, which this single capped probe cannot reach.
    # BROTLI_TPU_RING_SCAN=1 re-enables (traced at compile time).
    if _os_mod.environ.get("BROTLI_TPU_RING_SCAN") == "1":
        du = data.astype(jnp.uint32)
        w0 = du | jnp.roll(du, -1) << 8 | jnp.roll(du, -2) << 16 | \
            jnp.roll(du, -3) << 24
        w_full = jnp.stack([jnp.roll(w0, -4 * k) for k in range(4)])
        wc_all = w_full.reshape(4, nb, B).transpose(2, 0, 1)
        ring_init = dist_fill.reshape(nb, B)[:, 0]
        paymat = _scan_math_v3(mp_all, litq_b, wc_all=wc_all,
                               w_full=w_full, ring_init=ring_init,
                               ring_cost=dist_sym_bits_q[0],
                               copyq_row=copyq_row, npos=npos,
                               icell_row=icell_row)
    else:
        paymat = _scan_math_v3(mp_all, litq_b)
    count, stacked = _finish_math(paymat, npos)
    packed = jnp.zeros((2, capm + 8), jnp.uint32)
    packed = packed.at[0, 0].set(count.astype(jnp.uint32))
    packed = packed.at[:, 8:8 + capm].set(stacked[:, :capm])
    return packed, stacked


dp_parse_block_v3 = functools.partial(
    jax.jit, static_argnames=("capm", "interpret"))(_dp_v3_impl)


@jax.jit
def _stack_jit(xs):
    return jnp.stack(xs)


def _seg_seed_edges(seeds_list, lo, hi, cap):
    """Seed matches intersected with segment [lo, hi) (a suffix of an
    LZ match is a match at the same distance, so a giant match spanning
    several segments seeds each of them); fixed pad size keeps one
    compiled shape. Short seeds are redundant with the segment-local
    candidates and their H2D upload was a measurable stall."""
    spos_parts, slen_parts, sdist_parts = [], [], []
    for (qm, ql, qd, qf) in seeds_list:
        start = np.maximum(qm, lo)
        end = np.minimum(qm + ql, hi)
        in_seg = (end - start >= 16) & (qf < 2)
        spos_parts.append((start[in_seg] - lo).astype(np.int32))
        slen_parts.append((end - start)[in_seg].astype(np.int32))
        sdist_parts.append(qd[in_seg].astype(np.int32))
    spos = np.concatenate(spos_parts)
    slen = np.concatenate(slen_parts)
    sdist = np.concatenate(sdist_parts)
    if len(spos) > cap:  # keep the longest seeds
        keep = np.argsort(slen)[::-1][:cap]
        keep.sort()
        spos, slen, sdist = spos[keep], slen[keep], sdist[keep]
    pad = cap - len(spos)
    return (np.pad(spos, (0, pad)), np.pad(slen, (0, pad)),
            np.pad(sdist, (0, pad)))


def _dict_probe_global(arr, seeds_list, base, max_distance):
    """One native static-dictionary probe over the whole input
    (seed-gated; ~1% of positions). Returns (positions, payloads,
    word lengths); empty arrays when the native library is absent."""
    from ..utils import trace
    dpos_g = np.zeros(0, np.uint32)
    dpay_g = np.zeros(0, np.uint32)
    with trace.stage("dp.dict-probe"):
        try:
            from .. import native
            qm, ql = seeds_list[0][0], seeds_list[0][1]
            dpos_g, dpay_g = native.dict_probe_all(
                np.ascontiguousarray(arr).tobytes(), qm, ql, base,
                max_distance)
        except (ImportError, OSError, ValueError,
                subprocess.CalledProcessError):
            pass
    dwlen_g = ((dpay_g >> 17) & 0x1F).astype(np.int64)
    return dpos_g, dpay_g, dwlen_g


def _prep_segment_v3(arr, seeds_list, dpos_g, dpay_g, lo, hi, b):
    """Host-side small inputs of one v3 DP segment (seed continuation
    + dictionary edges; the data itself ships once for the whole
    buffer -- see _dispatch_v3)."""
    spos, slen, sdist = _seg_seed_edges(seeds_list, lo, hi, b // 128)
    # dict edges inside [lo, hi) whose word fits the segment
    douts = (dpay_g >> 22).astype(np.int64)
    in_seg = (dpos_g >= lo) & (dpos_g + douts <= hi)
    dp_loc = (dpos_g[in_seg].astype(np.int64) - lo).astype(np.int32)
    dp_val = dpay_g[in_seg].astype(np.int32)
    cap_d = b // 64
    if len(dp_loc) > cap_d:  # keep the longest words
        keep = np.argsort(dp_val >> 22)[::-1][:cap_d]
        keep.sort()
        dp_loc, dp_val = dp_loc[keep], dp_val[keep]
    pad = cap_d - len(dp_loc)
    return (max(hi - lo - 3, 0), spos, slen, sdist,
            np.pad(dp_loc, (0, pad)), np.pad(dp_val, (0, pad)))


@functools.partial(jax.jit, static_argnames=("b",))
def _slice_seg(dev_big, lo, *, b):
    return jax.lax.dynamic_slice(dev_big, (lo,), (b,))


def upload_input(arr, n):
    """One H2D of the whole (bucket-padded) input; segments become
    on-device slices. The tunnel moves ~29 MB/s with ~28 ms per call,
    so one 16 MB transfer launched EARLY (it overlaps the host seed
    parse and cost tables) replaces four 4 MB per-segment uploads on
    the critical path."""
    tail = n - (n // SEG_V3) * SEG_V3
    pad_to = (n // SEG_V3) * SEG_V3 + (_bucket_v3(tail) if tail else 0)
    big = np.zeros(max(pad_to, _BUCKETS_V3[0]), np.uint8)
    big[:n] = arr[:n]
    return jnp.asarray(big)


def _dispatch_v3(arr, n, max_distance, tables, seeds_list, base=0,
                 dict_future=None, dev_big=None, lo_start=0):
    """Dispatch every segment's v3 DP (async; one jit call each).
    Returns (handles, dict_table): dict_table = (global hit positions,
    word lengths) for flag recovery at collect time. `dict_future`:
    optional concurrent.futures handle for an already-running
    _dict_probe_global (the caller overlaps the probe with the cost
    tables -- both are GIL-releasing native passes). `dev_big`: the
    upload_input() handle if the caller started the upload early."""
    from ..utils import trace
    bits_tab, copyq, distq, ctx_tab, icellq = tables
    copyq_row = np.zeros((1, 128), np.int32)
    copyq_row[0, :W] = copyq[:W]
    cq = jnp.asarray(copyq_row)
    # the dist channel carries [64 distance-symbol costs | W-entry
    # implicit-cell row] so the icell table rides the existing
    # plumbing (kernel signature unchanged)
    dq = jnp.asarray(np.concatenate([distq, icellq]).astype(np.int32))
    btab = jnp.asarray(bits_tab.astype(np.int32).reshape(-1))
    ctab = jnp.asarray(ctx_tab.astype(np.int32))
    if dev_big is None:
        dev_big = upload_input(arr, n)
    from ..utils.jaxcfg import backend_or_cpu
    interp = backend_or_cpu() != "tpu"
    if dict_future is not None:
        dpos_g, dpay_g, dwlen_g = dict_future.result()
    else:
        dpos_g, dpay_g, dwlen_g = _dict_probe_global(
            arr, seeds_list, base, max_distance)
    handles = []
    for lo in range(lo_start, n, SEG_V3):
        hi = min(lo + SEG_V3, n)
        b = _bucket_v3(hi - lo)
        capm = b // CAPM_DIV
        with trace.stage("dp.seg-prep"):
            (npos, spos, slen, sdist, dp_loc,
             dp_val) = _prep_segment_v3(arr, seeds_list, dpos_g,
                                        dpay_g, lo, hi, b)
        with trace.stage("dp.dispatch"):
            packed, full = dp_parse_block_v3(
                _slice_seg(dev_big, jnp.int32(lo), b=b),
                jnp.int32(npos), jnp.int32(max_distance), btab, ctab,
                cq, dq, jnp.asarray(spos), jnp.asarray(slen),
                jnp.asarray(sdist), jnp.asarray(dp_loc),
                jnp.asarray(dp_val), jnp.int32(lo + base), capm=capm,
                interpret=interp)
        handles.append((lo, capm, packed, full))
    return handles, (dpos_g.astype(np.int64), dwlen_g)


@functools.partial(jax.jit, static_argnames=("k",))
def _stack_slice_jit(xs, *, k):
    return jnp.stack([x[:, :k] for x in xs])


def _collect_v3(handles, dict_table, max_distance, base=0):
    """One stacked D2H per packed shape (a tunnel round trip costs
    ~0.5 s regardless of size and the link moves ~29 MB/s, so segment
    results ship together AND sliced to half the match cap -- the
    count-first layout keeps the count inside the slice; rare
    overflows pay a second fetch). Matches whose distance exceeds the
    window at their position are the DP's dictionary edges; their
    word-length flags (2000 + wlen) come back from the host probe
    table."""
    from ..utils import trace
    dpos_g, dwlen_g = dict_table
    groups = {}
    for i, (_lo, capm, packed, _full) in enumerate(handles):
        groups.setdefault((packed.shape, capm), []).append(i)
    fetched = [None] * len(handles)
    kslice = {}
    with trace.stage("dp.fetch"):
        for (_shape, capm), idxs in groups.items():
            k = 8 + capm // 2
            for i in idxs:
                kslice[i] = k
            if len(idxs) == 1:
                fetched[idxs[0]] = np.asarray(
                    handles[idxs[0]][2][:, :k])
            else:
                host = np.asarray(_stack_slice_jit(
                    tuple(handles[i][2] for i in idxs), k=k))
                for j, i in enumerate(idxs):
                    fetched[i] = host[j]
    all_m, all_l, all_d, all_f = [], [], [], []
    for (lo, capm, packed, full), hp in zip(handles, fetched):
        cnt = int(hp[0, 0])
        if cnt > capm:  # rare overflow: fetch the uncapped compaction
            hostf = np.asarray(full)
            pos_c, pay_c = hostf[0, :cnt], hostf[1, :cnt]
        elif cnt > capm // 2:  # middle tier: fetch the full packed
            hostp = np.asarray(packed)
            pos_c, pay_c = hostp[0, 8:8 + cnt], hostp[1, 8:8 + cnt]
        else:
            pos_c, pay_c = hp[0, 8:8 + cnt], hp[1, 8:8 + cnt]
        if cnt == 0:
            continue
        mm = pos_c.astype(np.int64) + lo
        ml = (pay_c >> 25).astype(np.int64)
        md = (pay_c & np.uint32((1 << 25) - 1)).astype(np.int64)
        mf = np.zeros(len(mm), np.int64)
        isd = md > np.minimum(mm + base, max_distance)
        if isd.any() and len(dpos_g):
            di = np.searchsorted(dpos_g, mm[isd])
            di = np.minimum(di, len(dpos_g) - 1)
            found = dpos_g[di] == mm[isd]
            w = np.where(found, 2000 + dwlen_g[di], 0)
            mf[np.flatnonzero(isd)] = w
        # a dict-flagged match whose probe lookup failed is
        # unserializable -- drop it (its span falls back to literals)
        keep = ~isd | (mf >= 2000)
        all_m.append(mm[keep])
        all_l.append(ml[keep])
        all_d.append(md[keep])
        all_f.append(mf[keep])
    return all_m, all_l, all_d, all_f


_CTX_TAB2 = None  # (65536,) uint8: lut0[p1] | lut1[p2], UTF8 mode


def _ctx_tab2() -> np.ndarray:
    global _CTX_TAB2
    if _CTX_TAB2 is None:
        from ..format import context as ctx
        lut = ctx.context_lut(2)
        p1 = np.arange(256, dtype=np.int64)
        _CTX_TAB2 = (lut[0][p1][:, None] |
                     lut[1][p1][None, :]).astype(np.uint8).reshape(-1)
    return _CTX_TAB2


def _cost_tables(data: np.ndarray, seed, exact_lit: bool = False,
                 lit_table: bool = False):
    """Host-side cost tables from the seed parse (a few KB; avoids
    CostModel's per-position arrays -- the device computes those).

    lit_table: return the quantized (64, 256) context-model bits table
    itself (plus the (256, 256) ctx lookup) instead of a per-position
    cost array -- the v3 DP gathers per-position costs ON DEVICE, so
    only ~80 KB rides the tunnel instead of n bytes. Deliberately
    drops the UTF8-window blend: measured on the 16 MB mix it costs
    both size (+601 B) and a host pass, the exact 2nd-order context
    model alone prices literals better for the device parse."""
    from ..enc.optimal import QB as QBH, CMD_BASE_Q
    from ..format import context as ctx
    from ..format import prefix
    from ..enc import bitstream
    m, lens, dists, flags = seed

    n = len(data)
    # table statistics come from a bounded SAMPLE of the seed parse
    # (default 4 MB): entropy estimates converge long before that,
    # and the full-input pass was ~0.9 s of the device pipeline's
    # host prologue (mostly fresh-page faults on the n-length
    # coverage chain). exact_lit (the host/v1 path) still prices
    # per-position over the full input below.
    import os as _os0
    _cap = int(_os0.environ.get("BROTLI_TPU_COST_SAMPLE",
                                str(1 << 22)))
    if n > _cap:
        # replay stats keep whole matches only (truncating a
        # dict-flagged match would fabricate an unserializable word
        # length); literal coverage below clips instead, so a giant
        # match spanning the cap cannot masquerade as literals
        _k = (m + lens) <= _cap
        sm, sl = m[_k], lens[_k]
        sd, sf = dists[_k], flags[_k]
        cm_, cl_ = m[m < _cap], lens[m < _cap]
        sdata, sn = data[:_cap], _cap
    else:
        sm, sl, sd, sf = m, lens, dists, flags
        cm_, cl_ = m, lens
        sdata, sn = data, n
    # int32/int16 throughout: the int64 index chain here touched
    # ~400 MB of fresh pages and the first call per process paid
    # ~0.7 s of page faults (cold 0.93 s vs warm 0.16 s measured) --
    # this runs once per encode, so the cold cost IS the cost
    covered = np.zeros(sn + 1, np.int16)
    np.add.at(covered, np.minimum(cm_, sn), np.int16(1))
    np.add.at(covered, np.minimum(cm_ + cl_, sn), np.int16(-1))
    is_lit = np.cumsum(covered[:sn], dtype=np.int32) == 0
    lut = ctx.context_lut(2)
    lp = np.flatnonzero(is_lit).astype(np.int32)
    p1l = sdata[np.maximum(lp - 1, 0)].astype(np.int32)
    p2l = sdata[np.maximum(lp - 2, 0)].astype(np.int32)
    cidl = (lut[0][p1l] | lut[1][p2l]).astype(np.int32)
    hist = np.bincount((cidl << 8) | sdata[lp],
                       minlength=64 * 256)[:64 * 256].reshape(
                           64, 256) + 1
    bits = -np.log2(hist / hist.sum(axis=1, keepdims=True))

    # copy-code + distance symbol costs (mirrors CostModel's tables)
    class _CM:
        pass
    cm = _CM()
    ccode, _, _ = bitstream._encode_values(
        np.maximum(sl, 2), prefix.COPY_BASE, prefix.COPY_EXTRA)
    cc_hist = np.bincount(ccode, minlength=24).astype(np.float64) + 0.2
    cc_p = cc_hist / cc_hist.sum()
    ins_share = 3.0
    jh = None
    if len(sm) > 16:
        prev_end = np.concatenate([[0], (sm + sl)[:-1]])
        ins_lens = np.maximum(sm - prev_end, 0)
        icode, _, _ = bitstream._encode_values(
            ins_lens, prefix.INSERT_BASE, prefix.INSERT_EXTRA)
        syms = bitstream._combine_codes(icode, ccode,
                                        np.zeros(len(sm), bool))
        jh = np.bincount(syms, minlength=704).astype(np.float64)
        jp = jh / jh.sum()
        joint_avg = float(-(jp[jh > 0] * np.log2(jp[jh > 0])).sum())
        copy_avg = float(-(cc_p * np.log2(cc_p)).sum())
        import os as _os2
        _iss = float(_os2.environ.get("BROTLI_TPU_INS_SCALE", "1.0"))
        ins_share = max(joint_avg - copy_avg, 0.5) * _iss
    cc_bits = -np.log2(cc_p) + ins_share

    def copy_cost_q(ls):
        lc = np.searchsorted(prefix.COPY_BASE, np.maximum(ls, 2),
                             side="right") - 1
        return ((cc_bits[lc] + prefix.COPY_EXTRA[lc]) * QBH).astype(
            np.int64)
    cm.copy_cost_q = copy_cost_q
    # distance-symbol cost from the seed parse's ACTUAL emission (ring
    # codes included), matching the host CostModel: replay through
    # plan_commands so short codes 0-15 carry learned costs
    from ..enc.matcher import matches_to_commands
    if len(sm):
        cmds = matches_to_commands(sm, sl, sd, sf, 0, sn)
        plan, _ = bitstream.plan_commands(*cmds[:3], None, cmds[3])
        dsym = plan["dist_syms"][plan["has_dist"]]
        dh = np.bincount(dsym, minlength=64).astype(np.float64)[:64]
    else:
        dh = np.zeros(64, np.float64)
    dh += 0.2
    cm.dist_sym_bits = -np.log2(dh / dh.sum())
    # marginalize p2 exactly: ctx = lut0[p1] | lut1[p2], and lut1 takes
    # only a handful of values -- weight each by P(lut1[p2] | p1) over
    # adjacent byte pairs (sampled: the mix is stable)
    # sample must span the input's byte repertoire: a p1 value absent
    # from the sample would get all-zero weights -> zero literal cost
    # -> the DP re-literalizes whole regions (round-2 regression when
    # this briefly sampled 1MB of a text prefix)
    # mild literal surcharge: real emission pays tree quantization and
    # clustering losses the ideal entropy table does not see
    import os as _os
    _sur = float(_os.environ.get("BROTLI_TPU_LIT_SURCHARGE", "1.1"))
    if lit_table:
        litbits_q = np.clip(np.round(bits * _sur * QBH / 2), 0,
                            255).astype(np.uint8)  # (64, 256)
    elif not exact_lit:
        # marginalize p2 exactly: ctx = lut0[p1] | lut1[p2], and lut1
        # takes only a handful of values -- weight each by
        # P(lut1[p2] | p1) over adjacent byte pairs (sampled: the mix
        # is stable). Sample must span the input's byte repertoire: a
        # p1 value absent from the sample would get all-zero weights
        # -> zero literal cost -> the DP re-literalizes whole regions
        # (round-2 regression when this briefly sampled 1MB of text).
        samp = data[:1 << 22]
        l1v = lut[1][samp[:-1].astype(np.int64)]  # lut1 of p2 w/ p1
        p1v = samp[1:].astype(np.int64)
        vals = np.unique(lut[1])
        wt = np.zeros((256, len(vals)), np.float64)
        for j, v in enumerate(vals):
            wt[:, j] = np.bincount(p1v[l1v == v], minlength=256)
        unseen = wt.sum(axis=1) == 0
        wt[unseen] = 1.0  # uniform prior outside the sample
        wt /= np.maximum(wt.sum(axis=1, keepdims=True), 1)
        tab = np.zeros((256, 256), np.float64)
        l0 = lut[0][np.arange(256)].astype(np.int64)
        for j, v in enumerate(vals):
            tab += wt[:, j:j + 1] * bits[l0 | v]
    if exact_lit and not lit_table:
        # exact per-position literal cost (full 2nd-order context
        # model + the windowed UTF8 model, like the host DP) -- the v3
        # path ships it per segment instead of a marginalized table.
        # Native fast path: one O(n) C pass (the numpy window model
        # measured ~25 s on 16 MB).
        use_u = _os.environ.get("BROTLI_TPU_LIT_UTF8", "1") == "1"
        litbits_q = None
        try:
            from .. import native
            litbits_q = native.lit_cost(
                np.ascontiguousarray(data).tobytes(), m, lens,
                surcharge=_sur, use_utf8=use_u)
        except (ImportError, OSError, ValueError,
                subprocess.CalledProcessError):
            pass
        if litbits_q is None:
            cid_all = (lut[0][np.concatenate([[0], data[:-1]]).astype(
                np.int64)] | lut[1][np.concatenate(
                    [[0, 0], data[:-2]]).astype(np.int64)])
            litpos = bits[cid_all, data.astype(np.int64)]
            from ..enc.literal_cost import (estimate_literal_bits,
                                            is_mostly_utf8)
            if use_u and is_mostly_utf8(data):
                u = estimate_literal_bits(np.asarray(data))
                litpos = (litpos + u) / 2
            litbits_q = np.clip(np.round(litpos * _sur * QBH / 2), 0,
                                255).astype(np.uint8)
    elif not lit_table:
        litbits_q = np.minimum(tab * _sur * QBH, 24 * QBH).astype(
            np.int32)

    lens_all = np.arange(W)
    _cmdq = int(float(_os.environ.get("BROTLI_TPU_CMD_EXTRA", "1.0")) *
                CMD_BASE_Q)
    copyq = (cm.copy_cost_q(np.maximum(lens_all, 2)) +
             _cmdq).astype(np.int32)
    copyq[:2] = 1 << 28
    dist_sym_bits_q = (cm.dist_sym_bits * QBH).astype(np.int32)
    if lit_table:
        # implicit-dist0 cell prices by landed length (the host DP's
        # oc->icell role, btpu_enc.c): commands whose distance rides
        # the joint cell pay NO distance symbol at all -- the in-scan
        # ring edge min-prices against this row
        icell_q = np.full(W, 1 << 28, np.int32)
        lc_all = np.searchsorted(prefix.COPY_BASE,
                                 np.maximum(lens_all, 2),
                                 side="right") - 1
        if jh is not None and jh.sum() > 16:
            jtot = jh.sum()
            for c in range(W):
                cc = int(lc_all[c])
                if cc > 15:
                    continue
                f = 0.2 + sum(jh[(64 if cc >= 8 else 0) + (ic << 3) +
                                 (cc & 7)] for ic in range(8))
                icell_q[c] = int((-np.log2(f / jtot) +
                                  prefix.COPY_EXTRA[cc]) * QBH)
        else:
            icell_q = (copyq + dist_sym_bits_q[0]).astype(np.int32)
        icell_q[:2] = 1 << 28
        return litbits_q, copyq, dist_sym_bits_q, _ctx_tab2(), icell_q
    return litbits_q, copyq, dist_sym_bits_q


def _seed_parse(arr: np.ndarray, max_distance: int, base: int):
    """Greedy/lazy seed parse for the DP (quality-5 grade). Native C
    matcher when the window maps to a standard lgwin (native assumes
    base == 0 and maxback == 2^lgwin - 16); device sort-carry matcher
    otherwise."""
    from ..format import constants as C
    if base == 0:
        lgwin = int(max_distance + 16).bit_length() - 1
        if (10 <= lgwin <= 24 and
                C.max_backward_distance(lgwin) == max_distance):
            try:
                from .. import native
                import os as _os3
                # q9-grade seed: -366 B AND faster than q7 on the
                # 16 MB mix (better continuation edges outweigh the
                # slower host pass; re-measured after the device-lit
                # tables landed). q10 routes the greedy walker through
                # the DP hasher config and is pathological -- rejected.
                _sq = int(_os3.environ.get("BROTLI_TPU_SEED_Q", "9"))
                p, l, d = native.find_matches(
                    np.ascontiguousarray(arr).tobytes(), _sq, lgwin)
                z = np.zeros(len(p), np.int64)
                return (p.astype(np.int64), l.astype(np.int64),
                        d.astype(np.int64), z)
            except (ImportError, OSError, ValueError,
                    subprocess.CalledProcessError):
                pass
    from .matcher_jax import find_matches_jax
    return find_matches_jax(arr, max_distance, quality=5, base=base,
                            use_dict=False)


def find_matches_optimal_jax(data: np.ndarray, max_distance: int,
                             quality: int = 11, base: int = 0,
                             iterations: int = None, on_block=None,
                             mb_size: int = None):
    """Device q10/q11 parse: greedy device seed -> host cost tables ->
    device DP per segment (iterated: the DP's own parse refines the
    cost model and contributes seed edges) -> coalesce + dictionary
    post-pass.

    Streaming mode: with `on_block(mb_lo, mb_hi, matches)` set (and
    `mb_size`), finished metablock spans emit as soon as their
    segments collect -- the caller serializes them while later
    segments are still computing on device. Returns None in that
    mode."""
    from ..enc.optimal import _coalesce
    from ..enc.matcher import add_dictionary_matches

    if iterations is None:
        # a second cost-refinement pass measured neutral-to-worse on
        # this corpus family BEFORE the dict-edge/atomic-slot work;
        # BROTLI_TPU_DP_ITERS re-tests it (v1 streaming requires 1;
        # v3 emits spans after the final collect, so it iterates)
        iterations = int(_os_mod.environ.get("BROTLI_TPU_DP_ITERS",
                                             "1"))
    mode = _dp_mode()
    if on_block is not None and mode != "v3":
        iterations = 1
    from ..utils import trace
    n = len(data)
    arr = np.asarray(data)
    # the input ships as ONE lazy H2D (segments are on-device slices).
    # Lazy is deliberate: this host has ONE core, so "overlapping" the
    # push with the host prefix (an eager-poke dispatch, or a
    # blocking-force thread) just steals the core from the seed/table
    # passes -- measured 0.35 s -> 6.2 s cost-tables under a
    # background push. Left lazy, the client pushes the bytes inside
    # the first blocking collect, exactly when the host is idle; the
    # backend then executes eagerly (probed: a fetch issued after a
    # 1.5 s host sleep takes 0.11 s vs 0.56 s issued immediately).
    dev_big = upload_input(arr, n) if mode == "v3" else None
    # fast first segment: segment 1's seeds can only reference its own
    # window, so a window-local seed parse + 4MB-sampled cost tables
    # are enough to DISPATCH it immediately -- the full-input seed and
    # dictionary probes then run in segment 1's device-compute shadow
    # (the chip executes segments serially, so the old sequencing left
    # it idle for the whole ~0.7s host prologue)
    handles0 = None
    dict1 = None
    fast_first = (mode == "v3" and n > SEG_V3 and base == 0 and
                  iterations == 1 and
                  _os_mod.environ.get("BROTLI_TPU_FAST_FIRST",
                                      "1") == "1")
    if fast_first:
        with trace.stage("dp.seed1"):
            seed1 = _seed_parse(arr[:SEG_V3], max_distance, base)
        with trace.stage("dp.cost-tables1"):
            tables1 = _cost_tables(arr[:SEG_V3], seed1, lit_table=True)
        dict1 = _dict_probe_global(arr[:SEG_V3], [seed1], base,
                                   max_distance)

        class _Done:
            def __init__(self, v):
                self.v = v

            def result(self):
                return self.v

        with trace.stage("dp.device"):
            handles0, _ = _dispatch_v3(
                arr, SEG_V3, max_distance, tables1, [seed1], base,
                dict_future=_Done(dict1), dev_big=dev_big)
    # seed: greedy/lazy parse, no dictionary probing (the post-pass
    # below probes the final parse's gaps once). The native C matcher
    # runs it on host -- the chip stays free for the DP kernels and the
    # seed overlaps their dispatch; device sort-carry is the fallback.
    with trace.stage("dp.seed"):
        seed = _seed_parse(arr, max_distance, base)
    m = lens = dists = flags = None
    dict_future = None
    for it in range(iterations):
        prev = seed if it == 0 else (m, lens, dists, flags)
        with trace.stage("dp.cost-tables"):
            tables = _cost_tables(arr, prev, lit_table=(mode == "v3"))
        # later iterations seed with the union of the greedy parse and
        # the previous DP parse
        seeds_list = [seed] if it == 0 else [seed, prev]
        if mode == "v3":
            with trace.stage("dp.device"):
                handles, dict_table = _dispatch_v3(
                    arr, n, max_distance, tables, seeds_list, base,
                    dict_future=dict_future if it == 0 else None,
                    dev_big=dev_big,
                    lo_start=SEG_V3 if (handles0 and it == 0) else 0)
                if handles0 and it == 0:
                    # merge segment 1 (dispatched early) + its dict
                    # probe's edges (flag recovery at collect needs
                    # every position either probe selected)
                    handles = handles0 + handles
                    dp0, dy0, dw0 = dict1
                    dpos_g, dwlen_g = dict_table
                    mp = np.concatenate([dp0.astype(np.int64), dpos_g])
                    mw = np.concatenate([dw0, dwlen_g])
                    order = np.argsort(mp, kind="stable")
                    mp, mw = mp[order], mw[order]
                    if len(mp):
                        keep = np.concatenate([[True],
                                               np.diff(mp) != 0])
                        mp, mw = mp[keep], mw[keep]
                    dict_table = (mp, mw)
                if (on_block is not None and it == iterations - 1
                        and SEG_V3 % mb_size == 0):
                    # final iteration streams: emit the first half's
                    # spans while the backend computes the rest.
                    # _stream_v3 groups cover whole metablocks ONLY
                    # when mb_size divides SEG_V3 (lgblock <= 22);
                    # otherwise fall through to the full collect +
                    # single _emit_spans(0, n) below, which handles
                    # any mb_size (overlapping-span regression:
                    # lgblock 23 emitted the tail metablock twice).
                    _stream_v3(arr, handles, dict_table, n, mb_size,
                               max_distance, base, on_block)
                    return None
                all_m, all_l, all_d, all_f = _collect_v3(
                    handles, dict_table, max_distance, base)
        else:
            dev_tables = [jnp.asarray(t) for t in tables]
            handles = []
            for lo in range(0, n, SEG):
                hi = min(lo + SEG, n)
                chunk = arr[lo:hi]
                b = _bucket(len(chunk))
                padded = np.zeros(b, np.uint8)
                padded[:len(chunk)] = chunk
                npos = max(len(chunk) - 3, 0)
                spos, slen, sdist = _seg_seed_edges(
                    seeds_list, lo, hi, SEG // 32)
                # async dispatch: H2D/compute/D2H pipeline across segs
                handles.append((lo, dp_parse_block(
                    jnp.asarray(padded), jnp.int32(npos),
                    jnp.int32(max_distance), *dev_tables,
                    jnp.asarray(spos), jnp.asarray(slen),
                    jnp.asarray(sdist))))

            if on_block is not None:
                assert iterations == 1 and mb_size is not None
                _stream_blocks(arr, handles, n, mb_size, max_distance,
                               base, on_block)
                return None
            all_m, all_l, all_d, all_f = [], [], [], []
            for lo, (count, out) in handles:
                mm, ml, md = _collect_segment(lo, count, out)
                if len(mm):
                    all_m.append(mm)
                    all_l.append(ml)
                    all_d.append(md)
                    all_f.append(np.zeros(len(mm), np.int64))
        if not all_m:
            z = np.zeros(0, np.int64)
            if on_block is not None:
                _emit_spans(arr, z, z, z, z, n, mb_size, max_distance,
                            base, on_block)
                return None
            return z, z, z, z
        m = np.concatenate(all_m)
        lens = np.concatenate(all_l)
        dists = np.concatenate(all_d)
        flags = np.concatenate(all_f)
        from ..enc.optimal import bridge_matches
        m, lens, dists, flags = bridge_matches(arr, *_coalesce(
            m, lens, dists, flags))
    if on_block is not None:  # v3 streaming: emit spans after collect
        _emit_spans(arr, m, lens, dists, flags, n, mb_size,
                    max_distance, base, on_block)
        return None
    with trace.stage("dp.dict-post"):
        return add_dictionary_matches(arr, m, lens, dists, flags,
                                      max_distance, base)


def find_matches_optimal_sharded(arr, bounds, max_distance,
                                 quality=11, halo_cap=None):
    """Mesh-parallel q10/11 optimal parse: every device DPs its own
    shard's segments through ONE compiled shard_map program (the
    multi-chip zopfli tier; SURVEY 2.9.4 + the reference's
    stream-offset stitching affordance, encode.h:231-246).

    Per shard (host, threaded): greedy seed parse -> cost tables ->
    static-dict probe -> segment prep, with up to `halo_cap` bytes of
    preceding input as candidate window history, so matches reach
    across shard seams. Per round k, every shard's k-th segment runs
    data-parallel over the mesh (one jit / one D2H per round); the
    usual collect/coalesce/dict post-pass then runs per shard.

    Returns a list of per-shard (m, lens, dists, flags) with m
    RELATIVE to the shard's [lo, hi) span."""
    import concurrent.futures as futures
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from ..enc.optimal import _coalesce, bridge_matches
    from ..enc.matcher import add_dictionary_matches
    from ..utils import trace
    from ..utils.jaxcfg import backend_or_cpu

    n_shards = len(bounds) - 1
    devs = jax.devices()
    if len(devs) < n_shards:
        raise ValueError(f"{n_shards} shards > {len(devs)} devices")
    if halo_cap is None:
        halo_cap = SEG_V3
    interp = backend_or_cpu() != "tpu"

    def prep_shard(si):
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        h = min(int(max_distance), lo, int(halo_cap))
        buf = np.ascontiguousarray(arr[lo - h:hi])
        base = lo - h
        with trace.stage("dp.seed"):
            seed = _seed_parse(buf, max_distance, base)
        with trace.stage("dp.cost-tables"):
            tables = _cost_tables(buf, seed, lit_table=True)
        dict_g = _dict_probe_global(buf, [seed], base, max_distance)
        return dict(lo=lo, hi=hi, h=h, buf=buf, base=base, seed=seed,
                    tables=tables, dict_g=dict_g)

    with futures.ThreadPoolExecutor(max_workers=min(n_shards, 8)) as ex:
        shards = list(ex.map(prep_shard, range(n_shards)))

    # one common bucket -> one compiled program for every (shard, round)
    b = max(_bucket_v3(min(len(s["buf"]), SEG_V3)) for s in shards)
    capm = b // CAPM_DIV
    rounds = max((len(s["buf"]) + SEG_V3 - 1) // SEG_V3 for s in shards)
    mesh = Mesh(np.array(devs[:n_shards]), axis_names=("data",))

    def step(padded, npos, btab, ctab, cq, dq, spos, slen, sdist,
             dloc, dval, segb):
        packed, full = _dp_v3_impl(
            padded[0], npos[0], jnp.int32(max_distance), btab[0],
            ctab[0], cq[0], dq[0], spos[0], slen[0], sdist[0],
            dloc[0], dval[0], segb[0], capm=capm, interpret=interp)
        return packed[None], full[None]

    jstep = jax.jit(shard_map(
        step, mesh=mesh, in_specs=(P("data"),) * 12,
        out_specs=(P("data"), P("data")), check_vma=False))

    handles = [[] for _ in range(n_shards)]
    keys = ("padded", "npos", "btab", "ctab", "cq", "dq", "spos",
            "slen", "sdist", "dloc", "dval", "segb")
    for k in range(rounds):
        batch = {key: [] for key in keys}
        seg_los = []
        for s in shards:
            nbuf = len(s["buf"])
            lo_k = k * SEG_V3
            hi_k = min(lo_k + SEG_V3, nbuf)
            seg_los.append(lo_k if lo_k < nbuf else -1)
            bits_tab, copyq, distq, ctx_tab, icellq = s["tables"]
            distq = np.concatenate([distq, icellq]).astype(np.int32)
            cq_row = np.zeros((1, 128), np.int32)
            cq_row[0, :W] = copyq[:W]
            if lo_k >= nbuf:  # shard exhausted: dummy segment
                padded = np.zeros(b, np.uint8)
                npos = 0
                spos = np.zeros(b // 128, np.int32)
                slen, sdist = spos, spos
                dloc = np.zeros(b // 64, np.int32)
                dval = dloc
            else:
                dpos_g, dpay_g, _ = s["dict_g"]
                with trace.stage("dp.seg-prep"):
                    padded = np.zeros(b, np.uint8)
                    padded[:hi_k - lo_k] = s["buf"][lo_k:hi_k]
                    (npos, spos, slen, sdist, dloc,
                     dval) = _prep_segment_v3(
                        s["buf"], [s["seed"]], dpos_g, dpay_g,
                        lo_k, hi_k, b)
            for key, v in (("padded", padded), ("npos", np.int32(npos)),
                           ("btab",
                            bits_tab.astype(np.int32).reshape(-1)),
                           ("ctab", ctx_tab.astype(np.int32)),
                           ("cq", cq_row),
                           ("dq", np.asarray(distq)), ("spos", spos),
                           ("slen", slen), ("sdist", sdist),
                           ("dloc", dloc), ("dval", dval),
                           ("segb", np.int32(lo_k + s["base"]))):
                batch[key].append(v)
        with trace.stage("dp.mesh-dispatch"):
            packed, full = jstep(*(jnp.asarray(np.stack(batch[key]))
                                   for key in keys))
        with trace.stage("dp.fetch"):
            packed_np = np.asarray(packed)
        for si in range(n_shards):
            if seg_los[si] < 0:
                continue
            handles[si].append((seg_los[si], capm, packed_np[si],
                                full[si]))

    out = []
    for si, s in enumerate(shards):
        all_m, all_l, all_d, all_f = _collect_v3(
            handles[si], (s["dict_g"][0].astype(np.int64),
                          s["dict_g"][2]), max_distance, s["base"])
        if not all_m:
            z = np.zeros(0, np.int64)
            out.append((z, z, z, z))
            continue
        m = np.concatenate(all_m)
        lens = np.concatenate(all_l)
        dists = np.concatenate(all_d)
        flags = np.concatenate(all_f)
        m, lens, dists, flags = bridge_matches(
            s["buf"], *_coalesce(m, lens, dists, flags))
        with trace.stage("dp.dict-post"):
            m, lens, dists, flags = add_dictionary_matches(
                s["buf"], m, lens, dists, flags, max_distance,
                s["base"])
        keep = m >= s["h"]
        out.append((m[keep] - s["h"], lens[keep], dists[keep],
                    flags[keep]))
    return out


def _collect_segment(lo, count, out):
    """Read back one DP segment's compacted matches (blocking)."""
    cnt = int(np.asarray(count))
    z = np.zeros(0, np.int64)
    if cnt == 0:
        return z, z, z
    k = 1 << max(int(np.ceil(np.log2(cnt))), 10)
    k = min(k, out.shape[1])
    host = np.asarray(out[:, :k])
    mm = host[0, :cnt].astype(np.int64) + lo
    pay = host[1, :cnt]
    ml = (pay >> 25).astype(np.int64)
    md = (pay & np.uint32((1 << 25) - 1)).astype(np.int64)
    return mm, ml, md


def _stream_blocks(arr, handles, n, mb_size, max_distance, base,
                   on_block):
    """Collect segments in order, emitting each finished metablock span
    to `on_block` so serialization overlaps later segments' device
    compute. Matches crossing a span boundary split here (metablock
    serialization splits them anyway); the dictionary post-pass runs
    per span."""
    from ..enc.optimal import _coalesce, bridge_matches
    from ..enc.matcher import add_dictionary_matches, split_matches_at

    z = np.zeros(0, np.int64)
    pm, pl, pd = z, z, z    # pending matches (coalesced)
    emitted = 0
    covered = 0
    for lo, (count, out) in handles:
        mm, ml, md = _collect_segment(lo, count, out)
        covered = min(lo + SEG, n)
        if len(mm):
            pm = np.concatenate([pm, mm])
            pl = np.concatenate([pl, ml])
            pd = np.concatenate([pd, md])
            pm, pl, pd, _ = bridge_matches(arr, *_coalesce(
                pm, pl, pd, np.zeros(len(pm), np.int64)))
        while emitted < n:
            mb_hi = min(emitted + mb_size, n)
            if covered < mb_hi:
                break
            pm, pl, pd, _pf = split_matches_at(
                pm, pl, pd, np.zeros(len(pm), np.int64), [mb_hi, n + 1])
            take = pm < mb_hi
            bm, bl, bd = pm[take], pl[take], pd[take]
            pm, pl, pd = pm[~take], pl[~take], pd[~take]
            bf = np.zeros(len(bm), np.int64)
            bm, bl, bd, bf = add_dictionary_matches(
                arr[:mb_hi], bm, bl, bd, bf, max_distance, base,
                active_from=emitted)
            on_block(emitted, mb_hi, (bm, bl, bd, bf))
            emitted = mb_hi


def _stream_v3(arr, handles, dict_table, n, mb_size, max_distance,
               base, on_block):
    """Chunked v3 streaming collect: fetch the first half of the
    segments and emit their spans (native serialization on the host)
    while the backend still computes the second half -- the only real
    overlap available on a 1-core host: serialize is GIL-releasing C
    and the producer's next fetch blocks on DEVICE compute. Segment
    boundaries are hard parse boundaries and mb_size divides SEG_V3,
    so each group covers whole metablocks."""
    from ..enc.optimal import _coalesce, bridge_matches

    half = (len(handles) + 1) // 2
    z = np.zeros(0, np.int64)
    for group in (handles[:half], handles[half:]):
        if not group:
            continue
        glo = group[0][0]
        ghi = min(group[-1][0] + SEG_V3, n)
        am, al, ad, af = _collect_v3(group, dict_table, max_distance,
                                     base)
        if am:
            gm, gl, gd, gf = (np.concatenate(am), np.concatenate(al),
                              np.concatenate(ad), np.concatenate(af))
            gm, gl, gd, gf = bridge_matches(arr, *_coalesce(gm, gl, gd,
                                                            gf))
        else:
            gm = gl = gd = gf = z
        _emit_spans(arr, gm, gl, gd, gf, n, mb_size, max_distance,
                    base, on_block, lo=glo, hi=ghi)


def _emit_spans(arr, m, lens, dists, flags, n, mb_size, max_distance,
                base, on_block, lo=0, hi=None):
    """Emit the finished parse as metablock spans (v3 streaming tail;
    [lo, hi) restricts to one collected group's span range)."""
    from ..enc.matcher import add_dictionary_matches, split_matches_at

    from ..utils import trace
    pm, pl, pd, pf = m, lens, dists, flags
    emitted = lo
    if hi is None:
        hi = n
    while emitted < hi:
        mb_hi = min(emitted + mb_size, n)
        with trace.stage("dp.span-split"):
            pm, pl, pd, pf = split_matches_at(
                pm, pl, pd, pf, [mb_hi, n + 1])
            take = pm < mb_hi
            bm, bl, bd, bf = pm[take], pl[take], pd[take], pf[take]
            pm, pl, pd, pf = (pm[~take], pl[~take], pd[~take],
                              pf[~take])
        with trace.stage("dp.dict-post"):
            bm, bl, bd, bf = add_dictionary_matches(
                arr[:mb_hi], bm, bl, bd, bf, max_distance, base,
                active_from=emitted)
        on_block(emitted, mb_hi, (bm, bl, bd, bf))
        emitted = mb_hi
