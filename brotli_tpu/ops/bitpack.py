"""Device-side metablock serialization: symbol planning + bit packing
as XLA array programs (SURVEY section 7 step 3, the "exact bit packing"
hard part; reference role: c/enc/brotli_bit_stream.c:833-943
BlockEncoder symbol streams + write_bits.h).

The mesh pipeline (parallel/shard.py) used to funnel every compressed
bit through one host core; here each shard's payload becomes bits
on its own device:

  * plan: the command stream resolves to (value, nbits) fields in
    decode order -- insert/copy codes by table searchsorted, the
    4-slot distance ring simulated exactly with the collapse trick
    (the push sequence is the copy-distance sequence with consecutive
    duplicates collapsed, so every short code is a vector op), and
    literal bytes scattered between their commands;
  * trees stay on host (histograms are a few KB: package-merge +
    canonical codes + the ~100-byte header); code tables upload as
    (alphabet,) arrays and symbols gather through them;
  * pack: exclusive scan of nbits -> bit offsets; each field ORs into
    (at most) two u32 words via scatter-add (bit-disjoint by
    construction, so add == or). The payload starts at the host
    header's bit offset mod 8, so the host splices by ORing one byte.

The packed layout is bit-identical to the host trivial store
(store_metablock at quality 1) -- tested against it.
"""

import functools

import jax
import jax.numpy as jnp

from ..utils.jaxcfg import ensure_cache

ensure_cache()
import numpy as np

from ..format import constants as C
from ..format import prefix

MAXW_BITS = 25  # packed fields are < 2^25 (max: 24-bit dist extra)


# ---------------------------------------------------------------------
# core bit packer
# ---------------------------------------------------------------------

def _pack_bits_math(values, nbits, bit0, cap_words):
    """(values, nbits) fields -> u32 words ORed at running bit
    offsets starting at bit0. Returns (words, total_bits)."""
    nb = nbits.astype(jnp.uint32)
    offs = bit0 + jnp.cumsum(nb) - nb  # exclusive scan
    total = bit0 + jnp.sum(nb)
    v = values.astype(jnp.uint32) & ((jnp.uint32(1) << nb) - 1)
    idx = (offs >> 5).astype(jnp.int32)
    sh = offs & 31
    lo = jnp.where(nb > 0, v << sh, 0)
    # bits spilling into the next word (sh + nb > 32); shift-by->=32 is
    # undefined, so route through a 16-step split when sh is large
    hi = jnp.where((sh > 0) & (nb > 0),
                   (v >> (31 - sh)) >> 1, jnp.uint32(0))
    words = jnp.zeros(cap_words, jnp.uint32)
    words = words.at[jnp.clip(idx, 0, cap_words - 1)].add(lo)
    words = words.at[jnp.clip(idx + 1, 0, cap_words - 1)].add(hi)
    return words, total


# ---------------------------------------------------------------------
# device plan: commands -> (value, nbits) stream (trivial store)
# ---------------------------------------------------------------------

def _searchsorted_small(table, vals):
    """searchsorted(table, vals, 'right') - 1 for a tiny static table
    (unrolled compares; no gather)."""
    code = jnp.zeros(vals.shape, jnp.int32)
    for i in range(1, len(table)):
        code = code + (vals >= int(table[i])).astype(jnp.int32)
    return code


def _encode_values_jnp(vals, base, extra):
    code = _searchsorted_small(base, vals)
    b = jnp.asarray(np.asarray(base, np.int32))
    e = jnp.asarray(np.asarray(extra, np.int32))
    return code, vals - b[code], e[code]


def _combine_codes_jnp(icode, ccode, implicit):
    low = ((icode & 7) << 3) | (ccode & 7)
    cell = jnp.asarray(np.array([[128, 192, 384], [256, 320, 512],
                                 [448, 576, 640]], np.int32))
    start = cell[icode >> 3, ccode >> 3]
    imp_start = jnp.where((ccode >> 3) == 0, 0, 64)
    return jnp.where(implicit, imp_start + low, start + low)


def _plan_math(data, m, lens, dists, flags, ncmd_valid, ring_in, mlen):
    """Device port of bitstream.plan_commands + literal/field
    interleaving for ONE trivial metablock over data[0:mlen].

    m/lens/dists/flags: padded command arrays (matches only, sorted;
    slots >= ncmd_valid are dead). Returns per-slot symbol streams in
    decode order plus histograms. The final insert-only command is
    synthesized here from the gap after the last match."""
    ncap = m.shape[0]
    n = data.shape[0]
    iota = jnp.arange(ncap, dtype=jnp.int32)
    valid = iota < ncmd_valid

    # inserts = gaps between consecutive matches; final insert-only
    # command covers the tail (always present as slot ncmd_valid)
    prev_end = jnp.where(iota == 0, 0,
                         jnp.roll(m + lens, 1).astype(jnp.int32))
    prev_end = jnp.where(valid, prev_end, 0)
    ins = jnp.where(valid, m - prev_end, 0)
    # tail insert: emitted at slot ncmd_valid
    last_end = jnp.max(jnp.where(valid, m + lens, 0))
    tail_ins = mlen - last_end
    is_tail = iota == ncmd_valid
    has_tail = tail_ins > 0
    active = valid | (is_tail & has_tail)
    ins = jnp.where(is_tail, jnp.where(has_tail, tail_ins, 0), ins)
    cpy = jnp.where(valid, lens, 0)
    dist = jnp.where(valid, dists, 0)
    fl = jnp.where(valid, flags, 0)
    final_insert = is_tail

    icode, iextra, ibits = _encode_values_jnp(
        ins, prefix.INSERT_BASE, prefix.INSERT_EXTRA)
    builtin_gen = fl >= 2000
    custom = (fl >= 1000) & ~builtin_gen
    cut = jnp.where(custom | builtin_gen, 0, jnp.maximum(fl - 2, 0))
    eff_cpy = jnp.where(builtin_gen, fl - 2000,
                        jnp.where(custom, fl - 1000, cpy + cut))
    ccode, cextra, cbits = _encode_values_jnp(
        jnp.where(final_insert, 2, eff_cpy), prefix.COPY_BASE,
        prefix.COPY_EXTRA)
    is_dict = fl >= 2

    # exact ring simulation (collapse trick): pushes = copy distances
    # with consecutive duplicates collapsed
    is_copy = valid & ~is_dict
    cd = jnp.where(is_copy, dist, 0)
    # top_before per copy: previous copy's distance (or ring[0])
    copy_rank = jnp.cumsum(is_copy.astype(jnp.int32)) - is_copy
    # previous copy distance via segmented fill
    carry = jax.lax.associative_scan(
        lambda a, b: jnp.where(b > 0, b, a),
        jnp.where(is_copy, cd, 0))
    prev_copy_d = jnp.concatenate(
        [jnp.array([0], carry.dtype), carry[:-1]])
    top_before = jnp.where(copy_rank == 0, ring_in[0], prev_copy_d)
    newpush = is_copy & (dist != top_before)
    push_rank = jnp.cumsum(newpush.astype(jnp.int32))  # inclusive
    cnt_before = 4 + push_rank - newpush
    # pv: oldest..newest pushed values, indices 0..3 = ring reversed
    pv = jnp.zeros(ncap + 5, jnp.int32)
    pv = pv.at[0].set(ring_in[3]).at[1].set(ring_in[2]) \
           .at[2].set(ring_in[1]).at[3].set(ring_in[0])
    pidx = jnp.where(newpush, 3 + push_rank, ncap + 4)
    pv = pv.at[pidx].set(jnp.where(newpush, dist, 0).astype(jnp.int32))
    slot0 = pv[cnt_before - 1]
    slot1 = pv[cnt_before - 2]
    slot2 = pv[cnt_before - 3]
    slot3 = pv[cnt_before - 4]
    npush = jnp.max(push_rank)
    new_ring = jnp.stack([pv[3 + npush], pv[2 + npush],
                          pv[jnp.maximum(1 + npush, 0)],
                          pv[jnp.maximum(npush, 0)]])

    is_reuse = is_copy & (dist == slot0)
    implicit = is_reuse & (icode < 8) & (ccode < 16)
    d0 = dist - slot0
    d1 = dist - slot1
    near0 = jnp.where(d0 < 0, 4 + 2 * (-d0 - 1), 5 + 2 * (d0 - 1))
    near1 = jnp.where(d1 < 0, 10 + 2 * (-d1 - 1), 11 + 2 * (d1 - 1))
    eligible = is_copy & ~is_reuse
    short = jnp.full(ncap, -1, jnp.int32)
    for cond, code in [
            (dist == slot1, jnp.full(ncap, 1, jnp.int32)),
            (dist == slot2, jnp.full(ncap, 2, jnp.int32)),
            (dist == slot3, jnp.full(ncap, 3, jnp.int32)),
            ((jnp.abs(d0) <= 3) & (d0 != 0), near0),
            ((jnp.abs(d1) <= 3) & (d1 != 0), near1)]:
        pick = eligible & (short < 0) & cond
        short = jnp.where(pick, code, short)
    near = short >= 0
    # explicit new distances (npostfix = ndirect = 0)
    expl = (active & ~final_insert) & ~is_reuse & ~near
    dd = jnp.maximum(dist, 1) - 1
    v4 = (dd >> 0) + 4  # hcode + 4 with npostfix 0, ndirect 0
    nbits_d = jnp.maximum(
        32 - jax.lax.clz((v4 >> 2) | 1), 1)
    rest = dd - ((jnp.int32(2) << nbits_d) - 4)
    half = rest >> nbits_d
    extra_d = rest - (half << nbits_d)
    dcode_expl = 16 + (((nbits_d - 1) << 1) | half)
    dcode = jnp.where(near, short,
                      jnp.where(expl, dcode_expl, 0))
    dextra = jnp.where(expl, extra_d, 0)
    dbits = jnp.where(expl, nbits_d, 0)
    has_dist = active & ~final_insert & ~implicit

    imp_or_tail = implicit | (final_insert & (icode < 8))
    cmd_syms = _combine_codes_jnp(icode, ccode, imp_or_tail)
    cmd_syms = jnp.where(active, cmd_syms, 0)

    # literal positions: bytes outside every match span
    pos_i = jnp.arange(n, dtype=jnp.int32)
    cov = jnp.zeros(n + 1, jnp.int32)
    mm = jnp.clip(m, 0, n)
    cov = cov.at[jnp.where(valid, mm, n)].add(1)
    cov = cov.at[jnp.where(valid, jnp.clip(m + lens, 0, n), n)].add(-1)
    inside = jnp.cumsum(cov[:n]) > 0
    is_lit = (~inside) & (pos_i < mlen)
    lit_rank = jnp.cumsum(is_lit.astype(jnp.int32)) - is_lit
    # command index of each literal: literals before match k belong to
    # command k; tail literals to the final command
    cmd_of_lit = jnp.searchsorted(
        jnp.where(valid, m, jnp.int32(0x7FFFFFFF)), pos_i,
        side="right").astype(jnp.int32)

    # interleave: per command 5 slots + its literals.
    # slot base of command k = 5*k + (global literals before it), so a
    # literal with global rank r under command k lands at 5*k + 3 + r
    # (the per-command offsets cancel). Active slot indices are unique
    # by construction; inactive lanes write 0/0 to a sacrificial slot.
    lit_before = jnp.cumsum(
        jnp.where(active, ins, 0)) - jnp.where(active, ins, 0)
    rec_start = 5 * iota + lit_before
    total_slots = 5 * ncap + n
    vals = jnp.zeros(total_slots, jnp.int32)
    nbits = jnp.zeros(total_slots, jnp.int32)
    dead = total_slots - 1  # sacrificial slot (nbits stays 0)

    def sat(varr, barr, slot, cond, v, b):
        i = jnp.where(cond, slot, dead)
        return (varr.at[i].set(jnp.where(cond, v, 0)),
                barr.at[i].set(jnp.where(cond, b, 0)))

    # markers in nbits: -1 = tree symbol (cmd if val < 4096 else
    # dist sym - 4096), -2 = literal byte; >= 0 = raw extra bits
    vals, nbits = sat(vals, nbits, rec_start, active, cmd_syms, -1)
    vals, nbits = sat(vals, nbits, rec_start + 1, active, iextra,
                      ibits)
    cpy_v = jnp.where(final_insert, 0, cextra)
    cpy_b = jnp.where(final_insert, 0, cbits)
    vals, nbits = sat(vals, nbits, rec_start + 2, active, cpy_v, cpy_b)
    dslot = rec_start + 3 + jnp.where(active, ins, 0)
    vals, nbits = sat(vals, nbits, dslot, has_dist, dcode + 4096, -1)
    vals, nbits = sat(vals, nbits, dslot + 1, has_dist, dextra, dbits)
    lit_slot = 5 * jnp.clip(cmd_of_lit, 0, ncap - 1) + 3 + lit_rank
    vals, nbits = sat(vals, nbits, lit_slot, is_lit,
                      data.astype(jnp.int32), -2)
    v2, b2 = vals, nbits

    # histograms
    hist_cmd = jnp.zeros(C.NUM_COMMAND_SYMBOLS, jnp.int32).at[
        jnp.where(active, cmd_syms, 0)].add(
        jnp.where(active, 1, 0))
    hist_dist = jnp.zeros(64, jnp.int32).at[
        jnp.where(has_dist, dcode, 0)].add(jnp.where(has_dist, 1, 0))
    hist_lit = jnp.zeros(256, jnp.int32).at[
        jnp.where(is_lit, data.astype(jnp.int32), 0)].add(
        jnp.where(is_lit, 1, 0))
    return v2, b2, hist_lit, hist_cmd, hist_dist, new_ring


@functools.partial(jax.jit, static_argnames=("cap_words",))
def plan_kernel(data, m, lens, dists, flags, ncmd_valid, ring_in,
                mlen, *, cap_words):
    """Stage 1: plan symbols + histograms (one dispatch)."""
    return _plan_math(data, m, lens, dists, flags, ncmd_valid,
                      ring_in, mlen)


@functools.partial(jax.jit, static_argnames=("cap_words",))
def pack_kernel(vals, markers, lit_code, lit_len, cmd_code, cmd_len,
                dist_code, dist_len, bit0, *, cap_words):
    """Stage 2: resolve symbol markers through the uploaded canonical
    code tables, then pack all fields into u32 words."""
    is_cmd = markers == -1
    is_lit = markers == -2
    # command-vs-distance symbol disambiguation: both use marker -1;
    # distance slots were marked -1 in nbits too -- tell them apart by
    # alphabet: cmd syms < 704 but dist syms < 64 overlap. The planner
    # wrote dist syms with marker -1 as well, so encode dist syms
    # shifted by 4096 to keep one marker space.
    is_dsym = is_cmd & (vals >= 4096)
    is_csym = is_cmd & ~is_dsym
    v = jnp.where(is_dsym, vals - 4096, vals)
    code = jnp.where(
        is_lit, lit_code[jnp.clip(v, 0, 255)],
        jnp.where(is_csym, cmd_code[jnp.clip(v, 0, 703)],
                  jnp.where(is_dsym, dist_code[jnp.clip(v, 0, 63)],
                            v)))
    nb = jnp.where(
        is_lit, lit_len[jnp.clip(v, 0, 255)],
        jnp.where(is_csym, cmd_len[jnp.clip(v, 0, 703)],
                  jnp.where(is_dsym, dist_len[jnp.clip(v, 0, 63)],
                            jnp.maximum(markers, 0))))
    return _pack_bits_math(code, nb, bit0, cap_words)
