"""RFC 7932 bitstream assembly: stream header + metablock serialization.

Fully vectorized: command fields and literal runs are interleaved into a
single (value, nbits) stream with cumsum/scatter array surgery -- the
same contract as the device bit-pack kernel (brotli_tpu/ops/bitpack.py).
Round-1 writer uses single block types and trivial context maps
("StoreMetaBlockTrivial" semantics, parity anchor
c/enc/brotli_bit_stream.c:43-74).
"""

import numpy as np

from ..format import constants as C
from ..format import prefix
from ..format.bitio import BitWriter
from .entropy import lengths_to_codes, package_merge, write_huffman_code

MAX_MLEN = 1 << 24


def write_stream_header(bw: BitWriter, window_bits: int) -> None:
    """WBITS encoding (RFC 9.1; inverse of c/dec/decode.c
    DecodeWindowBits)."""
    if window_bits == 16:
        bw.write(0, 1)
    elif 18 <= window_bits <= 24:
        bw.write(1, 1)
        bw.write(window_bits - 17, 3)
    elif window_bits == 17:
        bw.write(1, 1)
        bw.write(0, 3)
        bw.write(0, 3)
    elif 10 <= window_bits <= 15:
        bw.write(1, 1)
        bw.write(0, 3)
        bw.write(window_bits - 8, 3)
    else:
        raise ValueError(f"invalid window bits {window_bits}")


def write_varlen_uint8(bw: BitWriter, value: int) -> None:
    if value == 0:
        bw.write(0, 1)
        return
    bw.write(1, 1)
    nbits = value.bit_length() - 1
    bw.write(nbits, 3)
    if nbits:
        bw.write(value - (1 << nbits), nbits)


def write_metablock_header_mlen(bw: BitWriter, mlen: int, is_last: bool,
                                is_uncompressed: bool = False) -> None:
    bw.write(1 if is_last else 0, 1)
    if is_last:
        bw.write(0, 1)  # not empty
    nibbles = 4 if mlen <= (1 << 16) else 5 if mlen <= (1 << 20) else 6
    bw.write(nibbles - 4, 2)
    v = mlen - 1
    for i in range(nibbles):
        bw.write((v >> (4 * i)) & 0xF, 4)
    if not is_last:
        bw.write(1 if is_uncompressed else 0, 1)


def write_uncompressed_metablock(bw: BitWriter, data: bytes) -> None:
    write_metablock_header_mlen(bw, len(data), is_last=False,
                                is_uncompressed=True)
    bw.align_to_byte()
    arr = np.frombuffer(data, dtype=np.uint8)
    bw.write_arrays(arr.astype(np.int64), np.full(len(arr), 8, np.int64))


def write_last_empty(bw: BitWriter) -> None:
    bw.write(1, 1)  # ISLAST
    bw.write(1, 1)  # ISLASTEMPTY


def _encode_values(values, base, extra):
    """Vectorized (code, extra_value, extra_bits) for a value array."""
    values = np.asarray(values, dtype=np.int64)
    codes = np.searchsorted(base, values, side="right") - 1
    return codes, values - base[codes], extra[codes].astype(np.int64)


def plan_commands(ins: np.ndarray, cpy: np.ndarray, dist: np.ndarray,
                  last_distance: int, dict_flag: np.ndarray = None):
    """Resolve commands to symbols + extras, all vectorized.

    Returns dict of per-command arrays and the updated last distance.
    The final command of a metablock may be insert-only (cpy == 0,
    dist == 0); mid-stream commands always have cpy >= 2.
    """
    n = len(ins)
    icode, iextra, ibits = _encode_values(ins, prefix.INSERT_BASE,
                                          prefix.INSERT_EXTRA)
    final_insert = (cpy == 0) & (dist == 0)
    ccode, cextra, cbits = _encode_values(np.where(final_insert, 2, cpy),
                                          prefix.COPY_BASE,
                                          prefix.COPY_EXTRA)
    # Last-distance chain: a command "reuses" when its distance equals
    # the decoder's ring-buffer top, i.e. the distance of the nearest
    # earlier *pushing* command (LZ copy, not a dictionary reference --
    # dict refs never enter the ring, RFC 4). Reuses keep the value
    # flowing even though they don't push. Vectorized forward-fill:
    if dict_flag is None:
        dict_flag = np.zeros(n, dtype=np.int64)
    # flag semantics: 0 = LZ, 1 = compound-dict ref (pushes the ring,
    # decode.c:1598), 2 = static-dict word (never touches the ring)
    is_dict = dict_flag == 2
    if n:
        pushes = ~final_insert & ~is_dict
        idx = np.arange(n)
        last_push_idx = np.maximum.accumulate(np.where(pushes, idx, -1))
        shifted = np.concatenate([[-1], last_push_idx[:-1]])
        prev_real = np.where(shifted >= 0, dist[np.maximum(shifted, 0)],
                             last_distance)
    else:
        prev_real = np.zeros(0, dtype=np.int64)
    is_reuse = (~final_insert) & (dist == prev_real)
    implicit = is_reuse & (icode < 8) & (ccode < 16)
    explicit_reuse = is_reuse & ~implicit

    dcode = np.zeros(n, dtype=np.int64)
    dextra = np.zeros(n, dtype=np.int64)
    dbits = np.zeros(n, dtype=np.int64)
    # near-reuse short codes 4..9 encode last_distance +/- 1..3 with no
    # extra bits (RFC 4). The ring-top equals the nearest copy command's
    # distance regardless of which code that command used, so prev_real
    # is exact here. Resolution pushes, keeping the model consistent.
    delta = dist - prev_real
    near = ((~final_insert) & ~is_reuse & ~is_dict &
            (np.abs(delta) <= 3) & (delta != 0) & (prev_real > 0))
    near_code = np.where(delta < 0, 4 + 2 * (-delta - 1),
                         5 + 2 * (delta - 1))
    dcode[near] = near_code[near]
    explicit_new = (~final_insert) & ~is_reuse & ~near
    if np.any(explicit_new):
        d = dist[explicit_new].astype(np.int64) - 1  # RFC: d = dist-NDIRECT-1
        # vectorized encode_distance (npostfix=0, ndirect=0):
        # nbits = bit_length(d + 4) - 2, integer math
        nbits = np.zeros(len(d), dtype=np.int64)
        tmp = (d + 4) >> 2
        while np.any(tmp):
            nbits += (tmp > 0)
            tmp >>= 1
        rest = d + 4 - (np.int64(1) << (nbits + 1))
        half = rest >> nbits
        ev = rest - (half << nbits)
        dcode[explicit_new] = (C.NUM_DISTANCE_SHORT_CODES +
                               (((nbits - 1) << 1) | half))
        dextra[explicit_new] = ev
        dbits[explicit_new] = nbits
    # explicit reuse -> short code 0 (no extra bits)

    has_dist = ~final_insert & ~implicit
    # command symbol via cell mapping
    cmd_syms = _combine_codes(icode, ccode, implicit | final_insert & (
        icode < 8))
    # insert-only finals with icode >= 8 need a non-implicit cell
    fix = final_insert & (icode >= 8)
    if np.any(fix):
        cmd_syms[fix] = _combine_codes(icode[fix], ccode[fix],
                                       np.zeros(int(fix.sum()), bool))

    # decoder ring-top after this block = distance of the last non-dict
    # copy command (reuse/near codes resolve to exactly that value)
    ring_src = (~final_insert) & ~is_dict if n else final_insert
    new_last = int(dist[ring_src][-1]) if np.any(ring_src) else last_distance
    return {
        "cmd_syms": cmd_syms.astype(np.int64),
        "insert_extras": (iextra, ibits),
        "copy_extras": (np.where(final_insert, 0, cextra),
                        np.where(final_insert, 0, cbits)),
        "dist_syms": dcode,
        "dist_extras": (dextra, dbits),
        "has_dist": has_dist,
        "ins": np.asarray(ins, np.int64),
    }, new_last


def _combine_codes(icode, ccode, implicit):
    """Vectorized combine_cmd_code (RFC 5)."""
    low = ((icode & 7) << 3) | (ccode & 7)
    cell_starts = np.array([[128, 192, 384], [256, 320, 512],
                            [448, 576, 640]], dtype=np.int64)
    start = cell_starts[icode >> 3, ccode >> 3]
    implicit_start = np.where((ccode >> 3) == 0, 0, 64)
    return np.where(implicit, implicit_start + low, start + low)


def _emission(lengths):  # single-symbol alphabets decode with 0 bits
    return np.zeros_like(lengths) if np.count_nonzero(lengths) <= 1 \
        else lengths


def write_context_map(bw: BitWriter, cmap: np.ndarray,
                      ntrees: int) -> None:
    """Serialize a context map (RFC 7.3): forward-MTF + zero-RLE +
    prefix code, with the IMTF bit set."""
    from .context_model import mtf_transform
    write_varlen_uint8(bw, ntrees - 1)
    if ntrees <= 1:
        return
    mtf = mtf_transform(cmap.astype(np.int64))
    # zero-run lengths decide RLEMAX
    runs = []
    syms = []  # (symbol, extra, extra_bits) with placeholder rlemax
    i = 0
    n = len(mtf)
    max_v = 0
    while i < n:
        if mtf[i] != 0:
            syms.append(("v", int(mtf[i]), 0, 0))
            i += 1
            continue
        j = i
        while j < n and mtf[j] == 0:
            j += 1
        ln = j - i
        while ln > 0:
            if ln == 1:
                syms.append(("v", 0, 0, 0))
                ln = 0
            else:
                v = min(ln.bit_length() - 1, 16)
                extra = min(ln - (1 << v), (1 << v) - 1)
                syms.append(("r", v, extra, v))
                ln -= (1 << v) + extra
                max_v = max(max_v, v)
        i = j
    rlemax = max_v  # 0 => no RLE
    if rlemax:
        bw.write(1, 1)
        bw.write(rlemax - 1, 4)
    else:
        bw.write(0, 1)
    alphabet = ntrees + rlemax
    stream = []
    for kind, a, extra, ebits in syms:
        if kind == "v":
            stream.append((a + rlemax if a else 0, 0, 0))
        else:
            stream.append((a, extra, ebits))
    freq = np.bincount([s for s, _, _ in stream], minlength=alphabet)
    lens = package_merge(freq, C.HUFFMAN_MAX_CODE_LENGTH)
    write_huffman_code(bw, lens, alphabet)
    lens_e = _emission(lens)
    codes = lengths_to_codes(lens_e)
    for s, extra, ebits in stream:
        bw.write(int(codes[s]), int(lens_e[s]))
        if ebits:
            bw.write(extra, ebits)
    bw.write(1, 1)  # IMTF applied


def store_metablock(bw: BitWriter, data: np.ndarray, block_start: int,
                    mlen: int, cmds, is_last: bool, last_distance: int,
                    quality: int = 1, context_mode=None,
                    ctx_floor: int = 0) -> int:
    """Serialize one compressed metablock.

    q < 5: single tree per alphabet ("StoreMetaBlockTrivial").
    q >= 5: 2nd-order literal context modeling -- per-context histograms
    clustered into <= 12 trees with a context map.
    Returns the updated decoder-visible last distance.
    """
    ins, cpy, dist, dflag = _as_arrays(cmds)
    plan, new_last = plan_commands(ins, cpy, dist, last_distance, dflag)

    # literals: gather runs [pos, pos+ins) for each command
    starts = block_start + np.concatenate(
        [[0], np.cumsum(ins + cpy)[:-1]]).astype(np.int64)
    literals = _gather_runs(data, starts, plan["ins"])
    lit_pos = _run_positions(starts, plan["ins"])
    nlit = len(literals)

    # literal block splitting (q >= 9): chunk clustering over the
    # literal stream -> block types with separate tree sets
    split = None
    if quality >= 9 and nlit >= 4096:
        from . import block_split
        split = block_split.split_symbols(literals,
                                          C.NUM_LITERAL_SYMBOLS)
    if split is not None:
        run_types, block_lengths, type_of_lit = split
        ntypes = int(run_types.max()) + 1
    else:
        ntypes = 1
        type_of_lit = np.zeros(nlit, np.int64)

    use_context = quality >= 5 and nlit >= 1024
    from . import context_model as cm
    if use_context:
        mode = cm.choose_context_mode(data) if context_mode is None \
            else context_mode
        ctx_ids = cm.literal_context_ids(data, lit_pos, mode, ctx_floor)
    else:
        mode = 0
        ctx_ids = np.zeros(nlit, np.int64)
    group = (type_of_lit << C.LITERAL_CONTEXT_BITS) | ctx_ids
    if use_context or ntypes > 1:
        hists = cm.context_histograms(
            literals, group, ntypes * C.NUM_LITERAL_CONTEXTS,
            C.NUM_LITERAL_SYMBOLS)
        if use_context:
            assign, merged = cm.cluster_histograms(hists, max_trees=12)
        else:  # per-type trees, constant over contexts
            assign = np.repeat(np.arange(ntypes, dtype=np.int64),
                               C.NUM_LITERAL_CONTEXTS)
            merged = np.stack([
                hists[t * 64:(t + 1) * 64].sum(axis=0)
                for t in range(ntypes)])
        ntrees = len(merged)
        if ntrees == 1 and ntypes == 1:
            use_context = False
    multi = use_context or ntypes > 1

    write_metablock_header_mlen(bw, mlen, is_last)
    write_varlen_uint8(bw, ntypes - 1)  # NBLTYPESL
    if ntypes > 1:
        sw_info = _plan_block_switches(run_types, block_lengths, ntypes)
        _write_block_header(bw, sw_info, ntypes)
    write_varlen_uint8(bw, 0)  # NBLTYPESI
    write_varlen_uint8(bw, 0)  # NBLTYPESD
    bw.write(0, 2)  # NPOSTFIX = 0
    bw.write(0, 4)  # NDIRECT = 0

    cmd_freq = np.bincount(plan["cmd_syms"],
                           minlength=C.NUM_COMMAND_SYMBOLS)
    dsyms = plan["dist_syms"][plan["has_dist"]]
    dist_freq = np.bincount(dsyms, minlength=64) if len(dsyms) else \
        np.zeros(64, np.int64)
    cmd_len = package_merge(cmd_freq, C.HUFFMAN_MAX_CODE_LENGTH)
    dist_len = package_merge(dist_freq, C.HUFFMAN_MAX_CODE_LENGTH)

    if not multi:
        bw.write(0, 2)  # literal context mode (irrelevant: 1 tree)
        write_varlen_uint8(bw, 0)  # literal context map: 1 tree
        write_varlen_uint8(bw, 0)  # distance context map: 1 tree
        lit_freq = np.bincount(literals, minlength=C.NUM_LITERAL_SYMBOLS)
        lit_len = package_merge(lit_freq, C.HUFFMAN_MAX_CODE_LENGTH)
        write_huffman_code(bw, lit_len, C.NUM_LITERAL_SYMBOLS)
        write_huffman_code(bw, cmd_len, C.NUM_COMMAND_SYMBOLS)
        write_huffman_code(bw, dist_len, 64)
        lit_len = _emission(lit_len)
        lit_codes = lengths_to_codes(lit_len).astype(np.int64)
        lit_vals = lit_codes[literals]
        lit_bits = lit_len[literals]
    else:
        for _ in range(ntypes):
            bw.write(mode, 2)  # context mode per literal block type
        write_context_map(bw, assign, ntrees)  # literal context map
        write_varlen_uint8(bw, 0)  # distance context map: 1 tree
        lit_lens2d = np.zeros((ntrees, C.NUM_LITERAL_SYMBOLS), np.int32)
        lit_codes2d = np.zeros_like(lit_lens2d, dtype=np.int64)
        for t in range(ntrees):
            true_len = package_merge(merged[t], C.HUFFMAN_MAX_CODE_LENGTH)
            write_huffman_code(bw, true_len, C.NUM_LITERAL_SYMBOLS)
            e = _emission(true_len)
            lit_lens2d[t] = e
            lit_codes2d[t] = lengths_to_codes(e).astype(np.int64)
        write_huffman_code(bw, cmd_len, C.NUM_COMMAND_SYMBOLS)
        write_huffman_code(bw, dist_len, 64)
        tree_of_lit = assign[group]
        lit_vals = lit_codes2d[tree_of_lit, literals]
        lit_bits = lit_lens2d[tree_of_lit, literals].astype(np.int64)

    if ntypes > 1:  # embed switch slots before the switching literal
        lit_vals, lit_bits = _with_switch_slots(
            lit_vals, lit_bits, sw_info)
        lanes = 4
    else:
        lanes = 1

    cmd_len_e = _emission(cmd_len)
    dist_len_e = _emission(dist_len)
    values, nbits = _interleave_symbols(
        plan, (lit_vals, lit_bits), lanes,
        (lengths_to_codes(cmd_len_e).astype(np.int64), cmd_len_e),
        (lengths_to_codes(dist_len_e).astype(np.int64), dist_len_e))
    bw.write_arrays(values, nbits)
    return new_last


def _plan_block_switches(run_types, block_lengths, ntypes):
    """Resolve block-switch symbols: type codes ride a 2-entry ring
    (0 = previous, 1 = current + 1, else type + 2; RFC 6)."""
    tsyms = []
    rb = [1, 0]
    for t in run_types[1:]:
        t = int(t)
        if t == rb[0]:
            tsyms.append(0)
        elif t == (rb[1] + 1) % ntypes:
            tsyms.append(1)
        else:
            tsyms.append(t + 2)
        rb = [rb[1], t]
    tsyms = np.array(tsyms, np.int64)
    ccode, cextra, cbits = (np.array(v) for v in zip(
        *[prefix.encode_value(int(L), prefix.BLOCK_COUNT_BASE,
                              prefix.BLOCK_COUNT_EXTRA)
          for L in block_lengths]))
    # trees over type symbols (switches only) and count codes (all)
    type_freq = np.bincount(tsyms, minlength=ntypes + 2) if len(tsyms) \
        else np.zeros(ntypes + 2, np.int64)
    cnt_freq = np.bincount(ccode, minlength=C.NUM_BLOCK_LEN_SYMBOLS)
    type_len = package_merge(type_freq, C.HUFFMAN_MAX_CODE_LENGTH)
    cnt_len = package_merge(cnt_freq, C.HUFFMAN_MAX_CODE_LENGTH)
    return {
        "tsyms": tsyms, "ccode": ccode, "cextra": cextra, "cbits": cbits,
        "block_lengths": np.asarray(block_lengths, np.int64),
        "type_len": type_len, "cnt_len": cnt_len,
        "type_codes": lengths_to_codes(_emission(type_len)),
        "type_bits": _emission(type_len),
        "cnt_codes": lengths_to_codes(_emission(cnt_len)),
        "cnt_bits": _emission(cnt_len),
    }


def _write_block_header(bw, sw, ntypes):
    """Block-type tree, block-count tree, first block length (RFC 9.2)."""
    write_huffman_code(bw, sw["type_len"], ntypes + 2)
    write_huffman_code(bw, sw["cnt_len"], C.NUM_BLOCK_LEN_SYMBOLS)
    c0 = int(sw["ccode"][0])
    bw.write(int(sw["cnt_codes"][c0]), int(sw["cnt_bits"][c0]))
    if sw["cbits"][0]:
        bw.write(int(sw["cextra"][0]), int(sw["cbits"][0]))


def _with_switch_slots(lit_vals, lit_bits, sw):
    """Expand per-literal streams to 4 lanes: [switch type, switch count,
    switch count extra, literal]. Switches fire before the first literal
    of each block after the first."""
    nlit = len(lit_vals)
    v = np.zeros((nlit, 4), np.int64)
    b = np.zeros((nlit, 4), np.int64)
    v[:, 3] = lit_vals
    b[:, 3] = lit_bits
    at = np.cumsum(sw["block_lengths"])[:-1]
    tsyms = sw["tsyms"]
    v[at, 0] = sw["type_codes"][tsyms]
    b[at, 0] = sw["type_bits"][tsyms]
    cc = sw["ccode"][1:]
    v[at, 1] = sw["cnt_codes"][cc]
    b[at, 1] = sw["cnt_bits"][cc]
    v[at, 2] = sw["cextra"][1:]
    b[at, 2] = sw["cbits"][1:]
    return v, b


# backwards-compatible alias used by tests/tools
def store_metablock_trivial(bw, data, block_start, mlen, cmds, is_last,
                            last_distance):
    return store_metablock(bw, data, block_start, mlen, cmds, is_last,
                           last_distance, quality=1)


def _run_positions(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Absolute position of every literal (parallel to _gather_runs)."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(lengths)
    out_start = ends - lengths
    idx = np.arange(total, dtype=np.int64)
    run_id = np.searchsorted(ends, idx, side="right")
    return starts[run_id] + (idx - out_start[run_id])


def _as_arrays(cmds):
    if isinstance(cmds, tuple) and isinstance(cmds[0], np.ndarray):
        if len(cmds) == 4:
            return cmds
        return (*cmds, np.zeros(len(cmds[0]), np.int64))
    if len(cmds) == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    a = np.asarray(cmds, dtype=np.int64)
    if a.shape[1] == 3:
        return a[:, 0], a[:, 1], a[:, 2], np.zeros(len(a), np.int64)
    return a[:, 0], a[:, 1], a[:, 2], a[:, 3]


def _gather_runs(data: np.ndarray, starts: np.ndarray,
                 lengths: np.ndarray) -> np.ndarray:
    """Concatenate data[starts[k]:starts[k]+lengths[k]] for all k."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, np.uint8)
    # index arithmetic: for each output slot, its source position
    ends = np.cumsum(lengths)
    out_start = ends - lengths
    idx = np.arange(total, dtype=np.int64)
    run_id = np.searchsorted(ends, idx, side="right")
    src = starts[run_id] + (idx - out_start[run_id])
    return data[src]


def _interleave_symbols(plan, lit_stream, lanes, cmd_code, dist_code):
    """Build the metablock body (value, nbits) stream in decode order:
    per command: cmd sym, insert extra, copy extra, literals, dist sym,
    dist extra. `lit_stream` = per-literal (values, nbits), either 1D or
    (nlit, lanes) when block-switch slots ride along each literal."""
    lit_vals_in, lit_bits_in = lit_stream
    ins = plan["ins"]
    n = len(ins)
    nlit = lit_vals_in.shape[0]
    total = n * 5 + nlit * lanes
    values = np.zeros(total, dtype=np.int64)
    nbits = np.zeros(total, dtype=np.int64)
    # per-command record length = 3 + ins_k * lanes + 2
    rec_len = 5 + ins * lanes
    rec_start = np.concatenate([[0], np.cumsum(rec_len)[:-1]]).astype(
        np.int64)
    # fixed fields
    cmd_codes, cmd_lens = cmd_code
    s = plan["cmd_syms"]
    values[rec_start] = cmd_codes[s]
    nbits[rec_start] = cmd_lens[s]
    iv, ib = plan["insert_extras"]
    values[rec_start + 1] = iv
    nbits[rec_start + 1] = ib
    cv, cb = plan["copy_extras"]
    values[rec_start + 2] = cv
    nbits[rec_start + 2] = cb
    # literals (each `lanes` slots wide) at rec_start + 3 + k*lanes
    if nlit:
        ends = np.cumsum(ins)
        out_start = ends - ins
        idx = np.arange(nlit, dtype=np.int64)
        run_id = np.searchsorted(ends, idx, side="right")
        slot0 = rec_start[run_id] + 3 + (idx - out_start[run_id]) * lanes
        if lanes == 1:
            values[slot0] = lit_vals_in
            nbits[slot0] = lit_bits_in
        else:
            for c in range(lanes):
                values[slot0 + c] = lit_vals_in[:, c]
                nbits[slot0 + c] = lit_bits_in[:, c]
    # distances at record end
    dist_codes, dist_lens = dist_code
    dslot = rec_start + 3 + ins * lanes
    has = plan["has_dist"]
    ds = plan["dist_syms"]
    values[dslot] = np.where(has, dist_codes[ds], 0)
    nbits[dslot] = np.where(has, dist_lens[ds], 0)
    dv, db = plan["dist_extras"]
    values[dslot + 1] = np.where(has, dv, 0)
    nbits[dslot + 1] = np.where(has, db, 0)
    return values, nbits
