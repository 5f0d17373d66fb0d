/* brotli_tpu native decoder: from-scratch RFC 7932 whole-buffer decode.
 *
 * Host-side runtime component of the TPU codec (role parity with the
 * reference's c/dec/decode.c, but an independent implementation derived
 * from this repo's Python decoder and the RFC; no code is shared).
 * Flat C ABI for ctypes. All tables come from btpu_tables.h, generated
 * from the Python format layer.
 *
 * Build: cc -O2 -shared -fPIC -o libbtpu.so btpu_dec.c
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "btpu_tables.h"

/* error identities mirror the reference's BrotliDecoderErrorCode
   (c/include/brotli/decode.h:64-105; negatives match exactly).
   Conditions the reference reports through other channels (results,
   malloc failure) use codes <= -100. Python names: dec/errors.py. */
#define ERR_EXUBERANT_NIBBLE -1
#define ERR_RESERVED -2
#define ERR_EXUBERANT_META_NIBBLE -3
#define ERR_SIMPLE_HUFFMAN_ALPHABET -4
#define ERR_SIMPLE_HUFFMAN_SAME -5
#define ERR_CL_SPACE -6
#define ERR_HUFFMAN_SPACE -7
#define ERR_CONTEXT_MAP_REPEAT -8
#define ERR_BLOCK_LENGTH -9
#define ERR_TRANSFORM -11
#define ERR_DICTIONARY -12
#define ERR_WINDOW_BITS -13
#define ERR_PADDING_1 -14
#define ERR_PADDING_2 -15
#define ERR_DISTANCE -16
#define ERR_BLOCK_SWITCH -17
#define ERR_COMPOUND_DICTIONARY -18
#define ERR_FORMAT -31 /* unreachable/generic */
#define ERR_TRUNCATED -102
#define ERR_ALLOC -103
#define ERR_OUTPUT_TOO_LARGE -104

#define MAX_OUTPUT ((size_t)1 << 32)

/* ---------- bit reader ---------- */

typedef struct {
  const uint8_t* buf;
  size_t len;
  size_t bitpos; /* absolute bit position */
} BitReader;

static inline int br_avail(const BitReader* br, size_t nbits) {
  return br->bitpos + nbits <= br->len * 8;
}

/* peek up to 32 bits; zero-padded past the end */
static inline uint32_t br_peek(const BitReader* br, int n) {
  size_t byte = br->bitpos >> 3;
  int shift = (int)(br->bitpos & 7);
  uint64_t w = 0;
  size_t rem = br->len - byte;
  if (rem >= 8) {
    memcpy(&w, br->buf + byte, 8);
  } else {
    memcpy(&w, br->buf + byte, rem);
  }
  return (uint32_t)((w >> shift) & ((n >= 32) ? 0xFFFFFFFFu
                                              : ((1u << n) - 1u)));
}

static inline int br_take(BitReader* br, int n, uint32_t* v) {
  if (!br_avail(br, (size_t)n)) return ERR_TRUNCATED;
  *v = br_peek(br, n);
  br->bitpos += (size_t)n;
  return 0;
}

/* ---------- canonical prefix-code tables ---------- */

#define TBL_BITS 10

typedef struct {
  uint16_t sym[1 << TBL_BITS];
  uint8_t len[1 << TBL_BITS]; /* 0 => long code, use slow path;
                                 255 => degenerate 0-bit code */
  /* slow path for code lengths > TBL_BITS */
  uint16_t count[16];      /* codes per length */
  uint16_t base_code[16];  /* first (msb-first) code of each length */
  uint16_t base_idx[16];   /* index into sorted[] of first code */
  uint16_t sorted[1128];   /* symbols ordered by (len, sym) */
  int degenerate_sym;
} Tree;

static uint32_t rev_bits(uint32_t v, int n) {
  uint32_t r = 0;
  for (int i = 0; i < n; i++) { r = (r << 1) | (v & 1); v >>= 1; }
  return r;
}

/* lengths[alpha]; returns 0 ok. Kraft must be exact unless single sym. */
static int tree_build(Tree* t, const uint8_t* lengths, int alpha) {
  memset(t->count, 0, sizeof(t->count));
  int used = 0, single = -1;
  for (int s = 0; s < alpha; s++) {
    if (lengths[s]) { t->count[lengths[s]]++; used++; single = s; }
  }
  if (used == 0) return ERR_HUFFMAN_SPACE;
  if (used == 1) {
    memset(t->len, 255, sizeof(t->len));
    t->degenerate_sym = single;
    for (int i = 0; i < (1 << TBL_BITS); i++) t->sym[i] = (uint16_t)single;
    return 0;
  }
  t->degenerate_sym = -1;
  /* kraft check + canonical first codes */
  uint32_t code = 0;
  int64_t space = 0;
  int idx = 0;
  for (int l = 1; l <= 15; l++) {
    t->base_code[l] = (uint16_t)code;
    t->base_idx[l] = (uint16_t)idx;
    code = (code + t->count[l]) << 1;
    space += (int64_t)t->count[l] << (15 - l);
    idx += t->count[l];
  }
  if (space != (1 << 15)) return ERR_HUFFMAN_SPACE;
  /* sorted symbol list */
  int fill = 0;
  uint16_t next_idx[16];
  memcpy(next_idx, t->base_idx, sizeof(next_idx));
  for (int s = 0; s < alpha; s++) {
    int l = lengths[s];
    if (l) t->sorted[next_idx[l]++] = (uint16_t)s;
  }
  (void)fill;
  /* fast table for codes <= TBL_BITS */
  memset(t->len, 0, sizeof(t->len));
  uint16_t cur[16];
  memcpy(cur, t->base_code, sizeof(cur));
  for (int s = 0; s < alpha; s++) {
    int l = lengths[s];
    if (!l) continue;
    uint32_t c = cur[l]++;
    if (l <= TBL_BITS) {
      uint32_t r = rev_bits(c, l);
      for (uint32_t i = r; i < (1u << TBL_BITS); i += (1u << l)) {
        t->sym[i] = (uint16_t)s;
        t->len[i] = (uint8_t)l;
      }
    }
  }
  return 0;
}

static inline int tree_decode(const Tree* t, BitReader* br, uint32_t* out) {
  uint32_t bits = br_peek(br, 15);
  uint32_t i = bits & ((1u << TBL_BITS) - 1);
  if (t->len[i] == 255) { *out = t->sym[0]; return 0; } /* degenerate */
  if (t->len[i]) {
    if (!br_avail(br, t->len[i])) return ERR_TRUNCATED;
    br->bitpos += t->len[i];
    *out = t->sym[i];
    return 0;
  }
  /* slow path: all codes of length <= TBL_BITS hit the fast table, so
     only lengths TBL_BITS+1..15 remain; accumulate their msb-first
     prefix in one pass, then walk the long lengths */
  uint32_t code = 0;
  for (int l = 1; l <= TBL_BITS; l++)
    code = (code << 1) | ((bits >> (l - 1)) & 1);
  for (int l = TBL_BITS + 1; l <= 15; l++) {
    code = (code << 1) | ((bits >> (l - 1)) & 1);
    if (t->count[l] && code >= t->base_code[l] &&
        code < (uint32_t)t->base_code[l] + t->count[l]) {
      if (!br_avail(br, l)) return ERR_TRUNCATED;
      br->bitpos += l;
      *out = t->sorted[t->base_idx[l] + (code - t->base_code[l])];
      return 0;
    }
  }
  return ERR_FORMAT;
}

/* ---------- varlen + block state ---------- */

static int read_varlen_u8(BitReader* br, uint32_t* out) {
  uint32_t b, n, extra;
  int e;
  if ((e = br_take(br, 1, &b))) return e;
  if (!b) { *out = 0; return 0; }
  if ((e = br_take(br, 3, &n))) return e;
  if (n == 0) { *out = 1; return 0; }
  if ((e = br_take(br, (int)n, &extra))) return e;
  *out = (1u << n) + extra;
  return 0;
}

typedef struct {
  uint32_t num_types;
  uint32_t type_rb[2];
  uint64_t length;
  Tree type_tree;
  Tree len_tree;
} BlockState;

static int read_block_len(BlockState* bs, BitReader* br, uint64_t* out) {
  uint32_t code, extra;
  int e;
  if ((e = tree_decode(&bs->len_tree, br, &code))) return e;
  if (code >= 26) return ERR_BLOCK_LENGTH;
  if ((e = br_take(br, kBlockCountExtra[code], &extra))) return e;
  *out = (uint64_t)kBlockCountBase[code] + extra;
  return 0;
}

static int read_huffman_code(BitReader* br, int alpha, Tree* t,
                             uint8_t* scratch_lengths);

static int block_state_init(BlockState* bs, BitReader* br,
                            uint8_t* scratch) {
  uint32_t v;
  int e;
  if ((e = read_varlen_u8(br, &v))) return e;
  bs->num_types = v + 1;
  bs->type_rb[0] = 1;
  bs->type_rb[1] = 0;
  bs->length = ~(uint64_t)0;
  if (bs->num_types >= 2) {
    if ((e = read_huffman_code(br, (int)bs->num_types + 2, &bs->type_tree,
                               scratch))) return e;
    if ((e = read_huffman_code(br, 26, &bs->len_tree, scratch))) return e;
    if ((e = read_block_len(bs, br, &bs->length))) return e;
  }
  return 0;
}

static int block_switch(BlockState* bs, BitReader* br, uint32_t* out_type) {
  uint32_t bt;
  int e;
  if (bs->num_types <= 1) return ERR_BLOCK_SWITCH;
  if ((e = tree_decode(&bs->type_tree, br, &bt))) return e;
  if ((e = read_block_len(bs, br, &bs->length))) return e;
  if (bt == 0) bt = bs->type_rb[0];
  else if (bt == 1) bt = bs->type_rb[1] + 1;
  else bt -= 2;
  if (bt >= bs->num_types) bt -= bs->num_types;
  bs->type_rb[0] = bs->type_rb[1];
  bs->type_rb[1] = bt;
  *out_type = bt;
  return 0;
}

/* ---------- RFC 3.5 code descriptions ---------- */

static int read_huffman_code(BitReader* br, int alpha, Tree* t,
                             uint8_t* lengths /* >= 1128 bytes */) {
  uint32_t kind, v;
  int e;
  memset(lengths, 0, 1128);
  if ((e = br_take(br, 2, &kind))) return e;
  if (kind == 1) { /* simple */
    uint32_t nsym;
    if ((e = br_take(br, 2, &nsym))) return e;
    nsym += 1;
    int max_bits = 0;
    while ((1 << max_bits) < alpha) max_bits++;
    /* alphabet size -1 bit width */
    max_bits = 0;
    for (int x = alpha - 1; x; x >>= 1) max_bits++;
    uint16_t syms[4];
    for (uint32_t i = 0; i < nsym; i++) {
      if ((e = br_take(br, max_bits, &v))) return e;
      if ((int)v >= alpha) return ERR_SIMPLE_HUFFMAN_ALPHABET;
      syms[i] = (uint16_t)v;
      for (uint32_t j = 0; j < i; j++)
        if (syms[j] == syms[i]) return ERR_SIMPLE_HUFFMAN_SAME;
    }
    uint32_t tree_select = 0;
    if (nsym == 4 && (e = br_take(br, 1, &tree_select))) return e;
    static const uint8_t shapes[5][4] = {
        {0}, {0}, {1, 1, 0, 0}, {1, 2, 2, 0}, {2, 2, 2, 2}};
    if (nsym == 1) {
      lengths[syms[0]] = 1;
      return tree_build(t, lengths, alpha); /* degenerate */
    }
    const uint8_t* shape = shapes[nsym];
    static const uint8_t select_shape[4] = {1, 2, 3, 3};
    if (nsym == 4 && tree_select) shape = select_shape;
    /* stream order is (length, value)-sorted per the decoder contract */
    for (uint32_t i = 0; i < nsym; i++) lengths[syms[i]] = shape[i];
    return tree_build(t, lengths, alpha);
  }
  /* complex: kind = number of skipped cl-code slots */
  uint8_t cl_len[18];
  memset(cl_len, 0, sizeof(cl_len));
  int space = 32, num_codes = 0;
  for (int i = (int)kind; i < 18; i++) {
    uint32_t ix = br_peek(br, 4);
    int l = kClcFixedLen[ix];
    if (!br_avail(br, (size_t)l)) return ERR_TRUNCATED;
    br->bitpos += (size_t)l;
    uint8_t val = kClcFixedVal[ix];
    cl_len[kClcOrder[i]] = val;
    if (val) {
      space -= 32 >> val;
      num_codes++;
      if (space <= 0) break;
    }
  }
  if (!(num_codes == 1 || space == 0)) return ERR_CL_SPACE;
  Tree cl_tree;
  if ((e = tree_build(&cl_tree, cl_len, 18))) return e;
  /* symbol lengths */
  int symbol = 0;
  int64_t space2 = 1 << 15;
  uint32_t prev_len = 8, repeat = 0, repeat_len = 0;
  while (symbol < alpha && space2 > 0) {
    uint32_t cl;
    if ((e = tree_decode(&cl_tree, br, &cl))) return e;
    if (cl < 16) {
      repeat = 0;
      if (cl) {
        lengths[symbol] = (uint8_t)cl;
        prev_len = cl;
        space2 -= (1 << 15) >> cl;
      }
      symbol++;
    } else {
      int extra_bits = (cl == 16) ? 2 : 3;
      uint32_t new_len = (cl == 16) ? prev_len : 0;
      if (repeat_len != new_len) { repeat = 0; repeat_len = new_len; }
      uint32_t old = repeat;
      if (repeat > 0) repeat = (repeat - 2) << extra_bits;
      uint32_t extra;
      if ((e = br_take(br, extra_bits, &extra))) return e;
      repeat += extra + 3;
      uint32_t delta = repeat - old;
      if (symbol + (int)delta > alpha) return ERR_HUFFMAN_SPACE;
      if (repeat_len) {
        memset(lengths + symbol, (int)repeat_len, delta);
        space2 -= (int64_t)delta << (15 - repeat_len);
      }
      symbol += (int)delta;
    }
  }
  if (space2 != 0) return ERR_HUFFMAN_SPACE;
  return tree_build(t, lengths, alpha);
}

/* ---------- context map ---------- */

static int read_context_map(BitReader* br, uint32_t size, uint8_t* cmap,
                            uint32_t* num_trees, uint8_t* scratch) {
  uint32_t v;
  int e;
  if ((e = read_varlen_u8(br, &v))) return e;
  *num_trees = v + 1;
  memset(cmap, 0, size);
  if (*num_trees <= 1) return 0;
  uint32_t use_rle, rlemax = 0;
  if ((e = br_take(br, 1, &use_rle))) return e;
  if (use_rle) {
    if ((e = br_take(br, 4, &v))) return e;
    rlemax = v + 1;
  }
  Tree t;
  if ((e = read_huffman_code(br, (int)(*num_trees + rlemax), &t,
                             scratch))) return e;
  uint32_t i = 0;
  while (i < size) {
    uint32_t code;
    if ((e = tree_decode(&t, br, &code))) return e;
    if (code == 0) {
      cmap[i++] = 0;
    } else if (code <= rlemax) {
      uint32_t reps;
      if ((e = br_take(br, (int)code, &reps))) return e;
      reps += 1u << code;
      if (i + reps > size) return ERR_CONTEXT_MAP_REPEAT;
      memset(cmap + i, 0, reps);
      i += reps;
    } else {
      cmap[i++] = (uint8_t)(code - rlemax);
    }
  }
  uint32_t imtf;
  if ((e = br_take(br, 1, &imtf))) return e;
  if (imtf) {
    uint8_t mtf[256];
    for (int k = 0; k < 256; k++) mtf[k] = (uint8_t)k;
    for (uint32_t k = 0; k < size; k++) {
      uint8_t idx = cmap[k];
      uint8_t val = mtf[idx];
      cmap[k] = val;
      memmove(mtf + 1, mtf, idx);
      mtf[0] = val;
    }
  }
  return 0;
}

/* ---------- output buffer ---------- */

typedef struct {
  uint8_t* p;
  size_t len, cap;
} Out;

static int out_reserve(Out* o, size_t extra) {
  if (o->len + extra <= o->cap) return 0;
  size_t ncap = o->cap ? o->cap * 2 : 1 << 16;
  while (ncap < o->len + extra) ncap *= 2;
  if (ncap > MAX_OUTPUT) return ERR_OUTPUT_TOO_LARGE;
  uint8_t* np = (uint8_t*)realloc(o->p, ncap);
  if (!np) return ERR_ALLOC;
  o->p = np;
  o->cap = ncap;
  return 0;
}

/* ---------- transforms ---------- */

static int uppercase_rune(uint8_t* p, int i, int len) {
  uint8_t c = p[i];
  if (c < 0xC0) {
    if (c >= 'a' && c <= 'z') p[i] ^= 32;
    return 1;
  }
  if (c < 0xE0) {
    if (i + 1 < len) p[i + 1] ^= 32;
    return 2;
  }
  if (i + 2 < len) p[i + 2] ^= 5;
  return 3;
}

/* dst must have >= len + 13 bytes; returns transformed length */
static int transform_word(uint8_t* dst, const uint8_t* word, int len,
                          int tid) {
  int op = kTransformOp[tid];
  int n = 0;
  const uint8_t* pre = kTransformPool + kTransformPrefixOff[tid];
  int pre_len = kTransformPrefixLen[tid];
  memcpy(dst, pre, (size_t)pre_len);
  n = pre_len;
  const uint8_t* w = word;
  int wl = len;
  if (op >= 20) { wl -= (op - 20); if (wl < 0) wl = 0; }
  else if (op >= 10) { int k = op - 10; if (k > wl) k = wl; w += k; wl -= k; }
  memcpy(dst + n, w, (size_t)wl);
  if (op == 1 && wl > 0) uppercase_rune(dst + n, 0, wl);
  else if (op == 2) {
    int i = 0;
    while (i < wl) i += uppercase_rune(dst + n, i, wl);
  }
  n += wl;
  const uint8_t* suf = kTransformPool + kTransformSuffixOff[tid];
  int suf_len = kTransformSuffixLen[tid];
  memcpy(dst + n, suf, (size_t)suf_len);
  return n + suf_len;
}

/* ---------- main decode ---------- */

typedef struct {
  Tree* lit;
  Tree* cmd;
  Tree* dist;
} TreeGroups;

/* Mid-metablock suspension context (the c/dec/state.h role at command
   granularity): everything a compressed metablock's command loop
   needs to continue after more input arrives. Owned by DecStream
   between calls; trees/cmaps transfer by pointer. */
typedef struct {
  BlockState bs[3];
  uint32_t npostfix, ndirect, dist_alpha;
  uint8_t ctx_modes[256];
  Tree *lit_trees, *cmd_trees, *dist_trees;
  uint32_t n_lit_trees, n_cmd_trees, n_dist_trees;
  uint8_t *lit_cmap, *dist_cmap;
  uint32_t is_last;
  /* command-loop registers at the suspension snapshot */
  int64_t remaining;
  uint32_t lit_bt, cmd_bt, dist_bt;
  uint64_t pend_insert; /* literals left in the open command */
  int have_cmd;         /* command symbol read; copy part pending */
  uint32_t sym;         /* open command's symbol */
  uint64_t copy_len;    /* open command's copy length */
  uint64_t pend_copy;   /* copy bytes still to emit (output-limit split) */
  int64_t pend_dist;    /* open LZ copy's distance */
  size_t pend_src;      /* open compound copy's source cursor */
  int pend_kind;        /* 0 = LZ window, 1 = compound, 2 = dict word */
  uint8_t pend_word[40]; /* kind 2: the transformed word bytes */
} MbCtx;

static void mbctx_free(MbCtx* c) {
  if (!c) return;
  free(c->lit_trees);
  free(c->cmd_trees);
  free(c->dist_trees);
  free(c->lit_cmap);
  free(c->dist_cmap);
  free(c);
}

/* Streaming decode state: resumes at metablock granularity. Between
   metablocks the ONLY decoder state is (bit position, distance ring,
   output-so-far); everything else (trees, context maps, block states)
   is metablock-local. The chunk driver re-passes the FULL accumulated
   input each call; on input exhaustion mid-metablock the position
   rewinds to the metablock start and the call reports need-more. */
typedef struct {
  int header_done;
  int finished;
  int wbits;
  int is_large;
  size_t bitpos;       /* committed resume point (ABSOLUTE bits) */
  int32_t dist_rb[4];
  int rb_idx;
  Out out;             /* retained output (window + undelivered) */
  size_t out_dropped;  /* output prefix trimmed away (absolute bytes) */
  size_t delivered;
  size_t last_attempt; /* ABSOLUTE input bytes at last incomplete try */
  int allow_trailing;  /* brcat mode: bytes after stream end are the
                          next stream, not garbage */
  size_t out_limit;    /* max NEW output bytes per chunk call (0 =
                          unlimited): true back-pressure, the
                          python/_brotli.c output_buffer_limit role
                          (1.2.0 SECURITY change) -- decoding STOPS at
                          the limit, input is NOT eagerly expanded */
  MbCtx* mb;           /* mid-metablock suspension (NULL = boundary) */
} DecStream;

/* record the current command-loop state as the rollback point */
#define MB_SNAP()                                          \
  do {                                                     \
    msnap.valid = 1;                                       \
    msnap.bitpos = br.bitpos;                              \
    msnap.out_len = out.len;                               \
    memcpy(msnap.dist_rb, dist_rb, sizeof(dist_rb));       \
    msnap.rb_idx = rb_idx;                                 \
    for (int c_ = 0; c_ < 3; c_++) {                       \
      msnap.type_rb[c_][0] = bs[c_].type_rb[0];            \
      msnap.type_rb[c_][1] = bs[c_].type_rb[1];            \
      msnap.bs_len[c_] = bs[c_].length;                    \
    }                                                      \
    msnap.lit_bt = lit_bt;                                 \
    msnap.cmd_bt = cmd_bt;                                 \
    msnap.dist_bt = dist_bt;                               \
    msnap.remaining = remaining;                           \
    msnap.pend_insert = pend_insert;                       \
    msnap.have_cmd = have_cmd;                             \
    msnap.sym = sym;                                       \
    msnap.copy_len = copy_len;                             \
    msnap.pend_copy = pend_copy;                           \
    msnap.pend_dist = pend_dist;                           \
    msnap.pend_src = pend_src;                             \
    msnap.pend_kind = pend_kind;                           \
    memcpy(msnap.pend_word, pend_word, sizeof(pend_word)); \
  } while (0)

/* `in` may be a TAIL of the logical stream starting at absolute byte
   offset in_base (the chunk driver trims consumed input); bit
   positions in S are absolute, the BitReader's are tail-relative. */
static int btpu_decode_impl(const uint8_t* in, size_t in_len,
                            size_t in_base, const uint8_t* dict,
                            const uint8_t* compound,
                            size_t compound_len, int large_window,
                            int is_final, DecStream* S,
                            uint8_t** out_ptr, size_t* out_len) {
  BitReader br = {in, in_len, 0};
  Out out = {0, 0, 0};
  int e = 0;
  uint32_t v;
  size_t snap_out = 0;
  int32_t snap_rb[4];
  int snap_rbidx = 0;
  Tree* lit_trees = NULL;
  Tree* cmd_trees = NULL;
  Tree* dist_trees = NULL;
  uint8_t* lit_cmap = NULL;
  uint8_t* dist_cmap = NULL;
  uint8_t scratch[1200];
  int32_t dist_rb[4] = {16, 15, 11, 4};
  int rb_idx = 0;
  /* metablock-scope state, function-hoisted so the suspension path
     (fail:) and the resume path (resume_mb:) can reach it */
  BlockState bs[3];
  uint32_t npostfix = 0, ndirect = 0, dist_alpha = 0;
  uint8_t ctx_modes[256];
  uint32_t n_lit_trees = 0, n_cmd_trees = 0, n_dist_trees = 0;
  uint32_t is_last = 0;
  uint32_t lit_bt = 0, cmd_bt = 0, dist_bt = 0;
  int64_t remaining = 0;
  uint64_t pend_insert = 0;
  int have_cmd = 0;
  uint32_t sym = 0;
  uint64_t copy_len = 0;
  uint64_t pend_copy = 0;  /* copy split across output-limit suspends */
  int64_t pend_dist = 0;
  size_t pend_src = 0;
  int pend_kind = 0;
  uint8_t pend_word[40];   /* kind 2: transformed dict word bytes */
  memset(pend_word, 0, sizeof(pend_word));
  int limited = 0;              /* suspended by the output limit */
  size_t limit_abs = (size_t)-1; /* out.len ceiling for this call */
  /* rollback point inside the current compressed metablock: command
     boundaries and every 4096th literal of a long run (bounded
     rework; the c/dec/bit_reader.h:73 save/restore role at command
     granularity) */
  struct MSnap {
    int valid;
    size_t bitpos; /* tail-relative */
    size_t out_len;
    int32_t dist_rb[4];
    int rb_idx;
    uint32_t type_rb[3][2];
    uint64_t bs_len[3];
    uint32_t lit_bt, cmd_bt, dist_bt;
    int64_t remaining;
    uint64_t pend_insert;
    int have_cmd;
    uint32_t sym;
    uint64_t copy_len;
    uint64_t pend_copy;
    int64_t pend_dist;
    size_t pend_src;
    int pend_kind;
    uint8_t pend_word[40];
  } msnap;
  msnap.valid = 0;

  /* window bits (incl. the large-window extension, parity:
     c/dec/decode.c:146 DecodeWindowBits) */
  int wbits;
  int is_large = 0;
  if (S) {
    out = S->out;
    memcpy(dist_rb, S->dist_rb, sizeof(dist_rb));
    rb_idx = S->rb_idx;
    br.bitpos = S->bitpos - in_base * 8;
    memcpy(snap_rb, dist_rb, sizeof(snap_rb));
    snap_rbidx = rb_idx;
    snap_out = out.len;
    if (S->out_limit) limit_abs = out.len + S->out_limit;
  }
  if (S && S->header_done) {
    wbits = S->wbits;
    is_large = S->is_large;
    goto header_ready;
  }
  if ((e = br_take(&br, 1, &v))) goto fail;
  if (v == 0) {
    wbits = 16;
  } else {
    if ((e = br_take(&br, 3, &v))) goto fail;
    if (v != 0) {
      wbits = 17 + (int)v;
    } else {
      if ((e = br_take(&br, 3, &v))) goto fail;
      if (v == 1) {
        if (!large_window) { e = ERR_WINDOW_BITS; goto fail; }
        if ((e = br_take(&br, 1, &v))) goto fail;
        if (v) { e = ERR_WINDOW_BITS; goto fail; }
        if ((e = br_take(&br, 6, &v))) goto fail;
        if (v < 10 || v > 30) { e = ERR_WINDOW_BITS; goto fail; }
        wbits = (int)v;
        is_large = 1;
      } else {
        wbits = v ? 8 + (int)v : 17;
      }
    }
  }
  if (S) {
    S->header_done = 1;
    S->wbits = wbits;
    S->is_large = is_large;
  }
header_ready:;
  {
    uint64_t max_backward = ((uint64_t)1 << wbits) - 16;

    if (S && S->mb) {
      /* resume a suspended compressed metablock: adopt the saved
         context (arrays transfer by pointer) and re-enter the
         command loop at the snapshot */
      MbCtx* c = S->mb;
      S->mb = NULL;
      memcpy(bs, c->bs, sizeof(bs));
      npostfix = c->npostfix;
      ndirect = c->ndirect;
      dist_alpha = c->dist_alpha;
      memcpy(ctx_modes, c->ctx_modes, sizeof(ctx_modes));
      lit_trees = c->lit_trees;
      cmd_trees = c->cmd_trees;
      dist_trees = c->dist_trees;
      n_lit_trees = c->n_lit_trees;
      n_cmd_trees = c->n_cmd_trees;
      n_dist_trees = c->n_dist_trees;
      lit_cmap = c->lit_cmap;
      dist_cmap = c->dist_cmap;
      is_last = c->is_last;
      remaining = c->remaining;
      lit_bt = c->lit_bt;
      cmd_bt = c->cmd_bt;
      dist_bt = c->dist_bt;
      pend_insert = c->pend_insert;
      have_cmd = c->have_cmd;
      sym = c->sym;
      copy_len = c->copy_len;
      pend_copy = c->pend_copy;
      pend_dist = c->pend_dist;
      pend_src = c->pend_src;
      pend_kind = c->pend_kind;
      memcpy(pend_word, c->pend_word, sizeof(pend_word));
      free(c);
      goto resume_mb;
    }

    for (;;) { /* metablock loop */
      if (S) { /* commit: ready to read the next metablock */
        S->bitpos = in_base * 8 + br.bitpos;
        S->out = out;
        memcpy(S->dist_rb, dist_rb, sizeof(dist_rb));
        S->rb_idx = rb_idx;
        memcpy(snap_rb, dist_rb, sizeof(snap_rb));
        snap_rbidx = rb_idx;
        snap_out = out.len;
        if (out.len >= limit_abs) { limited = 1; goto fail; }
      }
      if ((e = br_take(&br, 1, &is_last))) goto fail;
      if (is_last) {
        if ((e = br_take(&br, 1, &v))) goto fail;
        if (v) break; /* ISLASTEMPTY */
      }
      uint32_t mnib;
      if ((e = br_take(&br, 2, &mnib))) goto fail;
      if (mnib == 3) { /* metadata */
        if ((e = br_take(&br, 1, &v)) || v) { if (!e) e = ERR_RESERVED; goto fail; }
        uint32_t skip_bytes;
        if ((e = br_take(&br, 2, &skip_bytes))) goto fail;
        uint64_t mlen = 0;
        for (uint32_t i = 0; i < skip_bytes; i++) {
          if ((e = br_take(&br, 8, &v))) goto fail;
          if (i + 1 == skip_bytes && skip_bytes > 1 && v == 0) {
            e = ERR_EXUBERANT_META_NIBBLE; goto fail;
          }
          mlen |= (uint64_t)v << (8 * i);
        }
        if (skip_bytes) mlen += 1;
        /* align + skip */
        if (br.bitpos & 7) {
          if ((e = br_take(&br, (int)(8 - (br.bitpos & 7)), &v))) goto fail;
          if (v) { e = ERR_PADDING_1; goto fail; }
        }
        if (!br_avail(&br, mlen * 8)) { e = ERR_TRUNCATED; goto fail; }
        br.bitpos += mlen * 8;
        if (is_last) break;
        continue;
      }
      uint32_t nibbles = mnib + 4;
      uint64_t mlen = 0;
      for (uint32_t i = 0; i < nibbles; i++) {
        if ((e = br_take(&br, 4, &v))) goto fail;
        if (i + 1 == nibbles && nibbles > 4 && v == 0) {
          e = ERR_EXUBERANT_NIBBLE; goto fail;
        }
        mlen |= (uint64_t)v << (4 * i);
      }
      mlen += 1;
      uint32_t is_uncompressed = 0;
      if (!is_last) {
        if ((e = br_take(&br, 1, &is_uncompressed))) goto fail;
      }
      if (is_uncompressed) {
        if (br.bitpos & 7) {
          if ((e = br_take(&br, (int)(8 - (br.bitpos & 7)), &v))) goto fail;
          if (v) { e = ERR_PADDING_1; goto fail; }
        }
        if (!br_avail(&br, mlen * 8)) { e = ERR_TRUNCATED; goto fail; }
        if ((e = out_reserve(&out, mlen))) goto fail;
        memcpy(out.p + out.len, br.buf + (br.bitpos >> 3), mlen);
        out.len += mlen;
        br.bitpos += mlen * 8;
        continue;
      }

      /* ---- compressed metablock header ---- */
      for (int c = 0; c < 3; c++) {
        if ((e = block_state_init(&bs[c], &br, scratch))) goto fail;
      }
      uint32_t ndirect_raw;
      if ((e = br_take(&br, 2, &npostfix))) goto fail;
      if ((e = br_take(&br, 4, &ndirect_raw))) goto fail;
      ndirect = ndirect_raw << npostfix;
      for (uint32_t i = 0; i < bs[0].num_types; i++) {
        if ((e = br_take(&br, 2, &v))) goto fail;
        ctx_modes[i] = (uint8_t)v;
      }
      size_t lit_cmap_size = (size_t)bs[0].num_types << 6;
      size_t dist_cmap_size = (size_t)bs[2].num_types << 2;
      lit_cmap = (uint8_t*)malloc(lit_cmap_size);
      dist_cmap = (uint8_t*)malloc(dist_cmap_size);
      if (!lit_cmap || !dist_cmap) { e = ERR_ALLOC; goto fail; }
      if ((e = read_context_map(&br, (uint32_t)lit_cmap_size, lit_cmap,
                                &n_lit_trees, scratch))) goto fail;
      if ((e = read_context_map(&br, (uint32_t)dist_cmap_size, dist_cmap,
                                &n_dist_trees, scratch))) goto fail;
      uint32_t maxnbits = is_large ? 62u : 24u;
      dist_alpha = 16 + ndirect + (maxnbits << (npostfix + 1));
      n_cmd_trees = bs[1].num_types;
      lit_trees = (Tree*)malloc(sizeof(Tree) * n_lit_trees);
      cmd_trees = (Tree*)malloc(sizeof(Tree) * n_cmd_trees);
      dist_trees = (Tree*)malloc(sizeof(Tree) * n_dist_trees);
      if (!lit_trees || !cmd_trees || !dist_trees) { e = ERR_ALLOC; goto fail; }
      for (uint32_t i = 0; i < n_lit_trees; i++) {
        if ((e = read_huffman_code(&br, 256, &lit_trees[i], scratch)))
          goto fail;
      }
      for (uint32_t i = 0; i < n_cmd_trees; i++) {
        if ((e = read_huffman_code(&br, 704, &cmd_trees[i], scratch)))
          goto fail;
      }
      for (uint32_t i = 0; i < n_dist_trees; i++) {
        if ((e = read_huffman_code(&br, (int)dist_alpha, &dist_trees[i],
                                   scratch))) goto fail;
      }

      /* ---- command loop ---- */
      lit_bt = cmd_bt = dist_bt = 0;
      remaining = (int64_t)mlen;
      pend_insert = 0;
      have_cmd = 0;
      if (0) {
resume_mb:;
        /* mark the resume point itself as the rollback target: a
           fresh suspension with no usable new input must re-create
           the context, never boundary-rewind into mid-metablock */
        MB_SNAP();
      }
      {
      const uint8_t* lut = kContextLut[ctx_modes[lit_bt]];
      if ((e = out_reserve(&out, (size_t)(remaining > 0 ? remaining
                                                        : 0) + 32)))
        goto fail;
      while (remaining > 0) {
        if (!have_cmd) {
          MB_SNAP(); /* command boundary */
          if (out.len >= limit_abs) { limited = 1; goto fail; }
          if (bs[1].length == 0) {
            if ((e = block_switch(&bs[1], &br, &cmd_bt))) goto fail;
          }
          bs[1].length--;
          if ((e = tree_decode(&cmd_trees[cmd_bt], &br, &sym)))
            goto fail;
  #ifdef PARSE_DEBUG
        fprintf(stderr, "cmd sym=%u bit=%zu\n", sym, br.bitpos);
#endif
        uint64_t insert_len = (uint64_t)kCmdInsertBase[sym];
          if (kCmdInsertExtra[sym]) {
            if ((e = br_take(&br, kCmdInsertExtra[sym], &v))) goto fail;
            insert_len += v;
          }
          copy_len = (uint64_t)kCmdCopyBase[sym];
          if (kCmdCopyExtra[sym]) {
            if ((e = br_take(&br, kCmdCopyExtra[sym], &v))) goto fail;
            copy_len += v;
          }
          pend_insert = insert_len;
          have_cmd = 1;
        }
        /* literals */
        if (pend_insert) {
          int had_insert = 1;
          if ((e = out_reserve(&out, (size_t)pend_insert))) goto fail;
          while (pend_insert > 0) {
            if ((pend_insert & 4095) == 0 || out.len >= limit_abs) {
              MB_SNAP(); /* bounded rework on long runs */
              if (out.len >= limit_abs) { limited = 1; goto fail; }
            }
            if (bs[0].length == 0) {
              if ((e = block_switch(&bs[0], &br, &lit_bt))) goto fail;
              lut = kContextLut[ctx_modes[lit_bt]];
            }
            bs[0].length--;
            uint8_t p1 = out.len >= 1 ? out.p[out.len - 1] : 0;
            uint8_t p2 = out.len >= 2 ? out.p[out.len - 2] : 0;
            uint32_t ctx = (uint32_t)lut[p1] | lut[256 + p2];
            uint32_t lit;
            if ((e = tree_decode(
                     &lit_trees[lit_cmap[(lit_bt << 6) + ctx]], &br,
                     &lit))) goto fail;
            out.p[out.len++] = (uint8_t)lit;
            pend_insert--;
            remaining--;
          }
          (void)had_insert;
          if (remaining <= 0) {
            have_cmd = 0;
            break;
          }
        }
        /* distance (skipped when resuming a limit-split copy whose
           distance was already decoded) */
        if (!pend_copy) {
        uint64_t max_distance =
            (S ? S->out_dropped : 0) + out.len < max_backward
                ? (S ? S->out_dropped : 0) + out.len
                : max_backward;
        int64_t distance;
        int dist_code_zero;
        if (kCmdImplicitDist0[sym]) {
          distance = dist_rb[(rb_idx - 1) & 3];
          dist_code_zero = 1;
        } else {
          if (bs[2].length == 0) {
            if ((e = block_switch(&bs[2], &br, &dist_bt))) goto fail;
          }
          bs[2].length--;
          uint32_t dctx = kCmdDistCtx[sym];
          uint32_t dcode;
          if ((e = tree_decode(
                   &dist_trees[dist_cmap[(dist_bt << 2) + dctx]], &br,
                   &dcode))) goto fail;
          dist_code_zero = (dcode == 0);
          if (dcode < 16) {
            static const int8_t ring[16] = {0, 1, 2, 3, 0, 0, 0, 0,
                                            0, 0, 1, 1, 1, 1, 1, 1};
            static const int8_t delta[16] = {0, 0, 0, 0, -1, 1, -2, 2,
                                             -3, 3, -1, 1, -2, 2, -3, 3};
            distance =
                (int64_t)dist_rb[(rb_idx - 1 - ring[dcode]) & 3] +
                delta[dcode];
            if (distance <= 0) { e = ERR_DISTANCE; goto fail; }
          } else if (dcode < 16 + ndirect) {
            distance = (int64_t)(dcode - 16 + 1);
          } else {
            uint32_t x = dcode - ndirect - 16;
            uint32_t postfix = x & ((1u << npostfix) - 1);
            uint32_t h = x >> npostfix;
            uint32_t nbits = 1 + (h >> 1);
            uint64_t offset = ((uint64_t)(2 + (h & 1)) << nbits) - 4;
            uint32_t extra;
            if ((e = br_take(&br, (int)nbits, &extra))) goto fail;
            distance = (int64_t)(((offset + extra) << npostfix) + postfix +
                                 ndirect + 1);
            if (distance > 0x7FFFFFFCll) { e = ERR_DISTANCE; goto fail; }
          }
        }
        if ((uint64_t)distance > max_distance &&
            (uint64_t)distance <= max_distance + compound_len) {
          /* compound (attached raw) dictionary reference; unlike
             static-dict words these DO push the distance ring
             (parity: decode.c InitializeCompoundDictionaryCopy) */
          uint64_t address = (uint64_t)distance - max_distance - 1;
          size_t start = compound_len - (size_t)(address + 1);
          if (start + copy_len > compound_len) { e = ERR_COMPOUND_DICTIONARY; goto fail; }
          if (!dist_code_zero) {
            dist_rb[rb_idx & 3] = (int32_t)distance;
            rb_idx++;
          }
          pend_copy = copy_len;
          pend_kind = 1;
          pend_src = start;
        } else if ((uint64_t)distance > max_distance) {
          /* static dictionary reference */
          if (copy_len < 4 || copy_len > 24 || !dict) {
            e = ERR_DICTIONARY; goto fail;
          }
          uint32_t nbits_d = kDictSizeBits[copy_len];
          if (!nbits_d) { e = ERR_DICTIONARY; goto fail; }
          /* static-dict address space starts after the compound region */
          uint64_t address =
              (uint64_t)distance - max_distance - 1 - compound_len;
          uint32_t word_idx = (uint32_t)(address & ((1u << nbits_d) - 1));
          uint32_t tid = (uint32_t)(address >> nbits_d);
          if (tid >= 121) { e = ERR_DICTIONARY; goto fail; }
          const uint8_t* word =
              dict + kDictOffsets[copy_len] + (size_t)word_idx * copy_len;
          int wl;
          if (tid == 0) {
            memcpy(pend_word, word, copy_len);
            wl = (int)copy_len;
          } else {
            wl = transform_word(pend_word, word, (int)copy_len,
                                (int)tid);
            if (wl == 0) { e = ERR_TRANSFORM; goto fail; }
          }
          /* emit through the budget-bounded loop (kind 2) so a word
             crossing the output limit splits instead of overshooting */
          pend_copy = (uint64_t)wl;
          pend_kind = 2;
          pend_src = 0;
        } else {
          if (!dist_code_zero) {
            dist_rb[rb_idx & 3] = (int32_t)distance;
            rb_idx++;
          }
          pend_copy = copy_len;
          pend_kind = 0;
          pend_dist = distance;
        }
        } /* !pend_copy */
        /* budget-bounded copy: a single huge copy command (up to
           ~16 MB) splits at the output limit and resumes mid-copy --
           O(limit + window) retained memory for any expansion ratio */
        while (pend_copy) {
          uint64_t take = pend_copy;
          if (out.len + take > limit_abs) {
            take = limit_abs > out.len ? (uint64_t)(limit_abs - out.len)
                                       : 0;
            if (take == 0) { MB_SNAP(); limited = 1; goto fail; }
          }
          if ((e = out_reserve(&out, (size_t)take))) goto fail;
          if (pend_kind == 2) {
            memcpy(out.p + out.len, pend_word + pend_src, (size_t)take);
            pend_src += (size_t)take;
          } else if (pend_kind == 1) {
            memcpy(out.p + out.len, compound + pend_src, (size_t)take);
            pend_src += (size_t)take;
          } else {
            size_t src = out.len - (size_t)pend_dist;
            if (take <= (uint64_t)pend_dist) {
              memcpy(out.p + out.len, out.p + src, (size_t)take);
            } else {
              for (uint64_t i = 0; i < take; i++)
                out.p[out.len + i] = out.p[src + i];
            }
          }
          out.len += (size_t)take;
          remaining -= (int64_t)take;
          pend_copy -= take;
        }
        have_cmd = 0; /* command complete */
      }
      if (remaining < 0) { e = ERR_BLOCK_LENGTH; goto fail; }
      }
      msnap.valid = 0; /* metablock done: boundary commits resume */
      free(lit_trees); free(cmd_trees); free(dist_trees);
      free(lit_cmap); free(dist_cmap);
      lit_trees = cmd_trees = dist_trees = NULL;
      lit_cmap = dist_cmap = NULL;
      if (is_last) break;
    }
  }
  if (S) {
    S->finished = 1;
    S->out = out;
    memcpy(S->dist_rb, dist_rb, sizeof(dist_rb));
    S->rb_idx = rb_idx;
  }
  /* byte-align padding must be zero; no trailing bytes. Streaming
     (!is_final): the padding bits may not have arrived yet -- that is
     not an error (finished is already set), but whole trailing BYTES
     are. Padding errors here are real even mid-stream. */
  if (br.bitpos & 7) {
    if (br_avail(&br, 8 - (br.bitpos & 7))) {
      if ((e = br_take(&br, (int)(8 - (br.bitpos & 7)), &v))) goto hard;
      if (v) { e = ERR_PADDING_1; goto hard; }
    } else if (!S || is_final) {
      e = ERR_TRUNCATED;
      goto hard;
    }
  }
  if (!(S && S->allow_trailing && S->finished) &&
      (((br.bitpos + 7) >> 3) < br.len ||
       (is_final && br.bitpos != br.len * 8))) {
    e = ERR_PADDING_2;
    goto hard;
  }
  if (S) S->bitpos = in_base * 8 + br.bitpos;
  *out_ptr = out.p;
  *out_len = out.len;
  return 0;

fail:
  if (S && (limited ||
            (!is_final && !S->finished &&
             (e == ERR_TRUNCATED || !br_avail(&br, 64))))) {
    /* input exhausted (or failed within the final few bytes where
       truncation cannot be ruled out): suspend and wait for more
       input. Errors raised with plenty of input still unread are
       genuine corruption and stay hard. `limited`: the per-call
       output budget is spent -- suspend identically but report 2
       (more output pending; resumable without new input). */
    if (msnap.valid) {
      /* mid-metablock suspension at the last command/literal-run
         snapshot: persist the metablock context so the retry resumes
         there instead of re-decoding from the metablock start (and
         so the caller may drop all input before the snapshot) */
      MbCtx* c = (MbCtx*)malloc(sizeof(MbCtx));
      if (!c) {
        /* cannot boundary-rewind from a resumed metablock (S->bitpos
           already points mid-metablock); fail hard instead */
        e = ERR_ALLOC;
        goto hard_free;
      }
      memcpy(c->bs, bs, sizeof(bs));
      for (int c_ = 0; c_ < 3; c_++) {
        c->bs[c_].type_rb[0] = msnap.type_rb[c_][0];
        c->bs[c_].type_rb[1] = msnap.type_rb[c_][1];
        c->bs[c_].length = msnap.bs_len[c_];
      }
      c->npostfix = npostfix;
      c->ndirect = ndirect;
      c->dist_alpha = dist_alpha;
      memcpy(c->ctx_modes, ctx_modes, sizeof(ctx_modes));
      c->lit_trees = lit_trees;
      c->cmd_trees = cmd_trees;
      c->dist_trees = dist_trees;
      c->n_lit_trees = n_lit_trees;
      c->n_cmd_trees = n_cmd_trees;
      c->n_dist_trees = n_dist_trees;
      c->lit_cmap = lit_cmap;
      c->dist_cmap = dist_cmap;
      c->is_last = is_last;
      c->remaining = msnap.remaining;
      c->lit_bt = msnap.lit_bt;
      c->cmd_bt = msnap.cmd_bt;
      c->dist_bt = msnap.dist_bt;
      c->pend_insert = msnap.pend_insert;
      c->have_cmd = msnap.have_cmd;
      c->sym = msnap.sym;
      c->copy_len = msnap.copy_len;
      c->pend_copy = msnap.pend_copy;
      c->pend_dist = msnap.pend_dist;
      c->pend_src = msnap.pend_src;
      c->pend_kind = msnap.pend_kind;
      memcpy(c->pend_word, msnap.pend_word, sizeof(c->pend_word));
      S->mb = c;
      out.len = msnap.out_len;
      S->out = out;
      memcpy(S->dist_rb, msnap.dist_rb, sizeof(S->dist_rb));
      S->rb_idx = msnap.rb_idx;
      S->bitpos = in_base * 8 + msnap.bitpos;
      if (!limited) S->last_attempt = in_base + in_len;
      return limited ? 2 : 1;
    }
    free(lit_trees); free(cmd_trees); free(dist_trees);
    free(lit_cmap); free(dist_cmap);
    out.len = snap_out;
    S->out = out;
    memcpy(S->dist_rb, snap_rb, sizeof(snap_rb));
    S->rb_idx = snap_rbidx;
    if (!limited) S->last_attempt = in_base + in_len;
    return limited ? 2 : 1;
  }
hard_free:
  free(lit_trees); free(cmd_trees); free(dist_trees);
  free(lit_cmap); free(dist_cmap);
hard:
  free(out.p);
  if (S) {
    S->out.p = NULL;
    S->out.len = S->out.cap = 0;
    mbctx_free(S->mb);
    S->mb = NULL;
  }
  return e ? e : ERR_FORMAT;
}

/* ---------- deferred symbol parse (device-decode front end) ----------
 *
 * Role: c/dec/decode.c:2401 ProcessCommands re-split per SURVEY §7
 * step 2 -- the inherently bit-serial symbol parse runs HERE at
 * native speed while the byte movement (the LZ copy graph) resolves
 * on the device (ops/lz_resolve.py log-step pointer doubling). The
 * parse emits (literal-run, copy-len, distance) commands plus the
 * raw literal stream; dictionary words and uncompressed blocks fold
 * in as pre-resolved literal runs.
 *
 * Context-modeled literal trees need only the two previous OUTPUT
 * bytes (RFC 7932 7.1); after a copy those are its trailing bytes,
 * resolved by chasing the command graph with a memo (the python
 * decoder's _dz_byte_at role) -- overlapping/RLE copies collapse in
 * one modulo jump, so each chase is O(commands crossed) amortized
 * O(1) with the memo. */

typedef struct {
  uint8_t* lits;
  size_t nlit, lit_cap;
  uint32_t *cn, *cc, *cd; /* per command: lit run, copy len, dist */
  size_t ncmd, cmd_cap;
  uint64_t *ends, *lstarts; /* cumulative indexes for the chase */
  uint64_t out_total;
  uint64_t lit_run; /* literals since the last copy */
  uint64_t* mk;     /* memo keys: pos + 1 (0 = empty) */
  uint8_t* mv;
} DeferP;

#define DZ_MBITS 18

static int defer_lit_reserve(DeferP* P, size_t extra) {
  if (P->nlit + extra <= P->lit_cap) return 0;
  size_t nc = P->lit_cap ? P->lit_cap * 2 : 1 << 16;
  while (nc < P->nlit + extra) nc *= 2;
  uint8_t* np = (uint8_t*)realloc(P->lits, nc);
  if (!np) return ERR_ALLOC;
  P->lits = np;
  P->lit_cap = nc;
  return 0;
}

static int defer_push_copy(DeferP* P, uint64_t cpy, uint64_t dist) {
  if (P->ncmd == P->cmd_cap) {
    size_t nc = P->cmd_cap ? P->cmd_cap * 2 : 1 << 12;
    uint32_t* a = (uint32_t*)realloc(P->cn, nc * 4);
    uint32_t* b = (uint32_t*)realloc(P->cc, nc * 4);
    uint32_t* c = (uint32_t*)realloc(P->cd, nc * 4);
    uint64_t* d = (uint64_t*)realloc(P->ends, nc * 8);
    uint64_t* f = (uint64_t*)realloc(P->lstarts, nc * 8);
    if (a) P->cn = a;
    if (b) P->cc = b;
    if (c) P->cd = c;
    if (d) P->ends = d;
    if (f) P->lstarts = f;
    if (!a || !b || !c || !d || !f) return ERR_ALLOC;
    P->cmd_cap = nc;
  }
  P->cn[P->ncmd] = (uint32_t)P->lit_run;
  P->cc[P->ncmd] = (uint32_t)cpy;
  P->cd[P->ncmd] = (uint32_t)dist;
  P->lstarts[P->ncmd] = P->nlit - P->lit_run;
  P->out_total += P->lit_run + cpy;
  P->ends[P->ncmd] = P->out_total;
  P->ncmd++;
  P->lit_run = 0;
  return 0;
}

/* output byte at virtual position pos, via the copy graph + memo */
static uint8_t defer_byte(DeferP* P, uint64_t pos) {
  uint64_t chain[64];
  int nchain = 0;
  uint8_t b = 0;
  for (;;) {
    size_t slot = (size_t)((pos * 0x9E3779B97F4A7C15ull) >>
                           (64 - DZ_MBITS));
    if (P->mk[slot] == pos + 1) {
      b = P->mv[slot];
      break;
    }
    /* binary search: first command whose end exceeds pos */
    size_t lo = 0, hi = P->ncmd;
    while (lo < hi) {
      size_t mid = (lo + hi) >> 1;
      if (P->ends[mid] <= pos) lo = mid + 1;
      else hi = mid;
    }
    uint64_t base = lo ? P->ends[lo - 1] : 0;
    uint64_t off = pos - base;
    uint32_t nl = P->cn[lo];
    if (off < nl) {
      b = P->lits[P->lstarts[lo] + off];
      break;
    }
    if (nchain < 64) chain[nchain++] = pos;
    uint64_t j = off - nl;
    uint64_t d = P->cd[lo];
    pos = base + nl + (j % d) - d;
  }
  for (int i = 0; i < nchain; i++) {
    uint64_t p2 = chain[i];
    size_t slot = (size_t)((p2 * 0x9E3779B97F4A7C15ull) >>
                           (64 - DZ_MBITS));
    P->mk[slot] = p2 + 1;
    P->mv[slot] = b;
  }
  return b;
}

int btpu_parse_stream(const uint8_t* in, size_t in_len,
                      const uint8_t* dict, int large_window,
                      uint8_t** out_lits, size_t* out_nlit,
                      uint32_t** out_cn, uint32_t** out_cc,
                      uint32_t** out_cd, size_t* out_ncmd,
                      uint32_t* out_max_depth) {
  BitReader br = {in, in_len, 0};
  int e = 0;
  uint32_t v;
  DeferP P;
  memset(&P, 0, sizeof(P));
  P.mk = (uint64_t*)calloc((size_t)1 << DZ_MBITS, 8);
  P.mv = (uint8_t*)calloc((size_t)1 << DZ_MBITS, 1);
  Tree* lit_trees = NULL;
  Tree* cmd_trees = NULL;
  Tree* dist_trees = NULL;
  uint8_t* lit_cmap = NULL;
  uint8_t* dist_cmap = NULL;
  uint8_t scratch[1200];
  int32_t dist_rb[4] = {16, 15, 11, 4};
  int rb_idx = 0;
  uint8_t p1 = 0, p2 = 0;
  BlockState bs[3];
  uint8_t ctx_modes[256];
  if (!P.mk || !P.mv) { e = ERR_ALLOC; goto fail; }

  int wbits;
  int is_large = 0;
  if ((e = br_take(&br, 1, &v))) goto fail;
  if (v == 0) {
    wbits = 16;
  } else {
    if ((e = br_take(&br, 3, &v))) goto fail;
    if (v != 0) {
      wbits = 17 + (int)v;
    } else {
      if ((e = br_take(&br, 3, &v))) goto fail;
      if (v == 1) {
        if (!large_window) { e = ERR_WINDOW_BITS; goto fail; }
        if ((e = br_take(&br, 1, &v)) || v) { if (!e) e = ERR_WINDOW_BITS; goto fail; }
        if ((e = br_take(&br, 6, &v))) goto fail;
        if (v < 10 || v > 30) { e = ERR_WINDOW_BITS; goto fail; }
        wbits = (int)v;
        is_large = 1;
      } else {
        wbits = v ? 8 + (int)v : 17;
      }
    }
  }
  {
    uint64_t max_backward = ((uint64_t)1 << wbits) - 16;
    uint32_t is_last = 0;
    for (;;) { /* metablock loop */
      if ((e = br_take(&br, 1, &is_last))) goto fail;
      if (is_last) {
        if ((e = br_take(&br, 1, &v))) goto fail;
        if (v) break; /* ISLASTEMPTY */
      }
      uint32_t mnib;
      if ((e = br_take(&br, 2, &mnib))) goto fail;
      if (mnib == 3) { /* metadata: skip */
        if ((e = br_take(&br, 1, &v)) || v) { if (!e) e = ERR_RESERVED; goto fail; }
        uint32_t skip_bytes;
        if ((e = br_take(&br, 2, &skip_bytes))) goto fail;
        uint64_t mlen = 0;
        for (uint32_t i = 0; i < skip_bytes; i++) {
          if ((e = br_take(&br, 8, &v))) goto fail;
          if (i + 1 == skip_bytes && skip_bytes > 1 && v == 0) {
            e = ERR_EXUBERANT_META_NIBBLE; goto fail;
          }
          mlen |= (uint64_t)v << (8 * i);
        }
        if (skip_bytes) mlen += 1;
        if (br.bitpos & 7) {
          if ((e = br_take(&br, (int)(8 - (br.bitpos & 7)), &v))) goto fail;
          if (v) { e = ERR_PADDING_1; goto fail; }
        }
        if (!br_avail(&br, mlen * 8)) { e = ERR_TRUNCATED; goto fail; }
        br.bitpos += mlen * 8;
        if (is_last) break;
        continue;
      }
      uint32_t nibbles = mnib + 4;
      uint64_t mlen = 0;
      for (uint32_t i = 0; i < nibbles; i++) {
        if ((e = br_take(&br, 4, &v))) goto fail;
        if (i + 1 == nibbles && nibbles > 4 && v == 0) {
          e = ERR_EXUBERANT_NIBBLE; goto fail;
        }
        mlen |= (uint64_t)v << (4 * i);
      }
      mlen += 1;
      uint32_t is_uncompressed = 0;
      if (!is_last) {
        if ((e = br_take(&br, 1, &is_uncompressed))) goto fail;
      }
      if (is_uncompressed) {
        if (br.bitpos & 7) {
          if ((e = br_take(&br, (int)(8 - (br.bitpos & 7)), &v))) goto fail;
          if (v) { e = ERR_PADDING_1; goto fail; }
        }
        if (!br_avail(&br, mlen * 8)) { e = ERR_TRUNCATED; goto fail; }
        if ((e = defer_lit_reserve(&P, mlen))) goto fail;
        memcpy(P.lits + P.nlit, br.buf + (br.bitpos >> 3), mlen);
        P.nlit += mlen;
        P.lit_run += mlen;
        p2 = mlen >= 2 ? P.lits[P.nlit - 2] : (mlen == 1 ? p1 : p2);
        p1 = P.lits[P.nlit - 1];
        br.bitpos += mlen * 8;
        continue;
      }

      for (int c = 0; c < 3; c++) {
        if ((e = block_state_init(&bs[c], &br, scratch))) goto fail;
      }
      uint32_t npostfix, ndirect_raw, ndirect;
      if ((e = br_take(&br, 2, &npostfix))) goto fail;
      if ((e = br_take(&br, 4, &ndirect_raw))) goto fail;
      ndirect = ndirect_raw << npostfix;
      for (uint32_t i = 0; i < bs[0].num_types; i++) {
        if ((e = br_take(&br, 2, &v))) goto fail;
        ctx_modes[i] = (uint8_t)v;
      }
      size_t lit_cmap_size = (size_t)bs[0].num_types << 6;
      size_t dist_cmap_size = (size_t)bs[2].num_types << 2;
      uint32_t n_lit_trees = 0, n_cmd_trees = bs[1].num_types;
      uint32_t n_dist_trees = 0;
      lit_cmap = (uint8_t*)malloc(lit_cmap_size);
      dist_cmap = (uint8_t*)malloc(dist_cmap_size);
      if (!lit_cmap || !dist_cmap) { e = ERR_ALLOC; goto fail; }
      if ((e = read_context_map(&br, (uint32_t)lit_cmap_size, lit_cmap,
                                &n_lit_trees, scratch))) goto fail;
      if ((e = read_context_map(&br, (uint32_t)dist_cmap_size, dist_cmap,
                                &n_dist_trees, scratch))) goto fail;
      uint32_t maxnbits = is_large ? 62u : 24u;
      uint32_t dist_alpha = 16 + ndirect + (maxnbits << (npostfix + 1));
      lit_trees = (Tree*)malloc(sizeof(Tree) * n_lit_trees);
      cmd_trees = (Tree*)malloc(sizeof(Tree) * n_cmd_trees);
      dist_trees = (Tree*)malloc(sizeof(Tree) * n_dist_trees);
      if (!lit_trees || !cmd_trees || !dist_trees) { e = ERR_ALLOC; goto fail; }
      for (uint32_t i = 0; i < n_lit_trees; i++)
        if ((e = read_huffman_code(&br, 256, &lit_trees[i], scratch)))
          goto fail;
      for (uint32_t i = 0; i < n_cmd_trees; i++)
        if ((e = read_huffman_code(&br, 704, &cmd_trees[i], scratch)))
          goto fail;
      for (uint32_t i = 0; i < n_dist_trees; i++)
        if ((e = read_huffman_code(&br, (int)dist_alpha, &dist_trees[i],
                                   scratch))) goto fail;

      uint32_t lit_bt = 0, cmd_bt = 0, dist_bt = 0;
      int64_t remaining = (int64_t)mlen;
      const uint8_t* lut = kContextLut[ctx_modes[lit_bt]];
      if ((e = defer_lit_reserve(&P, (size_t)remaining + 32))) goto fail;
      while (remaining > 0) {
        if (bs[1].length == 0) {
          if ((e = block_switch(&bs[1], &br, &cmd_bt))) goto fail;
        }
        bs[1].length--;
        uint32_t sym;
        if ((e = tree_decode(&cmd_trees[cmd_bt], &br, &sym))) goto fail;
#ifdef PARSE_DEBUG
        fprintf(stderr, "cmd sym=%u bit=%zu\n", sym, br.bitpos);
#endif
        uint64_t insert_len = (uint64_t)kCmdInsertBase[sym];
        if (kCmdInsertExtra[sym]) {
          if ((e = br_take(&br, kCmdInsertExtra[sym], &v))) goto fail;
          insert_len += v;
        }
        uint64_t copy_len = (uint64_t)kCmdCopyBase[sym];
        if (kCmdCopyExtra[sym]) {
          if ((e = br_take(&br, kCmdCopyExtra[sym], &v))) goto fail;
          copy_len += v;
        }
        for (uint64_t i = 0; i < insert_len; i++) {
          if (bs[0].length == 0) {
            if ((e = block_switch(&bs[0], &br, &lit_bt))) goto fail;
            lut = kContextLut[ctx_modes[lit_bt]];
          }
          bs[0].length--;
          uint32_t ctx = (uint32_t)lut[p1] | lut[256 + p2];
          uint32_t lit;
          if ((e = tree_decode(
                   &lit_trees[lit_cmap[(lit_bt << 6) + ctx]], &br,
                   &lit))) goto fail;
#ifdef PARSE_DEBUG
          fprintf(stderr, "L %zu ctx=%u p1=%u p2=%u lit=%u\n",
                  (size_t)(P.out_total + P.lit_run), ctx, p1, p2, lit);
#endif
          P.lits[P.nlit++] = (uint8_t)lit;
          P.lit_run++;
          p2 = p1;
          p1 = (uint8_t)lit;
          remaining--;
        }
        if (remaining <= 0) break;
        uint64_t max_distance =
            P.out_total + P.lit_run < max_backward
                ? P.out_total + P.lit_run : max_backward;
        int64_t distance;
        int dist_code_zero;
        if (kCmdImplicitDist0[sym]) {
          distance = dist_rb[(rb_idx - 1) & 3];
          dist_code_zero = 1;
        } else {
          if (bs[2].length == 0) {
            if ((e = block_switch(&bs[2], &br, &dist_bt))) goto fail;
          }
          bs[2].length--;
          uint32_t dctx = kCmdDistCtx[sym];
          uint32_t dcode;
          if ((e = tree_decode(
                   &dist_trees[dist_cmap[(dist_bt << 2) + dctx]], &br,
                   &dcode))) goto fail;
          dist_code_zero = (dcode == 0);
          if (dcode < 16) {
            static const int8_t ring[16] = {0, 1, 2, 3, 0, 0, 0, 0,
                                            0, 0, 1, 1, 1, 1, 1, 1};
            static const int8_t delta[16] = {0, 0, 0, 0, -1, 1, -2, 2,
                                             -3, 3, -1, 1, -2, 2, -3, 3};
            distance =
                (int64_t)dist_rb[(rb_idx - 1 - ring[dcode]) & 3] +
                delta[dcode];
            if (distance <= 0) { e = ERR_DISTANCE; goto fail; }
          } else if (dcode < 16 + ndirect) {
            distance = (int64_t)(dcode - 16 + 1);
          } else {
            uint32_t x = dcode - ndirect - 16;
            uint32_t postfix = x & ((1u << npostfix) - 1);
            uint32_t h = x >> npostfix;
            uint32_t nbits = 1 + (h >> 1);
            uint64_t offset = ((uint64_t)(2 + (h & 1)) << nbits) - 4;
            uint32_t extra;
            if ((e = br_take(&br, (int)nbits, &extra))) goto fail;
            distance = (int64_t)(((offset + extra) << npostfix) +
                                 postfix + ndirect + 1);
            if (distance > 0x7FFFFFFCll) { e = ERR_DISTANCE; goto fail; }
          }
        }
        if ((uint64_t)distance > max_distance) {
          /* static dictionary word: expand to a literal run (the
             device path's pre-resolved bytes); compound dictionaries
             route to the host decoder instead */
          if (copy_len < 4 || copy_len > 24 || !dict) {
            e = ERR_DICTIONARY; goto fail;
          }
          uint32_t nbits_d = kDictSizeBits[copy_len];
          if (!nbits_d) { e = ERR_DICTIONARY; goto fail; }
          uint64_t address = (uint64_t)distance - max_distance - 1;
          uint32_t word_idx =
              (uint32_t)(address & ((1u << nbits_d) - 1));
          uint32_t tid = (uint32_t)(address >> nbits_d);
          if (tid >= 121) { e = ERR_DICTIONARY; goto fail; }
          const uint8_t* word = dict + kDictOffsets[copy_len] +
                                (size_t)word_idx * copy_len;
          uint8_t wbuf[40];
          int wl;
          if (tid == 0) {
            memcpy(wbuf, word, copy_len);
            wl = (int)copy_len;
          } else {
            wl = transform_word(wbuf, word, (int)copy_len, (int)tid);
            if (wl == 0) { e = ERR_TRANSFORM; goto fail; }
          }
          if ((e = defer_lit_reserve(&P, (size_t)wl))) goto fail;
          memcpy(P.lits + P.nlit, wbuf, wl);
          P.nlit += wl;
          P.lit_run += wl;
          p2 = wl >= 2 ? wbuf[wl - 2] : p1;
          p1 = wbuf[wl - 1];
          /* mlen counts OUTPUT bytes: a transformed word's length can
             differ from the command's copy_len */
          remaining -= wl;
        } else {
          if (!dist_code_zero) {
            dist_rb[rb_idx & 3] = (int32_t)distance;
            rb_idx++;
          }
          if ((e = defer_push_copy(&P, copy_len, (uint64_t)distance)))
            goto fail;
          remaining -= copy_len;
          p1 = defer_byte(&P, P.out_total - 1);
          p2 = defer_byte(&P, P.out_total - 2);
        }
        if (remaining < 0) { e = ERR_BLOCK_LENGTH; goto fail; }
      }
      free(lit_cmap); free(dist_cmap); lit_cmap = dist_cmap = NULL;
      free(lit_trees); free(cmd_trees); free(dist_trees);
      lit_trees = cmd_trees = dist_trees = NULL;
      if (is_last) break;
    }
  }
  /* stream padding */
  if (br.bitpos & 7) {
    if ((e = br_take(&br, (int)(8 - (br.bitpos & 7)), &v))) goto fail;
    if (v) { e = ERR_PADDING_2; goto fail; }
  }
  /* trailing literal-only command */
  if (P.lit_run || P.ncmd == 0) {
    if ((e = defer_push_copy(&P, 0, 0))) goto fail;
  }
  /* copy-chain depth: the device resolver's pointer doubling needs
     ceil(log2(max_depth)) gather steps, and a fixed worst-case 24
     was 3x the typical need (measured 7.7 s -> the gathers dominate
     the tunnel path). One linear pass: depth = 0 for literals,
     depth[src] + 1 for copied bytes. */
  if (out_max_depth) {
    uint32_t mx = 0;
    uint32_t* dep = (uint32_t*)malloc(P.out_total * 4);
    if (dep) {
      uint64_t pos = 0;
      for (size_t k = 0; k < P.ncmd; k++) {
        for (uint32_t i = 0; i < P.cn[k]; i++) dep[pos++] = 0;
        uint64_t d = P.cd[k];
        for (uint32_t i = 0; i < P.cc[k]; i++) {
          uint32_t v2 = dep[pos - d] + 1;
          dep[pos++] = v2;
          if (v2 > mx) mx = v2;
        }
      }
      free(dep);
      *out_max_depth = mx;
    } else {
      *out_max_depth = 0xFFFFFFFFu; /* unknown: caller uses worst case */
    }
  }
  free(P.mk); free(P.mv); free(P.ends); free(P.lstarts);
  *out_lits = P.lits;
  *out_nlit = P.nlit;
  *out_cn = P.cn;
  *out_cc = P.cc;
  *out_cd = P.cd;
  *out_ncmd = P.ncmd;
  return 0;
fail:
  free(P.lits); free(P.cn); free(P.cc); free(P.cd);
  free(P.ends); free(P.lstarts); free(P.mk); free(P.mv);
  free(lit_cmap); free(dist_cmap);
  free(lit_trees); free(cmd_trees); free(dist_trees);
  return e ? e : ERR_FORMAT;
}

int btpu_decode_ex(const uint8_t* in, size_t in_len, const uint8_t* dict,
                   const uint8_t* compound, size_t compound_len,
                   int large_window, uint8_t** out_ptr, size_t* out_len) {
  return btpu_decode_impl(in, in_len, 0, dict, compound, compound_len,
                          large_window, 1, NULL, out_ptr, out_len);
}

/* ---------- chunked decode driver ---------- */

void* btpu_dec_new(void) {
  DecStream* S = (DecStream*)calloc(1, sizeof(DecStream));
  if (S) { /* RFC 7932 initial distance ring */
    S->dist_rb[0] = 16;
    S->dist_rb[1] = 15;
    S->dist_rb[2] = 11;
    S->dist_rb[3] = 4;
  }
  return S;
}

/* Feed the UNCONSUMED input tail (absolute stream offset in_base;
   the caller may drop bytes before btpu_dec_consumed()); returns 0
   (ok; *new_len bytes of fresh output), 1 (need more input), or a
   negative error. An incomplete metablock is re-attempted whenever
   new input arrives (work per attempt is bounded by the pending
   metablock; very small chunks pay proportionally more rework).
   Retained output is trimmed to the window once delivered. */
int btpu_dec_chunk(void* st, const uint8_t* in_tail, size_t in_len,
                   size_t in_base, const uint8_t* dict,
                   const uint8_t* compound, size_t compound_len,
                   int large_window, int is_final,
                   uint8_t** new_ptr, size_t* new_len) {
  DecStream* S = (DecStream*)st;
  *new_ptr = NULL;
  *new_len = 0;
  if (!S) return ERR_FORMAT;
  if (in_base * 8 > S->bitpos) return ERR_FORMAT; /* dropped too much */
  if (S->finished) {
    if (!S->allow_trailing &&
        in_base + in_len > ((S->bitpos + 7) >> 3))
      return ERR_PADDING_2;
    return 0;
  }
  if (!is_final && S->last_attempt &&
      in_base + in_len <= S->last_attempt)
    return 1; /* no new input since the last incomplete attempt */
  /* window-bounded retention: bytes DELIVERED on earlier calls and
     beyond the LZ window can go (back-references never reach past
     1 << wbits; trimming happens before decoding so pointers returned
     by the previous call stayed valid until now) */
  if (S->header_done) {
    size_t window = (size_t)1 << S->wbits;
    size_t keep = S->out.len > window ? window : S->out.len;
    size_t cut = S->out.len - keep;
    if (cut > S->delivered) cut = S->delivered;
    if (cut > (1u << 18)) { /* amortize the memmove */
      memmove(S->out.p, S->out.p + cut, S->out.len - cut);
      S->out.len -= cut;
      S->delivered -= cut;
      S->out_dropped += cut;
    }
  }
  uint8_t* p = NULL;
  size_t n = 0;
  int rc = btpu_decode_impl(in_tail, in_len, in_base, dict, compound,
                            compound_len, large_window, is_final, S,
                            &p, &n);
  if (rc < 0) return rc;
  if (rc == 0) S->last_attempt = 0;
  if (S->out.len > S->delivered) {
    *new_ptr = S->out.p + S->delivered;
    *new_len = S->out.len - S->delivered;
    S->delivered = S->out.len;
  }
  return rc;
}

/* Absolute count of fully-consumed input bytes: the caller may drop
   this prefix and feed tails with in_base = consumed. */
size_t btpu_dec_consumed(void* st) {
  DecStream* S = (DecStream*)st;
  return S ? S->bitpos >> 3 : 0;
}

/* brcat / -K mode: input bytes beyond the stream end belong to the
   NEXT concatenated stream (btpu_dec_consumed() marks the boundary)
   instead of being padding garbage. */
void btpu_dec_allow_trailing(void* st, int v) {
  DecStream* S = (DecStream*)st;
  if (S) S->allow_trailing = v;
}

/* Output back-pressure (python/_brotli.c output_buffer_limit role,
   1.2.0 SECURITY change): cap NEW output bytes per btpu_dec_chunk
   call. At the cap the decoder SUSPENDS (rc 2) -- it does not keep
   expanding fed input -- and a later call (no new input needed)
   resumes mid-metablock, even mid-copy-command. 0 = unlimited. */
void btpu_dec_set_output_limit(void* st, size_t limit) {
  DecStream* S = (DecStream*)st;
  if (S) S->out_limit = limit;
}

/* Introspection: bytes currently retained in the output buffer
   (delivered-but-windowed + undelivered). Memory-bound tests assert
   this stays O(limit + window) under output back-pressure. */
size_t btpu_dec_retained(void* st) {
  DecStream* S = (DecStream*)st;
  return S ? S->out.len : 0;
}

int btpu_dec_finished(void* st) {
  DecStream* S = (DecStream*)st;
  return S && S->finished;
}

void btpu_dec_free(void* st) {
  DecStream* S = (DecStream*)st;
  if (!S) return;
  mbctx_free(S->mb);
  free(S->out.p);
  free(S);
}

int btpu_decode(const uint8_t* in, size_t in_len, const uint8_t* dict,
                uint8_t** out_ptr, size_t* out_len) {
  return btpu_decode_ex(in, in_len, dict, NULL, 0, 0, out_ptr, out_len);
}

void btpu_free(uint8_t* p) { free(p); }

int btpu_version(void) { return 10; }
