/* fastinflate — native DEFLATE decoder for flate_tpu's host path.
 *
 * Semantics are bit-exact with the Python specification decoder
 * (flate_tpu/inflate.py), which itself mirrors the reference's strict
 * error taxonomy (/root/reference/src/flate/inflate.zig,
 * huffman_decoder.zig): the same fuzz corpus must produce the same error
 * class or the same bytes through either decoder — tests pin this.
 *
 * Error codes (mapped back to flate_tpu.errors by the ctypes wrapper):
 *   0 ok   1 EndOfStream       2 InvalidCode      3 InvalidMatch
 *   4 InvalidBlockType         5 WrongStoredBlockNlen
 *   6 InvalidDynamicBlockHeader 7 OversubscribedHuffmanTree
 *   8 IncompleteHuffmanTree    9 MissingEndOfBlockCode
 *  -1 output buffer too small (caller grows and retries)
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

#define ERR_EOS 1
#define ERR_CODE 2
#define ERR_MATCH 3
#define ERR_BTYPE 4
#define ERR_NLEN 5
#define ERR_DYN 6
#define ERR_OVER 7
#define ERR_INCOMPLETE 8
#define ERR_NOEOB 9
#define ERR_OUT (-1)

typedef struct {
    const uint8_t *in;
    size_t in_len;
    uint64_t buf;       /* LSB-first bit buffer */
    int nbits;          /* valid bits in buf */
    size_t pos;         /* next input byte */
} BitReader;

static void br_init(BitReader *br, const uint8_t *in, size_t in_len,
                    size_t start_bit) {
    br->in = in;
    br->in_len = in_len;
    br->pos = start_bit >> 3;
    br->buf = 0;
    br->nbits = 0;
    int skip = (int)(start_bit & 7);
    if (skip && br->pos < in_len) {
        br->buf = (uint64_t)in[br->pos++] >> skip;
        br->nbits = 8 - skip;
    }
}

static inline void br_fill(BitReader *br) {
    /* the slow path below (and rebase-after-append resumption) can
     * leave nbits at up to 64; the fast path's shift math is only
     * valid for nbits < 56, so bail when already full enough */
    if (br->nbits >= 56)
        return;
    if (br->pos + 8 <= br->in_len) {
        /* one unaligned 8-byte load; mask back to the credited count so
         * bits above nbits stay zero (the stored-block paths advance
         * `pos` without the bit buffer and rely on that invariant) */
        uint64_t v;
        memcpy(&v, br->in + br->pos, 8);
        int take = (63 - br->nbits) >> 3;
        br->buf |= v << br->nbits;
        br->nbits += take * 8;
        br->pos += take;
        if (br->nbits < 64)
            br->buf &= ((uint64_t)1 << br->nbits) - 1;
        return;
    }
    while (br->nbits <= 56 && br->pos < br->in_len) {
        br->buf |= (uint64_t)br->in[br->pos++] << br->nbits;
        br->nbits += 8;
    }
}

/* peek n (<=32) bits zero-padded past the end */
static inline uint32_t br_peek(BitReader *br, int n) {
    if (br->nbits < n) br_fill(br);
    return (uint32_t)(br->buf & ((1u << n) - 1));
}

/* consume n bits; returns 0 ok, ERR_EOS if the stream is exhausted */
static inline int br_consume(BitReader *br, int n) {
    if (br->nbits < n) br_fill(br);
    if (br->nbits < n) return ERR_EOS;
    br->buf >>= n;
    br->nbits -= n;
    return 0;
}

static inline int br_read(BitReader *br, int n, uint32_t *v) {
    *v = br_peek(br, n);
    return br_consume(br, n);
}

/* current absolute bit position */
static inline size_t br_bitpos(BitReader *br) {
    return br->pos * 8 - (size_t)br->nbits;
}

static void br_align(BitReader *br) {
    int drop = br->nbits & 7;
    br->buf >>= drop;
    br->nbits -= drop;
}

/* ------------------------------------------------------------------ */
/* decode tables.
 *
 * 15-bit decoders (litlen, dist) are two-level for L1 residency: a
 * 1024-entry u32 primary indexed by the low 10 code bits; codes longer
 * than 10 bits spill through pointer entries (bit 31) into u32
 * sub-tables.  Terminal entries are PRESHIFTED so the hot loop never
 * touches the RFC base/extra arrays or branches on symbol ranges:
 *
 *   litlen literal:  LIT_FLAG | byte<<16            | codelen
 *   litlen lit-pair: LIT_FLAG | LIT2_FLAG | b1<<16 | len1<<24 | b2<<8
 *                    | (len1+len2)   (two short literals, ONE lookup —
 *                    a post-pass packs primary slots whose upper bits
 *                    spell a second full literal code, libdeflate-style)
 *   litlen EOB:      EOB_FLAG                       | codelen
 *   litlen length:   LBASE<<16 | LEXTRA<<4          | codelen
 *   dist:            DBASE<<16 | DEXTRA<<4          | codelen
 *   invalid (286/287, dist 30/31, missing code): 0
 *
 * so `val = (e>>16) + ((buf >> (e&15)) & mask((e>>4)&15))` and the
 * whole code+extra consumes in one shift.  The 7-bit codegen decoder
 * stays a flat u16 (sym<<4|len) table.  0 = invalid. */

#define PTR_FLAG 0x80000000u
#define LIT_FLAG 0x40000000u
#define EOB_FLAG 0x20000000u
#define LIT2_FLAG 0x10000000u
#define PRIMARY_BITS 10
#define PRIMARY_SIZE (1u << PRIMARY_BITS)

/* RFC 1951 base/extra tables (build-time only; decode reads entries) */
static const uint16_t LBASE[29] = {3,4,5,6,7,8,9,10,11,13,15,17,19,23,27,31,
    35,43,51,59,67,83,99,115,131,163,195,227,258};
static const uint8_t LEXTRA[29] = {0,0,0,0,0,0,0,0,1,1,1,1,2,2,2,2,
    3,3,3,3,4,4,4,4,5,5,5,5,0};
static const uint16_t DBASE[30] = {1,2,3,4,5,7,9,13,17,25,33,49,65,97,129,193,
    257,385,513,769,1025,1537,2049,3073,4097,6145,8193,12289,16385,24577};
static const uint8_t DEXTRA[30] = {0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,6,
    7,7,8,8,9,9,10,10,11,11,12,12,13,13};

static uint32_t make_entry(int s, int l, int is_litlen) {
    if (is_litlen) {
        if (s < 256) return LIT_FLAG | ((uint32_t)s << 16) | (uint32_t)l;
        if (s == 256) return EOB_FLAG | (uint32_t)l;
        if (s > 285) return 0;
        int li = s - 257;
        return ((uint32_t)LBASE[li] << 16) | ((uint32_t)LEXTRA[li] << 4)
            | (uint32_t)l;
    }
    if (s > 29) return 0;
    return ((uint32_t)DBASE[s] << 16) | ((uint32_t)DEXTRA[s] << 4)
        | (uint32_t)l;
}

static uint32_t rev_bits(uint32_t code, int len) {
    uint32_t r = 0;
    for (int i = 0; i < len; i++) {
        r = (r << 1) | (code & 1);
        code >>= 1;
    }
    return r;
}

/* shared validity checks; returns 0 ok or error; fills count[] and maxl */
static int check_lens(const uint8_t *lens, int n, int max_bits,
                      int is_litlen, int *count, int *maxl_out) {
    int maxl = 0;
    if (is_litlen && lens[256] == 0) return ERR_NOEOB;
    for (int i = 0; i < n; i++) {
        if (lens[i]) {
            count[lens[i]]++;
            if (lens[i] > maxl) maxl = lens[i];
        }
    }
    *maxl_out = maxl;
    if (maxl == 0) return 0;
    long left = 1;
    for (int l = 1; l <= max_bits; l++) {
        left <<= 1;
        if (count[l] > left) return ERR_OVER;
        left -= count[l];
    }
    if (left > 0) {
        /* incomplete ok only for 15-bit decoders in the single
         * length-1-code form (huffman_decoder.zig:126-153) */
        if (!(max_bits > 7 && maxl == count[1]))
            return ERR_INCOMPLETE;
    }
    return 0;
}

/* flat table (7-bit codegen decoder) */
static int build_table(const uint8_t *lens, int n, int max_bits,
                       int is_litlen, uint16_t *tbl) {
    int count[16] = {0};
    int maxl;
    int rc = check_lens(lens, n, max_bits, is_litlen, count, &maxl);
    size_t tsize = (size_t)1 << max_bits;
    memset(tbl, 0, tsize * sizeof(uint16_t));
    if (rc || maxl == 0) return rc;
    uint32_t next_code[16] = {0};
    uint32_t code = 0;
    for (int l = 1; l <= maxl; l++) {
        code = (code + (uint32_t)count[l - 1]) << 1;
        next_code[l] = code;
    }
    for (int s = 0; s < n; s++) {
        int l = lens[s];
        if (!l) continue;
        uint32_t r = rev_bits(next_code[l]++, l);
        size_t step = (size_t)1 << l;
        uint16_t e = (uint16_t)((s << 4) | l);
        for (size_t i = r; i < tsize; i += step)
            tbl[i] = e;
    }
    return 0;
}

/* Post-pass: pack two short literals into one primary entry.  Slot i
 * holds literal s1 (len l1 <= PRIMARY_BITS); its upper PRIMARY_BITS-l1
 * bits fully determine a second code iff that code's length fits the
 * remaining bits — then one lookup decodes both.  Reads from a snapshot
 * so already-packed entries are never re-read as singles. */
static void pack_pairs(uint32_t *t1) {
    uint32_t snap[PRIMARY_SIZE];
    memcpy(snap, t1, sizeof(snap));
    for (uint32_t i = 0; i < PRIMARY_SIZE; i++) {
        uint32_t e = snap[i];
        if (!(e & LIT_FLAG)) continue;
        uint32_t l1 = e & 15;
        uint32_t e2 = snap[i >> l1];
        if (!(e2 & LIT_FLAG)) continue;
        uint32_t l2 = e2 & 15;
        if (l1 + l2 > PRIMARY_BITS) continue;
        t1[i] = LIT_FLAG | LIT2_FLAG | (l1 << 24) | (e & 0x00FF0000u)
            | (((e2 >> 16) & 0xFFu) << 8) | (l1 + l2);
    }
}

/* two-level table (15-bit litlen/dist decoders) */
static int build_table2(const uint8_t *lens, int n, int is_litlen,
                        uint32_t *t1, uint32_t *sub) {
    int count[16] = {0};
    int maxl;
    int rc = check_lens(lens, n, 15, is_litlen, count, &maxl);
    memset(t1, 0, PRIMARY_SIZE * sizeof(uint32_t));
    if (rc || maxl == 0) return rc;
    uint32_t next_code[16] = {0};
    uint32_t code = 0;
    for (int l = 1; l <= maxl; l++) {
        code = (code + (uint32_t)count[l - 1]) << 1;
        next_code[l] = code;
    }
    if (maxl <= PRIMARY_BITS) {
        for (int s = 0; s < n; s++) {
            int l = lens[s];
            if (!l) continue;
            uint32_t r = rev_bits(next_code[l]++, l);
            uint32_t step = 1u << l;
            uint32_t e = make_entry(s, l, is_litlen);
            for (uint32_t i = r; i < PRIMARY_SIZE; i += step)
                t1[i] = e;
        }
        if (is_litlen) pack_pairs(t1);
        return 0;
    }
    /* per-prefix max length for sub-table widths */
    uint8_t subw[PRIMARY_SIZE];
    memset(subw, 0, sizeof(subw));
    uint32_t nc2[16];
    memcpy(nc2, next_code, sizeof(nc2));
    for (int s = 0; s < n; s++) {
        int l = lens[s];
        if (l <= PRIMARY_BITS) { if (l) nc2[l]++; continue; }
        uint32_t r = rev_bits(nc2[l]++, l);
        uint32_t p = r & (PRIMARY_SIZE - 1);
        if (l - PRIMARY_BITS > subw[p]) subw[p] = (uint8_t)(l - PRIMARY_BITS);
    }
    uint32_t off = 0;
    for (uint32_t p = 0; p < PRIMARY_SIZE; p++) {
        if (!subw[p]) continue;
        t1[p] = PTR_FLAG | (off << 4) | subw[p];
        memset(sub + off, 0, ((size_t)1 << subw[p]) * sizeof(uint32_t));
        off += 1u << subw[p];
    }
    for (int s = 0; s < n; s++) {
        int l = lens[s];
        if (!l) continue;
        uint32_t r = rev_bits(next_code[l]++, l);
        if (l <= PRIMARY_BITS) {
            uint32_t step = 1u << l;
            uint32_t e = make_entry(s, l, is_litlen);
            for (uint32_t i = r; i < PRIMARY_SIZE; i += step)
                t1[i] = e;
        } else {
            uint32_t p = r & (PRIMARY_SIZE - 1);
            uint32_t e1 = t1[p];
            uint32_t so = (e1 >> 4) & 0xFFFFFF;
            uint32_t sb = e1 & 15;
            uint32_t hi = r >> PRIMARY_BITS;
            uint32_t step = 1u << (l - PRIMARY_BITS);
            uint32_t e = make_entry(s, l, is_litlen);
            for (uint32_t i = hi; i < (1u << sb); i += step)
                sub[so + i] = e;
        }
    }
    return 0;
}

static const uint8_t CODEGEN_ORDER[19] =
    {16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15};

typedef struct {
    uint32_t ll1[PRIMARY_SIZE];
    uint32_t d1[PRIMARY_SIZE];
    uint32_t ll_sub[1 << 15];
    uint32_t d_sub[1 << 15];
    uint16_t cg[1 << 7];
} Tables;

/* one two-level lookup on the low 15 buffered bits; returns a
 * preshifted terminal entry or 0 for invalid */
static inline uint32_t tbl2_find(const uint32_t *t1, const uint32_t *sub,
                                 uint32_t peek15) {
    uint32_t e = t1[peek15 & (PRIMARY_SIZE - 1)];
    if (e & PTR_FLAG) {
        uint32_t sb = e & 15;
        uint32_t so = (e >> 4) & 0xFFFFFF;
        e = sub[so + ((peek15 >> PRIMARY_BITS) & ((1u << sb) - 1))];
    }
    return e;
}

static int read_code_lens(BitReader *br, Tables *t, int hcount,
                          uint8_t *lens, int arr_len) {
    int pos = 0;
    while (pos < hcount) {
        uint32_t peek = br_peek(br, 7);
        uint16_t e = t->cg[peek];
        if (!e) return ERR_CODE;
        uint16_t s = e >> 4;
        int rc = br_consume(br, e & 15);
        if (rc) return rc;
        if (s < 16) {
            if (pos >= arr_len) return ERR_DYN;
            lens[pos++] = (uint8_t)s;
        } else if (s == 16) {
            uint32_t v;
            int r2 = br_read(br, 2, &v);
            if (r2) return r2;
            int rep = (int)v + 3;
            if (pos == 0 || pos + rep > arr_len) return ERR_DYN;
            uint8_t prev = lens[pos - 1];
            for (int i = 0; i < rep; i++) lens[pos++] = prev;
        } else if (s == 17) {
            uint32_t v;
            int r2 = br_read(br, 3, &v);
            if (r2) return r2;
            pos += (int)v + 3;
        } else {
            uint32_t v;
            int r2 = br_read(br, 7, &v);
            if (r2) return r2;
            pos += (int)v + 11;
        }
    }
    if (pos > hcount) return ERR_DYN;
    return 0;
}

static int decode_dynamic_header(BitReader *br, Tables *t) {
    uint32_t hlit, hdist, hclen;
    int rc;
    if ((rc = br_read(br, 5, &hlit))) return rc;
    if ((rc = br_read(br, 5, &hdist))) return rc;
    if ((rc = br_read(br, 4, &hclen))) return rc;
    hlit += 257;
    hdist += 1;
    hclen += 4;
    if (hlit > 286 || hdist > 30) return ERR_DYN;
    uint8_t cl_lens[19] = {0};
    for (uint32_t i = 0; i < hclen; i++) {
        uint32_t v;
        if ((rc = br_read(br, 3, &v))) return rc;
        cl_lens[CODEGEN_ORDER[i]] = (uint8_t)v;
    }
    if ((rc = build_table(cl_lens, 19, 7, 0, t->cg)))
        return rc;
    uint8_t ll_lens[286] = {0};
    uint8_t d_lens[30] = {0};
    /* lens arrays are zeroed; read exactly hlit/hdist entries but cap the
     * writable range at the declared counts (inflate.zig:146-183) */
    if ((rc = read_code_lens(br, t, (int)hlit, ll_lens, 286))) return rc;
    if ((rc = read_code_lens(br, t, (int)hdist, d_lens, 30))) return rc;
    if ((rc = build_table2(ll_lens, 286, 1, t->ll1, t->ll_sub)))
        return rc;
    if ((rc = build_table2(d_lens, 30, 0, t->d1, t->d_sub)))
        return rc;
    return 0;
}

static int build_fixed(Tables *t) {
    uint8_t ll[288];
    uint8_t dd[32];
    int i = 0;
    for (; i < 144; i++) ll[i] = 8;
    for (; i < 256; i++) ll[i] = 9;
    for (; i < 280; i++) ll[i] = 7;
    for (; i < 288; i++) ll[i] = 8;
    for (i = 0; i < 32; i++) dd[i] = 5;
    int rc = build_table2(ll, 288, 1, t->ll1, t->ll_sub);
    if (rc) return rc;
    /* all 32 5-bit distance codes so the table is complete; 30/31 decode
     * and are rejected as InvalidCode like the reference */
    return build_table2(dd, 32, 0, t->d1, t->d_sub);
}

/* zero the uncredited high bits of the bit buffer — the slow/stored
 * paths rely on bits >= nbits being zero, while the fast loop's
 * unconditional refill leaves a (correct-prefix) garbage tail there */
static inline void br_sanitize(BitReader *br) {
    if (br->nbits < 64)
        br->buf &= ((uint64_t)1 << br->nbits) - 1;
}

/* decode one coded block; returns 0 at EOB or error */
static int decode_block(BitReader *br, Tables *t, uint8_t *out,
                        size_t out_cap, size_t *out_len) {
    size_t w = *out_len;
    for (;;) {
        /* fast path: unconditional branchless refill to >= 56 bits
         * (n + 8*((63-n)>>3) == n|56 for n < 64; the OR over the
         * uncredited tail is idempotent — those bits re-read the same
         * input bytes), then a full symbol+extra (20) + dist
         * code+extra (28) needs no refill or end-of-stream checks —
         * outcomes are identical to the checked path below, which
         * still handles the stream tail */
        br_fill(br);
        br_sanitize(br);
        /* 274 = 258 max match + 16 bytes of chunked-copy overrun room */
        while (w + 274 <= out_cap && br->pos + 8 <= br->in_len) {
            if (br->nbits < 56) {   /* nbits can be 64 after br_fill */
                uint64_t v;
                memcpy(&v, br->in + br->pos, 8);
                br->buf |= v << br->nbits;
                br->pos += (size_t)((63 - br->nbits) >> 3);
                br->nbits |= 56;
            }
            uint32_t e = tbl2_find(t->ll1, t->ll_sub, (uint32_t)br->buf);
            if (e & LIT_FLAG) {
                /* chained literal entries per refill — each may be a
                 * packed PAIR, so up to ~8 bytes per refill.  Single
                 * literals resolved through the SUB-tables consume up
                 * to 15 bits, so the chain must stop while >= 15 bits
                 * of credit remain: a 4th 15-bit consume would drive
                 * nbits negative and the next refill's `v << nbits`
                 * is UB (chip-found: device-produced tables carry
                 * 12-15 bit literal codes that zlib's rarely do) */
                for (;;) {
                    br->buf >>= (e & 15);
                    br->nbits -= (int)(e & 15);
                    out[w] = (uint8_t)(e >> 16);
                    out[w + 1] = (uint8_t)(e >> 8);
                    w += 1 + ((e >> 28) & 1);
                    if (br->nbits < 15)
                        break;               /* outer loop refills */
                    e = tbl2_find(t->ll1, t->ll_sub, (uint32_t)br->buf);
                    if (!(e & LIT_FLAG))
                        goto nonliteral;
                }
                continue;
            }
            if (0) {
nonliteral:
                /* non-literal after the chain: >= 15 bits remain,
                 * not enough for symbol+extras — loop back through
                 * the refill without consuming e */
                if (br->nbits < 48)
                    continue;
            }
            if (e & EOB_FLAG) {
                br->buf >>= (e & 15);
                br->nbits -= (int)(e & 15);
                br_sanitize(br);
                *out_len = w;
                return 0;
            }
            if (!e) return ERR_CODE;
            {
                uint32_t cb = e & 15, eb = (e >> 4) & 15;
                uint32_t length = (e >> 16)
                    + (uint32_t)((br->buf >> cb) & ((1u << eb) - 1));
                br->buf >>= cb + eb;
                br->nbits -= (int)(cb + eb);
                uint32_t de = tbl2_find(t->d1, t->d_sub,
                                        (uint32_t)br->buf);
                if (!de) return ERR_CODE;
                uint32_t dcb = de & 15, deb = (de >> 4) & 15;
                uint32_t dist = (de >> 16)
                    + (uint32_t)((br->buf >> dcb) & ((1u << deb) - 1));
                br->buf >>= dcb + deb;
                br->nbits -= (int)(dcb + deb);
                /* start the match-source load before the refill ops */
                __builtin_prefetch(out + w - dist);
                /* refill for the NEXT symbol before the copy: the
                 * 8-byte load and shift-merge issue while the copy's
                 * stores drain (out never aliases br/tables) */
                if (br->nbits < 56 && br->pos + 8 <= br->in_len) {
                    uint64_t v2;
                    memcpy(&v2, br->in + br->pos, 8);
                    br->buf |= v2 << br->nbits;
                    br->pos += (size_t)((63 - br->nbits) >> 3);
                    br->nbits |= 56;
                }
                if (dist > w) { *out_len = w; return ERR_MATCH; }
                const uint8_t *src = out + w - dist;
                uint8_t *dst = out + w;
                if (dist == 1) {
                    memset(dst, src[0], length);
                } else if (dist >= 16) {
                    /* fixed 16-byte chunks; may overrun by <= 15 bytes
                     * into the headroom the loop guard reserves */
                    uint32_t k = 0;
                    do {
                        memcpy(dst + k, src + k, 16);
                        k += 16;
                    } while (k < length);
                } else if (dist >= 8) {
                    uint32_t k = 0;
                    do {
                        memcpy(dst + k, src + k, 8);
                        k += 8;
                    } while (k < length);
                } else {
                    /* short-period overlap: seed one period, then
                     * double the already-written span */
                    memcpy(dst, src, dist);
                    uint32_t done = dist;
                    while (done < length) {
                        uint32_t chunk = done < length - done
                            ? done : length - done;
                        memcpy(dst + done, dst, chunk);
                        done += chunk;
                    }
                }
                w += length;
            }
        }
        /* checked tail path: restore the zero-high-bits invariant */
        br_sanitize(br);
        uint32_t peek = br_peek(br, 15);
        uint32_t e = tbl2_find(t->ll1, t->ll_sub, peek);
        if (!e) return ERR_CODE;
        int rc = br_consume(br, e & 15);
        if (rc) return rc;
        if (e & LIT_FLAG) {
            uint32_t cnt = 1 + ((e >> 28) & 1);
            if (w + cnt > out_cap) { *out_len = w; return ERR_OUT; }
            out[w++] = (uint8_t)(e >> 16);
            if (cnt == 2) out[w++] = (uint8_t)(e >> 8);
        } else if (e & EOB_FLAG) {
            *out_len = w;
            return 0;
        } else {
            uint32_t extra;
            if ((rc = br_read(br, (int)((e >> 4) & 15), &extra))) return rc;
            uint32_t length = (e >> 16) + extra;
            peek = br_peek(br, 15);
            uint32_t de = tbl2_find(t->d1, t->d_sub, peek);
            if (!de) return ERR_CODE;
            if ((rc = br_consume(br, de & 15))) return rc;
            if ((rc = br_read(br, (int)((de >> 4) & 15), &extra))) return rc;
            uint32_t dist = (de >> 16) + extra;
            if (dist > w) { *out_len = w; return ERR_MATCH; }
            if (w + length > out_cap) { *out_len = w; return ERR_OUT; }
            const uint8_t *src = out + w - dist;
            if (dist >= length) {
                memcpy(out + w, src, length);
                w += length;
            } else {
                for (uint32_t k = 0; k < length; k++) out[w + k] = src[k];
                w += length;
            }
        }
    }
}

/* Decode a raw deflate stream.
 * out must be pre-filled with dict_len dictionary bytes; decoded data is
 * appended after them.  *out_len is in/out: in = dict_len, out = total
 * bytes in `out` (incl. dictionary).  *end_bit receives the bit position
 * after the final block. */
int inflate_raw(const uint8_t *in, size_t in_len, size_t start_bit,
                uint8_t *out, size_t out_cap, size_t *out_len,
                size_t *end_bit) {
    BitReader br;
    br_init(&br, in, in_len, start_bit);
    /* per-call tables: ctypes releases the GIL during this call, so
     * concurrent decompress calls from Python threads must not share
     * decode-table state (~197 KB; fits comfortably on the stack) */
    Tables tables;
    Tables *t = &tables;
    for (;;) {
        uint32_t bfinal, btype;
        int rc;
        if ((rc = br_read(&br, 1, &bfinal))) return rc;
        if ((rc = br_read(&br, 2, &btype))) return rc;
        if (btype == 0) {
            br_align(&br);
            uint32_t len, nlen;
            if ((rc = br_read(&br, 16, &len))) return rc;
            if ((rc = br_read(&br, 16, &nlen))) return rc;
            if (len != (~nlen & 0xFFFF)) return ERR_NLEN;
            if (*out_len + len > out_cap) return ERR_OUT;
            /* drain whole bytes buffered in the accumulator, then memcpy
             * straight from the input */
            uint32_t k = 0;
            while (k < len && br.nbits >= 8) {
                out[(*out_len)++] = (uint8_t)(br.buf & 0xFF);
                br.buf >>= 8;
                br.nbits -= 8;
                k++;
            }
            uint32_t rest = len - k;
            if (rest) {
                if (br.pos + rest > br.in_len) return ERR_EOS;
                memcpy(out + *out_len, br.in + br.pos, rest);
                *out_len += rest;
                br.pos += rest;
            }
        } else if (btype == 1) {
            if ((rc = build_fixed(t))) return rc;
            if ((rc = decode_block(&br, t, out, out_cap, out_len)))
                return rc;
        } else if (btype == 2) {
            if ((rc = decode_dynamic_header(&br, t))) return rc;
            if ((rc = decode_block(&br, t, out, out_cap, out_len)))
                return rc;
        } else {
            return ERR_BTYPE;
        }
        if (bfinal) {
            *end_bit = br_bitpos(&br);
            return 0;
        }
    }
}

/* ------------------------------------------------------------------ */
/* Resumable bounded-memory streaming decoder.
 *
 * Mirrors the reference's pull-based engine (inflate.zig:315-336 +
 * CircularBuffer.zig): decode suspends when the caller's output budget
 * is exhausted — mid-block, even mid-match — and resumes on the next
 * call.  History lives in a private 64 KiB ring, so decoded memory is
 * O(64K) regardless of stream size.  The caller passes the same member
 * buffer each call (the bit cursor is absolute).
 *
 * Return protocol: 0 = final block done (end_bit valid), -2 = output
 * budget exhausted (call again), >0 = the error taxonomy above. */

#define STREAM_MORE (-2)

typedef struct {
    uint64_t buf;           /* bit accumulator */
    int nbits;
    size_t pos;             /* next input byte */
    int stage;              /* 0 hdr, 1 stored, 2 coded, 3 done */
    int bfinal;
    uint32_t stored_left;
    uint32_t mlen_left;     /* pending match copy */
    uint32_t mdist;
    uint64_t total_hist;    /* bytes in window incl. preset dictionary */
    size_t end_bit;
    Tables t;
    uint8_t win[1 << 16];
} InfStream;

size_t inflate_stream_state_size(void) { return sizeof(InfStream); }

void inflate_stream_init(InfStream *st, size_t start_bit,
                         const uint8_t *dict, size_t dict_len) {
    memset(st, 0, offsetof(InfStream, t));
    st->pos = start_bit >> 3;
    st->stage = 0;
    if (start_bit & 7) {
        /* defer partial-byte skip to first fill: emulate br_init */
        st->nbits = -(int)(start_bit & 7);   /* sentinel: skip bits */
    }
    if (dict_len > (1 << 15)) {
        dict += dict_len - (1 << 15);
        dict_len = 1 << 15;
    }
    for (size_t i = 0; i < dict_len; i++)
        st->win[i] = dict[i];
    st->total_hist = dict_len;
}

size_t inflate_stream_end_bit(const InfStream *st) { return st->end_bit; }
int inflate_stream_done(const InfStream *st) { return st->stage == 3; }

static void st_load(const InfStream *st, const uint8_t *in, size_t in_len,
                    BitReader *br) {
    br->in = in;
    br->in_len = in_len;
    br->pos = st->pos;
    br->buf = st->buf;
    br->nbits = st->nbits;
    if (br->nbits < 0) {              /* deferred partial-byte skip */
        int skip = -br->nbits;
        br->buf = 0;
        br->nbits = 0;
        if (br->pos < in_len) {
            br->buf = (uint64_t)in[br->pos++] >> skip;
            br->nbits = 8 - skip;
        }
    }
}

static void st_save(InfStream *st, const BitReader *br) {
    st->buf = br->buf;
    st->nbits = br->nbits;
    st->pos = br->pos;
}

static size_t stream_copy_match(InfStream *st, uint64_t hist0,
                                uint8_t *out, size_t w, size_t out_cap) {
    /* copy up to min(mlen_left, budget) bytes of the pending match;
     * sources start in the ring while dist > w, then slide into out */
    uint32_t d = st->mdist;
    while (st->mlen_left && w < out_cap && (uint64_t)d > (uint64_t)w) {
        out[w] = st->win[(hist0 + w - d) & 0xFFFF];
        w++;
        st->mlen_left--;
    }
    if (st->mlen_left && w < out_cap) {
        size_t n = st->mlen_left;
        size_t room = out_cap - w;
        if (n > room) n = room;
        const uint8_t *src = out + w - d;
        if ((size_t)d >= n) {
            memcpy(out + w, src, n);
        } else {
            memcpy(out + w, src, d);
            size_t filled = d;
            while (filled < n) {
                size_t chunk = filled < n - filled ? filled : n - filled;
                memcpy(out + w + filled, out + w, chunk);
                filled += chunk;
            }
        }
        w += n;
        st->mlen_left -= (uint32_t)n;
    }
    return w;
}

/* more_input != 0: the caller can supply more member bytes later.  Any
 * decode error then rolls the bit cursor back to the last symbol/stage
 * checkpoint and returns STREAM_NEED — on the next call (same state,
 * longer buffer) decoding resumes exactly there.  Truncation is only
 * an error once the caller passes more_input = 0 (zlib's Z_BUF_ERROR
 * discipline; reference analogue: inflate.zig:283 setReader). */
#define STREAM_NEED (-3)

int inflate_stream_read2(InfStream *st, const uint8_t *in, size_t in_len,
                         int more_input, uint8_t *out, size_t out_cap,
                         size_t *out_written) {
    size_t w = 0;
    BitReader br;
    st_load(st, in, in_len, &br);
    BitReader chk = br;                /* rollback point for STREAM_NEED */
    size_t w_chk = 0;
    uint64_t hist0 = st->total_hist;   /* ring is folded lazily at exit */
    int rc = 0;
    for (;;) {
        chk = br; w_chk = w;           /* stage boundary: state consistent */
        if (st->stage == 3) { rc = 0; break; }
        if (st->mlen_left) {                       /* resume match copy */
            w = stream_copy_match(st, hist0, out, w, out_cap);
            if (st->mlen_left) { rc = STREAM_MORE; goto done; }
        }
        if (st->stage == 1) {                      /* stored payload */
            while (st->stored_left && br.nbits >= 8) {
                if (w >= out_cap) { rc = STREAM_MORE; goto done; }
                out[w++] = (uint8_t)(br.buf & 0xFF);
                br.buf >>= 8;
                br.nbits -= 8;
                st->stored_left--;
            }
            while (st->stored_left) {
                if (w >= out_cap) { rc = STREAM_MORE; goto done; }
                size_t n = st->stored_left;
                if (n > out_cap - w) n = out_cap - w;
                if (br.pos >= br.in_len) {
                    chk = br; w_chk = w; rc = ERR_EOS; goto done;
                }
                if (n > br.in_len - br.pos) n = br.in_len - br.pos;
                memcpy(out + w, br.in + br.pos, n);
                w += n;
                br.pos += n;
                st->stored_left -= (uint32_t)n;
            }
            st->stage = st->bfinal ? 3 : 0;
            if (st->stage == 3) { st->end_bit = br_bitpos(&br); }
            continue;
        }
        if (st->stage == 0) {                      /* block header */
            uint32_t bfinal, btype;
            if ((rc = br_read(&br, 1, &bfinal))) goto done;
            if ((rc = br_read(&br, 2, &btype))) goto done;
            st->bfinal = (int)bfinal;
            if (btype == 0) {
                br_align(&br);
                uint32_t len, nlen;
                if ((rc = br_read(&br, 16, &len))) goto done;
                if ((rc = br_read(&br, 16, &nlen))) goto done;
                if (len != (~nlen & 0xFFFF)) { rc = ERR_NLEN; goto done; }
                st->stored_left = len;
                st->stage = 1;
            } else if (btype == 1) {
                if ((rc = build_fixed(&st->t))) goto done;
                st->stage = 2;
            } else if (btype == 2) {
                if ((rc = decode_dynamic_header(&br, &st->t))) goto done;
                st->stage = 2;
            } else {
                rc = ERR_BTYPE;
                goto done;
            }
            continue;
        }
        /* stage 2: coded block symbol loop */
        for (;;) {
            /* fast path: >= 48 buffered bits and room for a full match */
            br_fill(&br);
            while (br.nbits >= 48 && w + 258 <= out_cap) {
                uint32_t e = tbl2_find(st->t.ll1, st->t.ll_sub,
                                       (uint32_t)br.buf);
                if (e & LIT_FLAG) {
                    br.buf >>= (e & 15);
                    br.nbits -= (int)(e & 15);
                    out[w] = (uint8_t)(e >> 16);
                    out[w + 1] = (uint8_t)(e >> 8);
                    w += 1 + ((e >> 28) & 1);
                    e = tbl2_find(st->t.ll1, st->t.ll_sub,
                                  (uint32_t)br.buf);
                    if (e & LIT_FLAG) {
                        br.buf >>= (e & 15);
                        br.nbits -= (int)(e & 15);
                        out[w] = (uint8_t)(e >> 16);
                        out[w + 1] = (uint8_t)(e >> 8);
                        w += 1 + ((e >> 28) & 1);
                        e = tbl2_find(st->t.ll1, st->t.ll_sub,
                                      (uint32_t)br.buf);
                        if (e & LIT_FLAG) {
                            br.buf >>= (e & 15);
                            br.nbits -= (int)(e & 15);
                            out[w] = (uint8_t)(e >> 16);
                            out[w + 1] = (uint8_t)(e >> 8);
                            w += 1 + ((e >> 28) & 1);
                            br_fill(&br);
                            continue;
                        }
                    }
                    br_fill(&br);
                    if (br.nbits < 48)
                        break;
                }
                if (e & EOB_FLAG) {
                    br.buf >>= (e & 15);
                    br.nbits -= (int)(e & 15);
                    st->stage = st->bfinal ? 3 : 0;
                    if (st->stage == 3) st->end_bit = br_bitpos(&br);
                    goto block_end;
                }
                if (!e) { rc = ERR_CODE; goto done; }
                {
                    uint32_t cb = e & 15, eb = (e >> 4) & 15;
                    uint32_t length = (e >> 16)
                        + (uint32_t)((br.buf >> cb) & ((1u << eb) - 1));
                    br.buf >>= cb + eb;
                    br.nbits -= (int)(cb + eb);
                    uint32_t de = tbl2_find(st->t.d1, st->t.d_sub,
                                            (uint32_t)br.buf);
                    if (!de) { rc = ERR_CODE; goto done; }
                    uint32_t dcb = de & 15, deb = (de >> 4) & 15;
                    uint32_t dist = (de >> 16)
                        + (uint32_t)((br.buf >> dcb) & ((1u << deb) - 1));
                    br.buf >>= dcb + deb;
                    br.nbits -= (int)(dcb + deb);
                    if ((uint64_t)dist > hist0 + w) {
                        rc = ERR_MATCH; goto done;
                    }
                    st->mdist = dist;
                    st->mlen_left = length;
                    w = stream_copy_match(st, hist0, out, w, out_cap);
                }
                br_fill(&br);
            }
            /* checked path (stream tail / tight budgets) */
            if (w >= out_cap) { rc = STREAM_MORE; goto done; }
            chk = br; w_chk = w;      /* symbol boundary checkpoint */
            uint32_t peek = br_peek(&br, 15);
            uint32_t e = tbl2_find(st->t.ll1, st->t.ll_sub, peek);
            if (!e) { rc = ERR_CODE; goto done; }
            if ((e & LIT2_FLAG) && w + 2 > out_cap) {
                /* budget has room for one byte only: consume just the
                 * pair's first code (len in bits 24-27) */
                if ((rc = br_consume(&br, (int)((e >> 24) & 15))))
                    goto done;
                out[w++] = (uint8_t)(e >> 16);
                continue;
            }
            if ((rc = br_consume(&br, e & 15))) goto done;
            if (e & LIT_FLAG) {
                out[w++] = (uint8_t)(e >> 16);
                if (e & LIT2_FLAG) out[w++] = (uint8_t)(e >> 8);
            } else if (e & EOB_FLAG) {
                st->stage = st->bfinal ? 3 : 0;
                if (st->stage == 3) st->end_bit = br_bitpos(&br);
                break;
            } else {
                uint32_t extra;
                if ((rc = br_read(&br, (int)((e >> 4) & 15), &extra)))
                    goto done;
                uint32_t length = (e >> 16) + extra;
                peek = br_peek(&br, 15);
                uint32_t de = tbl2_find(st->t.d1, st->t.d_sub, peek);
                if (!de) { rc = ERR_CODE; goto done; }
                if ((rc = br_consume(&br, de & 15))) goto done;
                if ((rc = br_read(&br, (int)((de >> 4) & 15), &extra)))
                    goto done;
                uint32_t dist = (de >> 16) + extra;
                if ((uint64_t)dist > hist0 + w) { rc = ERR_MATCH; goto done; }
                st->mdist = dist;
                st->mlen_left = length;
                w = stream_copy_match(st, hist0, out, w, out_cap);
                if (st->mlen_left) { rc = STREAM_MORE; goto done; }
            }
        }
block_end:;
    }
done:
    if (rc > 0 && w == w_chk && (more_input || rc == ERR_EOS)) {
        /* partial input, not corruption (yet): rewind to the last
         * consistent boundary; stage/bfinal/tables re-derive on the
         * retry because the stage field only advances on success.
         * w == w_chk guards the fast path: its errors (>= 48 real
         * bits) are genuine, and output may exist past the checkpoint.
         * ERR_EOS rewinds even in strict mode so a setReader resume
         * (inflate.zig:283) continues from a consistent state. */
        br = chk;
        if (more_input) rc = STREAM_NEED;
    }
    /* fold this call's output tail into the 64K history ring */
    {
        size_t keep = w < (size_t)(1 << 16) ? w : (size_t)(1 << 16);
        for (size_t i = 0; i < keep; i++)
            st->win[(hist0 + w - keep + i) & 0xFFFF] = out[w - keep + i];
        st->total_hist = hist0 + w;
    }
    st_save(st, &br);
    *out_written = w;
    return rc;
}

int inflate_stream_read(InfStream *st, const uint8_t *in, size_t in_len,
                        uint8_t *out, size_t out_cap,
                        size_t *out_written) {
    return inflate_stream_read2(st, in, in_len, 0, out, out_cap,
                                out_written);
}

/* resume-point byte offset into the member buffer: bytes before this
 * are never re-read (the accumulator snapshot carries their bits), so
 * the caller may drop them and rebase */
size_t inflate_stream_in_pos(const InfStream *st) { return st->pos; }

/* Rebase the stream's input cursor after the caller drops `delta` bytes
 * from the front of the member buffer (setReader support). */
void inflate_stream_rebase(InfStream *st, size_t delta) {
    st->pos -= delta;
}

/* ------------------------------------------------------------------ */
/* Dynamic-block-header scanner for parallel decode of arbitrary
 * streams (rapidgzip-style chunk entry discovery, SURVEY §7 step 5).
 *
 * A deflate chunk decoder needs ONE confirmed entry point per chunk;
 * every dynamic block header is such a point.  scan_headers checks
 * every bit offset in [start_bit, end_bit) with a cheap-filter cascade
 * (btype == 2, HLIT/HDIST bounds, exact codelen-code Kraft sum) and
 * then a full header parse (codelen table + RLE walk + litlen/dist
 * completeness — everything but the big two-level table build), so
 * false positives are ~per-GB rare.  Offsets written are the BFINAL
 * bit of the header.  Returns the number found (may exceed max_out;
 * only max_out are stored).  Thread-safe; ctypes releases the GIL. */

static int validate_dyn_header(const uint8_t *in, size_t in_len,
                               size_t p, uint16_t *cg) {
    BitReader br;
    br_init(&br, in, in_len, p + 3);
    uint32_t hlit, hdist, hclen;
    int rc;
    if ((rc = br_read(&br, 5, &hlit))) return rc;
    if ((rc = br_read(&br, 5, &hdist))) return rc;
    if ((rc = br_read(&br, 4, &hclen))) return rc;
    hlit += 257;
    hdist += 1;
    hclen += 4;
    if (hlit > 286 || hdist > 30) return ERR_DYN;
    uint8_t cl_lens[19] = {0};
    for (uint32_t i = 0; i < hclen; i++) {
        uint32_t v;
        if ((rc = br_read(&br, 3, &v))) return rc;
        cl_lens[CODEGEN_ORDER[i]] = (uint8_t)v;
    }
    if ((rc = build_table(cl_lens, 19, 7, 0, cg))) return rc;
    uint8_t ll_lens[286] = {0};
    uint8_t d_lens[30] = {0};
    Tables tt;          /* only .cg is used by read_code_lens */
    memcpy(tt.cg, cg, sizeof(tt.cg));
    if ((rc = read_code_lens(&br, &tt, (int)hlit, ll_lens, 286)))
        return rc;
    if ((rc = read_code_lens(&br, &tt, (int)hdist, d_lens, 30)))
        return rc;
    int count[16] = {0};
    int maxl;
    if ((rc = check_lens(ll_lens, 286, 15, 1, count, &maxl))) return rc;
    int count2[16] = {0};
    if ((rc = check_lens(d_lens, 30, 15, 0, count2, &maxl))) return rc;
    return 0;
}

long scan_headers(const uint8_t *in, size_t in_len, size_t start_bit,
                  size_t end_bit, uint64_t *out, size_t max_out) {
    size_t nbits = in_len * 8;
    if (end_bit > nbits) end_bit = nbits;
    long cnt = 0;
    uint16_t cg[1 << 7];
    static const uint8_t KLUT[8] = {0, 64, 32, 16, 8, 4, 2, 1};
    /* the full header parse needs bounded reads; stop where even a
     * minimal header cannot fit */
    size_t lim = nbits > 96 ? nbits - 96 : 0;
    if (end_bit > lim) end_bit = lim;
    for (size_t p = start_bit; p < end_bit; p++) {
        size_t byte = p >> 3;
        uint64_t v;
        memcpy(&v, in + byte, 8);
        v >>= (p & 7);
        /* btype == 2: bit1 == 0, bit2 == 1 */
        if (((v >> 1) & 3) != 2) continue;
        if (((uint32_t)(v >> 3) & 31) > 29) continue;   /* HLIT  */
        if (((uint32_t)(v >> 8) & 31) > 29) continue;   /* HDIST */
        uint32_t hclen = ((uint32_t)(v >> 13) & 15) + 4;
        /* all 19 3-bit codelen lengths (57 bits at p+17) come from ONE
         * unaligned u64 load: 64 - 7 worst-case alignment >= 57 */
        uint64_t f;
        memcpy(&f, in + ((p + 17) >> 3), 8);
        f >>= ((p + 17) & 7);
        /* exact Kraft sum of the codelen code: the 19 lengths must
         * fill the 7-bit code space exactly (check_lens rejects both
         * over- and under-subscription for 7-bit tables); branchless
         * with an early overshoot exit every 4 fields */
        uint32_t umask = (1u << hclen) - 1;
        int kraft = 0;
        int i = 0;
        for (; i < 16; i += 4) {
            kraft += KLUT[f & 7] & (-(int)((umask >> i) & 1));
            kraft += KLUT[(f >> 3) & 7] & (-(int)((umask >> (i + 1)) & 1));
            kraft += KLUT[(f >> 6) & 7] & (-(int)((umask >> (i + 2)) & 1));
            kraft += KLUT[(f >> 9) & 7] & (-(int)((umask >> (i + 3)) & 1));
            f >>= 12;
            if (kraft > 128) break;
        }
        if (kraft > 128) continue;
        for (; i < 19; i++) {
            kraft += KLUT[f & 7] & (-(int)((umask >> i) & 1));
            f >>= 3;
        }
        if (kraft != 128) continue;
        if (validate_dyn_header(in, in_len, p, cg)) continue;
        if ((size_t)cnt < max_out)
            out[cnt] = p;
        cnt++;
        if ((size_t)cnt >= max_out) break;
    }
    return cnt;
}
