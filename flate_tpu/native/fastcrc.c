/* fastcrc.c — host checksum kernels: PCLMULQDQ CRC32 + blocked Adler32.
 *
 * The reference rolls CRC32/Adler32 inline with stream I/O
 * (/root/reference/src/flate/container.zig:168-206) at whatever rate
 * Zig's std.hash delivers.  Our host decode path verifies a whole
 * member's checksum after the native inflate; at multi-GB/s decode
 * rates a table-driven CRC32 (~2 GB/s) becomes a real serial term, so
 * CRC32 runs as 4-way 128-bit carry-less-multiply folding (Intel's
 * published CRC folding method for the reflected gzip polynomial)
 * with a slice-by-8 fallback for short/unaligned spans and non-x86
 * builds.  Adler32 uses 16-lane blocked accumulation that vectorizes
 * under -O3.
 *
 * Both functions use the zlib calling convention: `crc`/`adler` are
 * running post-conditioned values ((re)start with 0 / 1).
 */

#include <stdint.h>
#include <stddef.h>

/* ---------------- CRC32 (gzip polynomial 0xEDB88320, reflected) ------- */

static uint32_t crc_table[8][256];
static int crc_table_ready = 0;

static void crc_init_table(void)
{
    if (crc_table_ready) return;
    for (int i = 0; i < 256; i++) {
        uint32_t c = (uint32_t)i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_table[0][i] = c;
    }
    for (int i = 0; i < 256; i++) {
        uint32_t c = crc_table[0][i];
        for (int t = 1; t < 8; t++) {
            c = crc_table[0][c & 0xFF] ^ (c >> 8);
            crc_table[t][i] = c;
        }
    }
    crc_table_ready = 1;
}

static uint32_t crc32_slice8(uint32_t crc, const uint8_t *p, size_t n)
{
    while (n && ((uintptr_t)p & 7)) {
        crc = crc_table[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
        n--;
    }
    while (n >= 8) {
        uint64_t v;
        __builtin_memcpy(&v, p, 8);
        v ^= crc;
        crc = crc_table[7][v & 0xFF] ^ crc_table[6][(v >> 8) & 0xFF]
            ^ crc_table[5][(v >> 16) & 0xFF] ^ crc_table[4][(v >> 24) & 0xFF]
            ^ crc_table[3][(v >> 32) & 0xFF] ^ crc_table[2][(v >> 40) & 0xFF]
            ^ crc_table[1][(v >> 48) & 0xFF] ^ crc_table[0][(v >> 56) & 0xFF];
        p += 8;
        n -= 8;
    }
    while (n--) crc = crc_table[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
    return crc;
}

#if defined(__PCLMUL__) && defined(__SSE4_1__)
#include <immintrin.h>

/* Folding constants for the reflected gzip polynomial (x^N mod P):
 * k1 = x^(512+32), k2 = x^(512-32) — 512-bit (4x128) block folding
 * k3 = x^(128+32), k4 = x^(128-32) — 128-bit folding
 * k5 = x^(64+32)                   — 96->64 reduction
 * mu, P'                           — Barrett reduction pair            */
static uint32_t crc32_clmul_body(uint32_t crc, const uint8_t *p, size_t n)
{
    const __m128i k1k2 = _mm_set_epi64x(0x00000001c6e41596LL,
                                        0x0000000154442bd4LL);
    const __m128i k3k4 = _mm_set_epi64x(0x00000000ccaa009eLL,
                                        0x00000001751997d0LL);
    const __m128i k5k0 = _mm_set_epi64x(0LL, 0x0000000163cd6124LL);
    const __m128i pmu = _mm_set_epi64x(0x00000001DB710641LL,
                                       0x00000001F7011641LL);
    const __m128i m32 = _mm_set_epi32(0, 0, 0, -1);
    __m128i x0, x1, x2, x3, y;

    x0 = _mm_loadu_si128((const __m128i *)p);
    x0 = _mm_xor_si128(x0, _mm_cvtsi32_si128((int)crc));
    x1 = _mm_loadu_si128((const __m128i *)(p + 16));
    x2 = _mm_loadu_si128((const __m128i *)(p + 32));
    x3 = _mm_loadu_si128((const __m128i *)(p + 48));
    p += 64;
    n -= 64;

#define FOLD1(x, data)                                   \
    y = _mm_clmulepi64_si128(x, k1k2, 0x00);             \
    x = _mm_clmulepi64_si128(x, k1k2, 0x11);             \
    x = _mm_xor_si128(x, y);                             \
    x = _mm_xor_si128(x, data)

    while (n >= 64) {
        FOLD1(x0, _mm_loadu_si128((const __m128i *)p));
        FOLD1(x1, _mm_loadu_si128((const __m128i *)(p + 16)));
        FOLD1(x2, _mm_loadu_si128((const __m128i *)(p + 32)));
        FOLD1(x3, _mm_loadu_si128((const __m128i *)(p + 48)));
        p += 64;
        n -= 64;
    }
#undef FOLD1

    /* fold the four lanes into one */
#define FOLDTO(dst, src)                                 \
    y = _mm_clmulepi64_si128(src, k3k4, 0x00);           \
    src = _mm_clmulepi64_si128(src, k3k4, 0x11);         \
    dst = _mm_xor_si128(dst, y);                         \
    dst = _mm_xor_si128(dst, src)
    FOLDTO(x1, x0);
    FOLDTO(x2, x1);
    FOLDTO(x3, x2);
#undef FOLDTO

    while (n >= 16) {
        y = _mm_clmulepi64_si128(x3, k3k4, 0x00);
        x3 = _mm_clmulepi64_si128(x3, k3k4, 0x11);
        x3 = _mm_xor_si128(x3, y);
        x3 = _mm_xor_si128(x3, _mm_loadu_si128((const __m128i *)p));
        p += 16;
        n -= 16;
    }

    /* 128 -> 96 */
    y = _mm_clmulepi64_si128(x3, k3k4, 0x10);
    x3 = _mm_srli_si128(x3, 8);
    x3 = _mm_xor_si128(x3, y);
    /* 96 -> 64 */
    y = _mm_clmulepi64_si128(_mm_and_si128(x3, m32), k5k0, 0x00);
    x3 = _mm_srli_si128(x3, 4);
    x3 = _mm_xor_si128(x3, y);
    /* Barrett 64 -> 32 */
    y = _mm_clmulepi64_si128(_mm_and_si128(x3, m32), pmu, 0x00);
    y = _mm_clmulepi64_si128(_mm_and_si128(y, m32), pmu, 0x10);
    x3 = _mm_xor_si128(x3, y);
    crc = (uint32_t)_mm_extract_epi32(x3, 1);

    if (n) crc = crc32_slice8(crc, p, n);
    return crc;
}
#endif

uint32_t fast_crc32(const uint8_t *p, size_t n, uint32_t crc)
{
    crc_init_table();
    crc = ~crc;
#if defined(__PCLMUL__) && defined(__SSE4_1__)
    if (n >= 128) {
        size_t head = (16 - ((uintptr_t)p & 15)) & 15;
        if (head) {
            crc = crc32_slice8(crc, p, head);
            p += head;
            n -= head;
        }
        crc = crc32_clmul_body(crc, p, n);
        return ~crc;
    }
#endif
    return ~crc32_slice8(crc, p, n);
}

/* ---------------- Adler32 (zlib) -------------------------------------- */

#define ADLER_MOD 65521u
/* max bytes per reduction: the blocked c2 term reaches ~16*16*255*R^2/2,
 * so R = 256 rounds (4096 bytes) keeps every accumulator under 2^32
 * (c2 <= ~2.2e9, + 16*R*s1 <= ~2.7e8) */
#define ADLER_NMAX 4096

uint32_t fast_adler32(const uint8_t *p, size_t n, uint32_t adler)
{
    uint32_t s1 = adler & 0xFFFF, s2 = (adler >> 16) & 0xFFFF;
    while (n) {
        size_t blk = n < ADLER_NMAX ? n : ADLER_NMAX;
        n -= blk;
        /* 16-lane blocked accumulation; -O3 vectorizes the inner loop.
         * For R rounds from running (s1, s2), with lane sums
         * V1[i] = sum_r b[16r+i] and V2[i] = sum_r (pre-round V1[i]):
         *   s1 += sum_i V1[i]
         *   s2 += 16*R*s1_start + 16*sum_i(V2[i]+V1[i]) - sum_i i*V1[i]
         */
        uint32_t rounds = (uint32_t)(blk / 16);
        uint32_t v1[16] = {0}, v2[16] = {0};
        for (uint32_t r = 0; r < rounds; r++) {
            for (int i = 0; i < 16; i++) {
                v2[i] += v1[i];
                v1[i] += p[i];
            }
            p += 16;
        }
        blk -= (size_t)rounds * 16;
        uint32_t c1 = 0, c2 = 0;
        for (int i = 0; i < 16; i++) {
            c1 += v1[i];
            c2 += 16u * (v2[i] + v1[i]) - (uint32_t)i * v1[i];
        }
        s2 += 16u * rounds * s1 + c2;
        s1 += c1;
        while (blk--) {
            s1 += *p++;
            s2 += s1;
        }
        s1 %= ADLER_MOD;
        s2 %= ADLER_MOD;
    }
    return (s2 << 16) | s1;
}
