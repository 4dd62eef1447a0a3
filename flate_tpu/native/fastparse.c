/* fastparse — cost-model-optimal token parse (zopfli-style squeeze).
 *
 * Given per-position best matches (len, dist) from the parallel match
 * search and per-symbol bit costs from a previous pass, compute the
 * minimum-bit token parse by backward dynamic programming:
 *
 *   cost[i] = min( lit_bits[b[i]] + cost[i+1],
 *                  min over usable lengths l: len_cost(l) + dist_cost(d_i)
 *                                             + cost[i+l] )
 *
 * Candidate lengths per position: every length-code class boundary that is
 * <= mlen[i], plus mlen[i] itself (within a class the code cost is
 * constant, so boundaries + the maximum dominate the interesting
 * choices).  The parse the reference/zlib use is greedy with one-step
 * lazy; this DP is strictly better under the cost model, which is how the
 * high levels go below zlib/reference sizes.
 *
 *   int optimal_parse(const int32_t *mlen, const int32_t *mdist, int n,
 *                     const uint8_t *data,
 *                     const float *lit_bits,    // [256]
 *                     const float *lenc_bits,   // [29] code+extra bits
 *                     const float *dist_bits,   // [30] code+extra bits
 *                     uint8_t *take, uint8_t *out_len_sel)
 *
 * take[i] = 1 if a token starts at i as a match (of length sel_len[i]),
 * the caller walks i += take[i] ? sel_len[i] : 1.  sel_len stored as
 * int32 via out param below.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static const uint16_t LBASE[29] = {3,4,5,6,7,8,9,10,11,13,15,17,19,23,27,31,
    35,43,51,59,67,83,99,115,131,163,195,227,258};

static int len_code_of(int l) {
    /* length (3..258) -> code index (0..28) */
    int n = l - 3;
    if (n < 8) return n;
    if (n == 255) return 28;
    int e = 0;
    int x = n;
    while (x > 3) { x >>= 1; e++; }
    e -= 1;
    if (e < 1) e = 1;
    return (e << 2) + (n >> e);
}

static int dist_code_of(int d) {
    int m = d - 1;
    if (m < 4) return m;
    int e = 0;
    int x = m;
    while (x > 1) { x >>= 1; e++; }
    return (e << 1) + ((m >> (e - 1)) & 1);
}

int optimal_parse(const int32_t *mlen, const int32_t *mdist, int n,
                  const uint8_t *data, const float *lit_bits,
                  const float *lenc_bits, const float *dist_bits,
                  int32_t *sel_len, uint8_t *take) {
    float *cost = (float *)malloc(sizeof(float) * (size_t)(n + 1));
    if (!cost) return -1;
    cost[n] = 0.0f;
    for (int i = n - 1; i >= 0; i--) {
        float best = lit_bits[data[i]] + cost[i + 1];
        int best_l = 0;
        int ml = mlen[i];
        if (ml >= 3) {
            if (ml > n - i) ml = n - i;
            float dc = dist_bits[dist_code_of(mdist[i])];
            /* candidate lengths: class boundaries <= ml, plus ml */
            for (int c = 0; c < 29; c++) {
                int l = LBASE[c];
                if (l > ml) break;
                float v = lenc_bits[c] + dc + cost[i + l];
                if (v < best) { best = v; best_l = l; }
            }
            {
                int l = ml;
                float v = lenc_bits[len_code_of(l)] + dc + cost[i + l];
                if (v < best) { best = v; best_l = l; }
            }
        }
        cost[i] = best;
        sel_len[i] = best_l;
    }
    free(cost);
    /* walk the optimal path: take[i]=1 where a token starts */
    memset(take, 0, (size_t)n);
    for (int i = 0; i < n;) {
        take[i] = 1;
        i += sel_len[i] ? sel_len[i] : 1;
    }
    return 0;
}
