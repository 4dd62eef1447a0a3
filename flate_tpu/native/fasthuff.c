/* fasthuff — native Huffman code-length construction for flate_tpu.
 *
 * Replaces the Python two-queue construction on the host planning path
 * (flate_tpu/huffman.py) with the same algorithm in C: optimal Huffman
 * depths via a two-queue merge, plus the exact package-merge fallback when
 * the depth limit is exceeded.  Alphabets are tiny (<= 288 symbols) but the
 * planner runs three builds per 128 KiB shard, so the ~500x speedup over
 * the Python loop matters at multi-GB/s pipeline rates.
 *
 * Exposed via ctypes (no pybind11 in this environment):
 *   int huff_lengths(const long long *freq, int n, int max_bits,
 *                    unsigned char *out_lens);
 * returns 0 on success.
 */

#include <stdint.h>
#include <string.h>

#define MAX_SYMS 320

/* stable ascending sort of (weight, symbol) by weight then symbol — n is
 * tiny, insertion sort is fine and keeps determinism identical to the
 * Python np.argsort(kind="stable") path. */
static void sort_by_weight(int64_t *w, int *sym, int n) {
    for (int i = 1; i < n; i++) {
        int64_t wi = w[i];
        int si = sym[i];
        int j = i - 1;
        while (j >= 0 && (w[j] > wi)) {
            w[j + 1] = w[j];
            sym[j + 1] = sym[j];
            j--;
        }
        w[j + 1] = wi;
        sym[j + 1] = si;
    }
}

/* package-merge: exact optimal length-limited lengths.
 * leaf_w ascending; out_lens indexed by sorted order. */
static int package_merge(const int64_t *leaf_w, int n, int max_bits,
                         int *out_lens) {
    /* item weights + per-item symbol counts (n <= 320, list <= 2n) */
    static int64_t cur_w[2 * MAX_SYMS];
    static int16_t cur_c[2 * MAX_SYMS][MAX_SYMS];
    static int64_t nxt_w[2 * MAX_SYMS];
    static int16_t nxt_c[2 * MAX_SYMS][MAX_SYMS];

    int cur_n = n;
    for (int i = 0; i < n; i++) {
        cur_w[i] = leaf_w[i];
        memset(cur_c[i], 0, sizeof(int16_t) * n);
        cur_c[i][i] = 1;
    }
    for (int level = 1; level < max_bits; level++) {
        int pk = cur_n / 2;
        /* merge leaves (ascending) with packages (ascending) */
        int li = 0, pi = 0, m = 0;
        while (li < n || pi < pk) {
            int64_t pw = (pi < pk) ? cur_w[2 * pi] + cur_w[2 * pi + 1] : 0;
            int take_leaf;
            if (li >= n) take_leaf = 0;
            else if (pi >= pk) take_leaf = 1;
            else take_leaf = leaf_w[li] <= pw;
            if (take_leaf) {
                nxt_w[m] = leaf_w[li];
                memset(nxt_c[m], 0, sizeof(int16_t) * n);
                nxt_c[m][li] = 1;
                li++;
            } else {
                nxt_w[m] = pw;
                for (int s = 0; s < n; s++)
                    nxt_c[m][s] = (int16_t)(cur_c[2 * pi][s] +
                                            cur_c[2 * pi + 1][s]);
                pi++;
            }
            m++;
        }
        cur_n = m;
        memcpy(cur_w, nxt_w, sizeof(int64_t) * m);
        memcpy(cur_c, nxt_c, sizeof(int16_t) * m * MAX_SYMS);
    }
    memset(out_lens, 0, sizeof(int) * n);
    int need = 2 * n - 2;
    if (need > cur_n) return -1;
    for (int i = 0; i < need; i++)
        for (int s = 0; s < n; s++)
            out_lens[s] += cur_c[i][s];
    return 0;
}

int huff_lengths(const int64_t *freq, int n, int max_bits,
                 unsigned char *out_lens) {
    if (n > MAX_SYMS) return -1;
    int sym[MAX_SYMS];
    int64_t w[MAX_SYMS];
    int used = 0;
    for (int i = 0; i < n; i++) {
        out_lens[i] = 0;
        if (freq[i] > 0) {
            sym[used] = i;
            w[used] = freq[i];
            used++;
        }
    }
    if (used == 0) return 0;
    if (used == 1) { out_lens[sym[0]] = 1; return 0; }
    if (used == 2) { out_lens[sym[0]] = 1; out_lens[sym[1]] = 1; return 0; }

    sort_by_weight(w, sym, used);

    /* two-queue optimal merge */
    int64_t weight[2 * MAX_SYMS];
    int parent[2 * MAX_SYMS];
    int depth[2 * MAX_SYMS];
    for (int i = 0; i < used; i++) weight[i] = w[i];
    int li = 0, ii = used, nxt = used;
    for (int m = 0; m < used - 1; m++) {
        int picks[2];
        for (int t = 0; t < 2; t++) {
            if (li < used && (ii >= nxt || weight[li] <= weight[ii]))
                picks[t] = li++;
            else
                picks[t] = ii++;
        }
        weight[nxt] = weight[picks[0]] + weight[picks[1]];
        parent[picks[0]] = nxt;
        parent[picks[1]] = nxt;
        nxt++;
    }
    int root = nxt - 1;
    depth[root] = 0;
    for (int node = root - 1; node >= 0; node--)
        depth[node] = depth[parent[node]] + 1;

    int maxd = 0;
    for (int i = 0; i < used; i++)
        if (depth[i] > maxd) maxd = depth[i];

    if (maxd <= max_bits) {
        for (int i = 0; i < used; i++) out_lens[sym[i]] = (unsigned char)depth[i];
        return 0;
    }

    /* depth limit exceeded: exact package-merge (rare) */
    int pm_lens[MAX_SYMS];
    if (package_merge(w, used, max_bits, pm_lens) != 0) return -1;
    for (int i = 0; i < used; i++) out_lens[sym[i]] = (unsigned char)pm_lens[i];
    return 0;
}
