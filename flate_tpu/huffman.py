"""Length-limited canonical Huffman code construction (encode side).

The reference builds codes with the Go/zlib levels/leaf-count algorithm
(/root/reference/src/flate/huffman_encoder.zig:62-278).  We use an equivalent
formulation that vectorizes cleanly and produces the same code *lengths* in
all practical cases (optimal Huffman depths + the standard zlib-style overflow
repair when a depth exceeds the 15-bit limit):

1. optimal Huffman depths via a two-queue O(n log n) merge over the nonzero
   symbols,
2. if any depth exceeds ``max_bits``: repair the depth histogram by moving
   leaves (exactly zlib trees.c gen_bitlen's repair loop — Kraft-preserving),
3. reassign lengths to symbols in frequency order and hand out canonical
   codes (tables.canonical_codes), bit-reversed for LSB-first emission.

Code *sizes* therefore match zlib/the reference; exact code values also match
because canonical assignment over (length, symbol-order) pins the bits
(huffman_encoder.zig:251-278).
"""

from __future__ import annotations

import numpy as np

from . import consts, tables


def huffman_code_lengths(freq: np.ndarray, max_bits: int) -> np.ndarray:
    """Compute length-limited Huffman code lengths for a frequency array.

    Returns an int32 array of code lengths (0 for unused symbols).  Symbols
    with freq == 0 get length 0.  A single used symbol gets length 1; zero
    used symbols returns all-zero lengths.

    Uses the native C implementation (flate_tpu.native.fasthuff) when
    available — same algorithm, ~500x faster on the host planning path.
    """
    freq = np.asarray(freq, dtype=np.int64)
    from . import native
    fast = native.huff_lengths(freq, max_bits)
    if fast is not None:
        return fast
    n_sym = freq.size
    lens = np.zeros(n_sym, dtype=np.int32)
    used = np.nonzero(freq)[0]
    n = used.size
    if n == 0:
        return lens
    if n == 1:
        lens[used[0]] = 1
        return lens
    if n == 2:
        lens[used] = 1
        return lens

    # -- optimal depths: two-queue Huffman merge ---------------------------
    order = used[np.argsort(freq[used], kind="stable")]
    leaf_w = freq[order]
    # node storage: leaves 0..n-1 (in sorted order), internals n..2n-2
    parent = np.full(2 * n - 1, -1, dtype=np.int64)
    weight = np.zeros(2 * n - 1, dtype=np.int64)
    weight[:n] = leaf_w
    li = 0                     # next leaf
    ii = n                     # next internal to consume
    nxt = n                    # next internal to create
    for _ in range(n - 1):
        picks = []
        for _2 in range(2):
            if li < n and (ii >= nxt or weight[li] <= weight[ii]):
                picks.append(li)
                li += 1
            else:
                picks.append(ii)
                ii += 1
        a, b = picks
        weight[nxt] = weight[a] + weight[b]
        parent[a] = nxt
        parent[b] = nxt
        nxt += 1
    # depths: walk from root (last created) downward; nodes are created in
    # non-decreasing weight order so a child always precedes its parent.
    depth = np.zeros(2 * n - 1, dtype=np.int32)
    for node in range(2 * n - 3, -1, -1):
        depth[node] = depth[parent[node]] + 1
    leaf_depth = depth[:n]

    if int(leaf_depth.max()) <= max_bits:
        lens[order] = leaf_depth
        return lens

    # -- depth limit exceeded: exact length-limited construction ---------
    # (rare: needs near-Fibonacci frequency skew).  Package-merge is
    # optimal under the limit and always produces a Kraft-complete code,
    # which the strict decoders on the other side require.
    lens[order] = _package_merge(leaf_w, max_bits)
    return lens


def _package_merge(weights: np.ndarray, max_bits: int) -> np.ndarray:
    """Exact length-limited Huffman lengths via package-merge.

    weights: ascending positive weights (n >= 2, n <= 2**max_bits).
    Returns per-item code lengths in the same order."""
    n = weights.size
    assert n <= (1 << max_bits), "alphabet too large for bit limit"
    leaf_w = weights.astype(np.int64)
    leaf_c = np.eye(n, dtype=np.int32)          # per-item symbol counts
    cur_w, cur_c = leaf_w.copy(), leaf_c.copy()
    for _ in range(max_bits - 1):
        m = cur_w.size // 2
        pk_w = cur_w[0:2 * m:2] + cur_w[1:2 * m:2]
        pk_c = cur_c[0:2 * m:2] + cur_c[1:2 * m:2]
        cur_w = np.concatenate([leaf_w, pk_w])
        cur_c = np.concatenate([leaf_c, pk_c], axis=0)
        order = np.argsort(cur_w, kind="stable")
        cur_w, cur_c = cur_w[order], cur_c[order]
    return cur_c[:2 * n - 2].sum(axis=0).astype(np.int32)


def build_codes(freq: np.ndarray, max_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """freq -> (codes, lens); codes already bit-reversed for LSB-first."""
    lens = huffman_code_lengths(freq, max_bits)
    return tables.canonical_codes(lens), lens


def bit_length(freq: np.ndarray, lens: np.ndarray) -> int:
    """Total payload bits when coding freq with the given code lengths."""
    return int((np.asarray(freq, dtype=np.int64) * lens).sum())
