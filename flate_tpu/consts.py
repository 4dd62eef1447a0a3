"""Protocol constants for DEFLATE (RFC 1951) and its containers (RFC 1950/1952).

TPU-native re-derivation of the reference constant set (reference:
/root/reference/src/flate/consts.zig:1-49). Everything here is pure data shared
by host framing code and device kernels.
"""

# --- match/token limits (consts.zig:9-16) ---
MIN_MATCH_LEN = 3        # base_length + min_length in the reference
MAX_MATCH_LEN = 258
MIN_DISTANCE = 1
MAX_DISTANCE = 32768     # 32K history window

# --- windows / blocks ---
HISTORY_LEN = 32 * 1024          # deflate back-reference window (consts.zig:18-20)
MAX_STORED_BLOCK = 65535         # stored block length field is u16 (consts.zig:44)

# Shard size for the TPU data-parallel pipeline. Each shard is compressed as an
# independent run of deflate blocks terminated by a sync flush, pigz-style;
# the previous HISTORY_LEN bytes are (optionally) used as priming context so
# cross-shard matches are not lost. 128 KiB matches the pigz default and the
# BASELINE.json north star.
SHARD_LEN = 128 * 1024

# --- alphabets (consts.zig:28-49) ---
NUM_LITLEN = 286                 # literal/length alphabet actually used
NUM_LITLEN_CODES = 288           # incl. the two reserved codes in fixed trees
NUM_DIST = 30
NUM_DIST_CODES = 32
NUM_CODEGEN = 19                 # code-length ("codegen") alphabet
END_OF_BLOCK = 256

MAX_CODE_BITS = 15               # litlen/dist code length limit
MAX_CODEGEN_BITS = 7             # codegen code length limit

# Order in which codegen code lengths are stored in a dynamic header
# (RFC 1951 §3.2.7).
CODEGEN_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

# --- hashing (consts.zig:22-26) ---
LOOKUP_BITS = 15
HASH_MUL = 0x9E3779B1            # Fibonacci hashing multiplier

# --- levels ---
# Reference level table deflate.zig:35-53 semantics: per level there is a
# (good, nice, lazy, chain) tuple.  Our parallel matcher re-expresses these as
# (candidates, nice, lazy):
#   candidates — how many most-recent same-hash positions are scored per
#                position (the parallel analogue of walking `chain` links);
#   nice       — match length at which the search is considered good enough;
#   lazy       — whether one-step-lazy arbitration is enabled and the length
#                at/above which a match is taken immediately (no deferral).
LEVEL_PARAMS = {
    # level: (candidates, nice, lazy_enabled, max_lazy)
    # candidates calibrated so compressed size <= zlib/reference at the same
    # level (tests/test_sizes.py pins this)
    1: (2, 16, False, 0),
    2: (4, 24, False, 0),
    3: (8, 32, False, 0),
    4: (8, 16, True, 4),
    5: (32, 32, True, 16),
    6: (64, 128, True, 32),
    7: (96, 144, True, 64),
    8: (128, 258, True, 128),
    9: (192, 258, True, 258),
}

LEVEL_FAST = 4       # reference: .fast = 0xb -> level 4
LEVEL_DEFAULT = 6    # reference: .default = 0xc -> level 6
LEVEL_BEST = 9       # reference: .best = 0xd -> level 9
LEVEL_STORE = 0
LEVEL_HUFFMAN = -2   # huffman-only (v1 reference convention)

# token-block size: the reference flushes a block every 1<<15 tokens
# (consts.zig:6); our shards are bounded by SHARD_LEN positions instead, and a
# shard never produces more than SHARD_LEN tokens.
MAX_TOKENS = 1 << 15
