"""Roundtrip fuzz target (equivalent of the reference bin/roundtrip.zig):
stdin -> compress at levels 1..9 + huffman + store -> decompress ->
assert byte equality.  Exit 0 iff all modes roundtrip.
"""

import sys


def main() -> int:
    import flate_tpu as ft

    data = sys.stdin.buffer.read()
    for level in range(1, 10):
        blob = ft.flate.compress(data, level=level)
        if ft.flate.decompress(blob) != data:
            print(f"FAIL level {level}", file=sys.stderr)
            return 1
    for sub in (ft.flate.huffman, ft.flate.store):
        blob = sub.compress(data)
        if sub.decompress(blob) != data:
            print("FAIL sub-mode", file=sys.stderr)
            return 1
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
