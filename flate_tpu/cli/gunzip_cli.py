"""gunzip CLI: `python -m flate_tpu.cli.gunzip_cli <file.gz>` -> <file>
(equivalent of the reference bin/gunzip.zig).

Streams reader -> writer in bounded memory (O(64K) decode state +
a bounded compressed window), so arbitrarily large files never slurp.
"""

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="flate-gunzip")
    ap.add_argument("file")
    ap.add_argument("-o", "--output")
    ap.add_argument("-c", "--stdout", action="store_true")
    args = ap.parse_args(argv)

    import flate_tpu as ft
    if args.stdout:
        out, close = sys.stdout.buffer, False
    else:
        path = args.output or (args.file[:-3] if args.file.endswith(".gz")
                               else args.file + ".out")
        out, close = open(path, "wb"), True
    try:
        with open(args.file, "rb") as f:
            ft.gzip.decompress(f, writer=out)
    finally:
        if close:
            out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
