"""gunzip CLI: `python -m flate_tpu.cli.gunzip_cli <file.gz>` -> <file>
(equivalent of the reference bin/gunzip.zig).
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
    with open(args.file, "rb") as f:
        blob = f.read()
    data = ft.gzip.decompress(blob)
    if args.stdout:
        sys.stdout.buffer.write(data)
    else:
        out = args.output or (args.file[:-3] if args.file.endswith(".gz")
                              else args.file + ".out")
        with open(out, "wb") as f:
            f.write(data)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
