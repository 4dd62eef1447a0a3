"""gzip CLI: `python -m flate_tpu.cli.gzip_cli [-l LEVEL] [--tpu] <file>`
-> <file>.gz (equivalent of the reference bin/gzip.zig, i.e. gzip -kfn).
"""

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="flate-gzip")
    ap.add_argument("file")
    ap.add_argument("-l", "--level", type=int, default=6)
    ap.add_argument("-o", "--output")
    ap.add_argument("--tpu", action="store_true",
                    help="use the TPU device pipeline")
    ap.add_argument("-c", "--stdout", action="store_true")
    args = ap.parse_args(argv)

    import flate_tpu as ft
    if args.stdout:
        out, close = sys.stdout.buffer, False
    else:
        out = open(args.output or args.file + ".gz", "wb")
        close = True
    try:
        if args.tpu:
            # v2 device pipeline via the public API; bytes input keeps
            # the FLT1 shard index for device-parallel decode
            with open(args.file, "rb") as f:
                ft.gzip.compress(f.read(), writer=out, level=args.level,
                                 device=True)
        else:
            # reader -> writer streams in O(shard) memory;
            # FLATE_TPU_DEVICE=1 still routes to the device engine
            with open(args.file, "rb") as f:
                ft.gzip.compress(f, writer=out, level=args.level)
    finally:
        if close:
            out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
