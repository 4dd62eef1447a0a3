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

    with open(args.file, "rb") as f:
        data = f.read()
    import flate_tpu as ft
    # --tpu forces the v2 device pipeline; otherwise FLATE_TPU_DEVICE=1
    # selects it (api.py device routing)
    blob = ft.gzip.compress(data, level=args.level,
                            device=True if args.tpu else None)
    if args.stdout:
        sys.stdout.buffer.write(blob)
    else:
        out = args.output or args.file + ".gz"
        with open(out, "wb") as f:
            f.write(blob)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
