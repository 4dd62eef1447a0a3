"""Decompress fuzz target (equivalent of the reference bin/decompress.zig:9-25):
stdin raw-deflate stream -> decompress, print OK or the error class.

Runs THREE decoders as a differential set: native C fastinflate, the
resumable bounded-memory streaming decoder (read in small odd-sized
chunks so mid-block suspends are exercised), and the Python spec.  All
must agree on success/failure and output bytes.  Exit 0 on clean
decode, 1 on a protocol error (expected for malformed input), 2 on a
decoder disagreement (a real bug — what a fuzzer hunts).
"""

import sys


def main() -> int:
    from flate_tpu import errors
    from flate_tpu import inflate as pyinf
    from flate_tpu import native

    data = sys.stdin.buffer.read()

    def run(fn):
        try:
            out = fn(data)
            return None if out is None else out[0], None
        except errors.FlateError as e:
            return None, type(e).__name__

    def run_stream(d):
        st = native.InflateStream(d)
        parts = []
        while True:
            c = st.read(977)               # odd budget: mid-match suspends
            if not c:
                break
            parts.append(c)
        return b"".join(parts), None

    have_native = native.inflate_available()
    native_out, native_err = run(native.inflate_raw) \
        if have_native else (None, "unavailable")
    spec_out, spec_err = run(pyinf.inflate_raw_py)

    if native_err == "unavailable":
        native_out, native_err = spec_out, spec_err
        stream_out, stream_err = spec_out, spec_err
    else:
        stream_out, stream_err = run(run_stream)

    if native_err != spec_err or native_out != spec_out:
        print(f"DISAGREE native=({native_err}) spec=({spec_err})",
              file=sys.stderr)
        return 2
    if stream_err != spec_err or stream_out != spec_out:
        print(f"DISAGREE stream=({stream_err}) spec=({spec_err})",
              file=sys.stderr)
        return 2
    if spec_err is not None:
        print(f"ERR {spec_err}")
        return 1
    print(f"OK {len(spec_out)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
