"""Mutation fuzz of the decoder differential trio (no subprocess overhead)."""
import random, zlib, sys
from flate_tpu import errors, native
from flate_tpu import inflate as pyinf

random.seed(20260817)
seeds = []
base = b"the quick brown fox jumps over the lazy dog " * 40
for lv in (0, 1, 6, 9):
    seeds.append(zlib.compress(base, lv)[2:-4])
seeds.append(zlib.compress(bytes(range(256)) * 32, 6)[2:-4])
co = zlib.compressobj(6, zlib.DEFLATED, -15)
seeds.append(co.compress(base) + co.flush(zlib.Z_SYNC_FLUSH) + co.flush())

def spec(d):
    try:
        return pyinf.inflate_raw_py(d)[0], None
    except errors.FlateError as e:
        return None, type(e).__name__

def nat(d):
    try:
        r = native.inflate_raw(d)
        return r[0], None
    except errors.FlateError as e:
        return None, type(e).__name__

def stream(d):
    try:
        st = native.InflateStream(d)
        parts = []
        while True:
            c = st.read(977)
            if not c:
                break
            parts.append(c)
        return b"".join(parts), None
    except errors.FlateError as e:
        return None, type(e).__name__

n = 0
bad = 0
for it in range(4000):
    s = bytearray(random.choice(seeds))
    for _ in range(random.randint(1, 6)):
        op = random.random()
        if op < 0.5 and s:
            s[random.randrange(len(s))] ^= 1 << random.randrange(8)
        elif op < 0.75 and s:
            del s[random.randrange(len(s))]
        else:
            s.insert(random.randrange(len(s) + 1), random.randrange(256))
    d = bytes(s)
    a = spec(d); b = nat(d); c = stream(d)
    n += 1
    if a != b or a != c:
        bad += 1
        print(f"DISAGREE on mutation #{it}: spec={a[1] or len(a[0])} "
              f"native={b[1] or len(b[0])} stream={c[1] or len(c[0])}",
              flush=True)
        if bad > 5:
            sys.exit(2)
print(f"fuzz: {n} cases, {bad} disagreements")
sys.exit(1 if bad else 0)
