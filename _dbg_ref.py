"""Stage-by-stage CPU reference for the on-chip v2 differential.

Writes _dbg_ref.npz with inputs + expected outputs of each v2 stage
(computed in interpret mode on CPU, which the test suite validates)."""
import numpy as np
import jax

jax.config.update("jax_platform_name", "cpu")

import jax.numpy as jnp  # noqa: E402
from flate_tpu.jx import match2, pipeline2, encode2, pack as pk  # noqa: E402
from flate_tpu.jx import parse as prs  # noqa: E402

B, S, CTX = 2, 8192, 1024
K, NW, LAZY, MAXLZ = 8, 2, False, 0      # level-2-ish small config
K6, NW6 = 48, 4                           # level-6 config

rng = np.random.default_rng(42)
text = open("tests/data/rfc1951.txt", "rb").read()
shards = np.zeros((B, S), np.uint8)
shards[0] = np.frombuffer((text * 3)[:S], np.uint8)
mix = bytearray((text * 3)[S:2 * S])
mix[::7] = rng.integers(0, 256, len(mix[::7]), dtype=np.uint8).tobytes()
shards[1] = np.frombuffer(bytes(mix), np.uint8)
ctx0 = rng.integers(0, 256, CTX, dtype=np.uint8)
ctx_lens = np.asarray([CTX, CTX], np.int32)
valid = np.asarray([S, S - 333], np.int32)
finals = np.asarray([0, 1], np.int32)

tails = shards[:, S - CTX:]
prev = np.concatenate([ctx0[None, :], tails[:-1]], axis=0)
windows = np.concatenate([prev, shards], axis=1)

out = {"shards": shards, "ctx0": ctx0, "ctx_lens": ctx_lens,
       "valid": valid, "finals": finals, "windows": windows}

for tag, k, nw in (("a", K, NW), ("b", K6, NW6)):
    mlen, mdist = match2.find_matches_fused(
        jnp.asarray(windows), jnp.asarray(ctx_lens), jnp.asarray(valid),
        K=k, nw=nw, ctx=CTX, interpret=True)
    out[f"mlen_{tag}"] = np.asarray(mlen)
    out[f"mdist_{tag}"] = np.asarray(mdist)

# parse + fields from config b
mlen, mdist = jnp.asarray(out["mlen_b"]), jnp.asarray(out["mdist_b"])
take, _ = prs.decide(mlen, mdist, True, 32)
starts = prs.parse_walk(mlen, mdist, start=CTX, lazy=True, max_lazy=32,
                        interpret=True)
out["take"] = np.asarray(take)
out["starts"] = np.asarray(starts)
vals, bits, tb, kind = encode2.build_fields(
    jnp.asarray(windows[:, CTX:]), mlen[:, CTX:], mdist[:, CTX:],
    starts[:, CTX:], take[:, CTX:], jnp.asarray(valid),
    jnp.asarray(finals), S)
out["vals"] = np.asarray(vals)
out["bits"] = np.asarray(bits)
out["kind"] = np.asarray(kind)
nwr = pipeline2._nwr(S)
words, tbits = pk.pack_fields(vals, bits, nwr, interpret=True)
out["words"] = np.asarray(words)
out["tbits"] = np.asarray(tbits)
out["nwr"] = np.asarray(nwr)

np.savez("_dbg_ref.npz", **out)
print("ref written:", {k: v.shape for k, v in out.items() if hasattr(v, 'shape')})
