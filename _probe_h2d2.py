import time, pathlib
import numpy as np, jax, jax.numpy as jnp
def meas(x, label):
    d = jnp.asarray(x); np.asarray(d[:1])
    t0 = time.time()
    for _ in range(3):
        d = jnp.asarray(x); np.asarray(d[:1])
    dt = (time.time() - t0) / 3
    print(f"H2D {label}: {dt*1e3:.0f} ms = {x.size/dt/1e6:.0f} MB/s", flush=True)
rng = np.random.default_rng(0)
meas(rng.integers(0, 256, 8 << 20, dtype=np.uint8), "random 8MiB")
meas(np.zeros(8 << 20, np.uint8), "zeros 8MiB")
t = pathlib.Path("tests/data/rfc1951.txt").read_bytes()
meas(np.frombuffer((t * 400)[:8 << 20], np.uint8), "text 8MiB")
