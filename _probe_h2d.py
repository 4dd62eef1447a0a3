import time
import numpy as np, jax, jax.numpy as jnp
x = np.random.default_rng(0).integers(0, 256, 8 << 20, dtype=np.uint8)
for _ in range(2):
    d = jnp.asarray(x); np.asarray(d[:1])
t0 = time.time()
for _ in range(5):
    d = jnp.asarray(x); np.asarray(d[:1])
dt = (time.time() - t0) / 5
print(f"H2D 8MiB: {dt*1e3:.0f} ms = {x.size/dt/1e6:.0f} MB/s")
d2 = jnp.asarray(np.zeros(8 << 20, np.uint8))
np.asarray(d2[:1])
t0 = time.time()
for _ in range(5):
    h = np.asarray(d2)
dt = (time.time() - t0) / 5
print(f"D2H 8MiB: {dt*1e3:.0f} ms = {h.size/dt/1e6:.0f} MB/s")
