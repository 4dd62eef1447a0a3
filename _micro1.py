import time, numpy as np
import flate_tpu.jx
import jax, jax.numpy as jnp

# sustained, repeated
for mb in (4, 16, 64):
    x = np.random.randint(0, 255, mb << 20, dtype=np.uint8)
    h2=[];d2=[]
    for i in range(4):
        t0 = time.perf_counter(); d = jax.block_until_ready(jax.device_put(x)); h2.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); _ = jax.device_get(d); d2.append(time.perf_counter()-t0)
    print(f"{mb}MiB H2D MB/s:", [f"{mb/t:.0f}" for t in h2], " D2H MB/s:", [f"{mb/t:.0f}" for t in d2])
