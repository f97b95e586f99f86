"""Probe axon tunnel host->device transfer bandwidth + native MSM rate.

Decides the round-3 SRS/setup strategy: native host fixed-base + one
device_put vs device-side fixed-base generation.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "tpu")
import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), file=sys.stderr)

# ---- host->device bandwidth -------------------------------------------------
for mb in (16, 128):
    a = np.random.randint(0, 2**16, size=(mb * 1024 * 1024 // 4,), dtype=np.uint32)
    t0 = time.perf_counter()
    d = jax.device_put(a)
    d.block_until_ready()
    # block_until_ready may not force on axon; force a dependent tiny readback
    _ = np.asarray(d[:1])
    dt = time.perf_counter() - t0
    print(f"h2d {mb} MB: {dt:.2f}s -> {mb/dt:.1f} MB/s", file=sys.stderr)

# ---- device->host small readback latency -------------------------------------
t0 = time.perf_counter()
for _ in range(10):
    _ = np.asarray(d[:1])
print(f"tiny readback: {(time.perf_counter()-t0)/10*1e3:.1f} ms", file=sys.stderr)
