"""Multi-device example: shard the (pair x window) batch over a mesh.

Run on any host with 8 virtual devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip.py
On a TPU pod slice the same code scales over the real chips.
"""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from xcorr_tpu.parallel import make_mesh, sharded_correlate

print("devices:", jax.devices())
mesh = make_mesh()

npts = 60_000
rng = np.random.default_rng(0)
base = rng.normal(size=(24, npts)).astype(np.float32)
lags = rng.integers(0, 2000, size=24)
x = np.stack([np.roll(b, l) for b, l in zip(base, lags)])

ccf = sharded_correlate(x, base, mesh=mesh, index_min=npts - 1,
                        index_max=npts - 1 + 5_000)
recovered = ccf.argmax(axis=-1)
print("injected lags :", lags[:8], "...")
print("recovered lags:", recovered[:8], "...")
assert (recovered == lags).all()
print(f"OK: {x.shape[0]} windows sharded over {mesh.devices.size} devices")
