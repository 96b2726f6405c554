"""Sequence-parallel correlation: shard ONE window across devices.

Batch sharding (examples/multichip.py) scales over *many* windows; this
example shards the four-step correlation of a *single* pair of long
windows over the mesh instead (SURVEY.md 2.8 P6) — the capacity escape
hatch when one window's spectral working set exceeds a chip's HBM.

The k1 (slow DFT) axis of the four-step factorization splits across the
``seq`` mesh axis: stage A frees k1 so the rows shard cleanly, every
middle stage (twiddle, stage-B DFTs, spectral multiply, inverse
stage-B) is row-local, and the single cross-device collective is the
pruned inverse DFT contraction — an all-reduce riding ICI on a real
pod slice.

Run on any host with 8 virtual devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/sequence_parallel.py
(Host meshes use the all-matmul stage-B: XLA's CPU fft thunk rejects
the layouts sharding induces; on TPU both stage-B forms shard.)
"""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np
from jax.sharding import Mesh

from xcorr_tpu.ops import fft4

print("devices:", len(jax.devices()))

# a (batch=2, seq=4) mesh: 2-way data parallel x 4-way sequence parallel
devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
mesh = Mesh(devs, ("batch", "seq"))

n = 20_000
rng = np.random.default_rng(0)
sig = rng.normal(size=n + 500).astype(np.float32)
lag = 123
x = np.stack([sig[250:250 + n], sig[250:250 + n]])
# y leads x by `lag` samples -> the CCF peaks at +lag
y = np.stack([sig[250 + lag:250 + lag + n], sig[250:250 + n]])

imin, imax = n - 1, n - 1 + 1000  # non-negative lags only
corr = fft4.plan_correlate4(n, imin, imax, n1=16, stageb="matmul",
                            mesh=mesh)
ccf = np.asarray(corr(x, y))
peaks = np.argmax(ccf, axis=1)  # index 0 = zero lag (imin = n-1)
print("CCF", ccf.shape, "peak lags:", peaks)
assert peaks[0] == lag and peaks[1] == 0, peaks

# the pruned inverse contraction over the seq-sharded k1 axis is the
# one collective GSPMD inserts
hlo = corr.lower(x, y).compile().as_text()
print("cross-device reduction in HLO:", "all-reduce" in hlo)
assert "all-reduce" in hlo or "reduce-scatter" in hlo
print("sequence-parallel CCF OK")
