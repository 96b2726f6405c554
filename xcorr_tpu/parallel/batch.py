r"""
:mod:`parallel.batch` -- Sharded batch correlation engine
=========================================================

The multi-chip production path: the dense ``(batch, npts)`` waveform block
shards over the mesh's ``batch`` axis and every device runs the same fused
correlation kernel on its shard — no collectives needed in the forward
pass (the workload is a pure map, SURVEY.md §2.8 P1). Host-side prefetch
feeds per-device shards; results gather only for the host writer.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import ops
from .mesh import make_mesh, pad_to_multiple

__all__ = ["sharded_correlate", "BatchEngine"]


def sharded_correlate(x, y, mesh=None, index_min: int = None,
                      index_max: int = None, normalize: bool = True,
                      unbiased: bool = False):
    """Correlate a (batch, n) block sharded over the mesh batch axis.

    The batch pads up to a device multiple, shards, runs the jitted kernel
    (XLA partitions it with zero communication) and trims the padding.
    """
    mesh = mesh or make_mesh()
    ndev = mesh.devices.size
    x = np.asarray(x)
    y = np.asarray(y)
    xp, n0 = pad_to_multiple(x, ndev, axis=0)
    yp, _ = pad_to_multiple(y, ndev, axis=0)

    sharding = NamedSharding(mesh, P("batch", None))
    xd = jax.device_put(xp, sharding)
    yd = jax.device_put(yp, sharding)

    fn = partial(ops.cc.correlate, normalize=normalize,
                 index_min=index_min, index_max=index_max,
                 unbiased=unbiased)
    out = jax.jit(fn, out_shardings=NamedSharding(mesh, P("batch", None)))(
        xd, yd)
    return np.asarray(out)[:n0]


class BatchEngine:
    """Device-batched (pair x window) correlation with host prefetch.

    Wraps a fixed (npts, lag-window) configuration into one compiled
    executable reused across the whole archive — the multi-chip
    counterpart of :func:`xcorr_tpu.core.process.process`.
    """

    def __init__(self, npts: int, index_min: int = None,
                 index_max: int = None, normalize: bool = True,
                 mesh=None, dtype=np.float32):
        self.npts = npts
        self.index_min = index_min
        self.index_max = index_max
        self.normalize = normalize
        self.mesh = mesh or make_mesh()
        self.dtype = dtype
        self._sharding = NamedSharding(self.mesh, P("batch", None))
        self._fn = jax.jit(
            partial(ops.cc.correlate, normalize=normalize,
                    index_min=index_min, index_max=index_max),
            out_shardings=self._sharding)

    def __call__(self, x, y):
        ndev = self.mesh.devices.size
        x = np.asarray(x, dtype=self.dtype)
        y = np.asarray(y, dtype=self.dtype)
        if x.shape[-1] != self.npts:
            raise ValueError(
                f"expected npts={self.npts}, got {x.shape[-1]}")
        xp, n0 = pad_to_multiple(x, ndev, axis=0)
        yp, _ = pad_to_multiple(y, ndev, axis=0)
        xd = jax.device_put(xp, self._sharding)
        yd = jax.device_put(yp, self._sharding)
        return np.asarray(self._fn(xd, yd))[:n0]
