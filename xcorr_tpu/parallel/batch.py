r"""
:mod:`parallel.batch` -- Sharded batch correlation helper
=========================================================

One-shot multi-chip correlation of a dense ``(batch, npts)`` waveform
block: the batch shards over the mesh's ``batch`` axis and every device
runs the same fused correlation kernel on its shard — no collectives in
the forward pass (the workload is a pure map, SURVEY.md §2.8 P1). The
PRODUCTION multi-chip path is
:class:`xcorr_tpu.parallel.pipeline.MultiSpanPipeline` (same sharding,
plus on-device windowing and preprocess chains); this helper covers the
ad-hoc "correlate this block over the mesh" case and the tests.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import ops, util
from .mesh import make_mesh, pad_to_multiple

__all__ = ["sharded_correlate"]


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
    # row-chunked + int16-packed on tunneled runtimes (plain single
    # copy elsewhere; codec policy in util.xfer)
    return util.xfer.device_fetch(util.xfer.pack_for_wire(out[:n0]))
