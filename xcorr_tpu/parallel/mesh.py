r"""
:mod:`parallel.mesh` -- Device mesh helpers
===========================================

Mesh construction and batch shardings. The workload is embarrassingly
parallel over (pair x window) items (SURVEY.md §2.8 P1), so the canonical
mesh is 1-D over a ``batch`` axis; the (time1, time2) timelapse plane uses
a 2-D mesh (P2).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "P"]


def make_mesh(n_devices: int = None, axis_names=("batch",), shape=None):
    """1-D (or reshaped) device mesh over the first ``n_devices``
    devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devs = np.asarray(devices[:n])
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    return Mesh(devs.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "batch", ndim: int = 2):
    """NamedSharding that splits the leading (batch) dim over ``axis`` and
    replicates the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad ``x`` with zeros so its ``axis`` size divides ``multiple``;
    returns (padded, original_size)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return np.pad(x, widths), n
