r"""
:mod:`util.convert` -- DataArray <-> Trace/Stream bridge
========================================================

Convert labelled arrays into :class:`xcorr_tpu.stream.Trace`/``Stream``
objects (reference: ``xcorr/util/convert.py:25-119`` — the bridge that lets
trigger logic run on labelled data).
"""

from __future__ import annotations

import numpy as np

from .time import to_datetime

__all__ = ["to_trace", "to_stream", "to_device", "to_numpy"]


def to_device(a):
    """Device-put that splits complex arrays into re/im float transfers
    (the axon PJRT tunnel cannot move complex in either direction) and
    recombines with :func:`jax.lax.complex` on device."""
    import jax
    import jax.numpy as jnp
    a = np.asarray(a)
    if np.iscomplexobj(a):
        rdt = np.float32 if a.dtype == np.complex64 else np.float64
        return jax.lax.complex(
            jnp.asarray(np.ascontiguousarray(a.real).astype(rdt,
                                                            copy=False)),
            jnp.asarray(np.ascontiguousarray(a.imag).astype(rdt,
                                                            copy=False)))
    return jnp.asarray(a)


def to_numpy(a):
    """Host-fetch that splits complex device arrays into two real
    transfers (see :func:`to_device`)."""
    import jax.numpy as jnp
    if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                              jnp.complexfloating):
        re = np.asarray(jnp.real(a))
        im = np.asarray(jnp.imag(a))
        out = np.empty(re.shape,
                       dtype=np.result_type(re.dtype, np.complex64))
        out.real = re
        out.imag = im
        return out
    return np.asarray(a)


def to_trace(x, dim: str = None, starttime=None, name: str = None):
    """Convert an equidistantly-sampled 1-D DataArray into a Trace."""
    from ..stream.trace import Trace, Stats

    dim = dim or x.dims[-1]
    if len(x.dims) != 1:
        raise ValueError("x should be 1-dimensional (squeeze first)")
    coord = x.coords[dim].values
    if np.issubdtype(coord.dtype, np.datetime64):
        deltas = np.diff(coord) / np.timedelta64(1, "s")
        t0 = to_datetime(coord[0])
    else:
        deltas = np.diff(coord.astype(np.float64))
        t0 = to_datetime(starttime) if starttime is not None else None
    delta = float(np.median(deltas))
    if not np.allclose(deltas, delta, rtol=1e-6):
        raise ValueError(f"coordinate {dim!r} is not equidistant")

    data = np.asarray(x.values, dtype=np.float64)
    data = np.nan_to_num(data, nan=0.0)
    stats = Stats(
        network="XC", station=(name or x.name or "DA")[:5].upper(),
        location="", channel=dim[:3].upper(),
        starttime=t0, sampling_rate=1.0 / delta, npts=data.size,
    )
    return Trace(data=data, header=stats)


def to_stream(x, dim: str = None, **kwargs):
    """Convert a 2-D DataArray into a Stream of traces over the leading
    dimension."""
    from ..stream.trace import Stream

    dim = dim or x.dims[-1]
    other = [d for d in x.dims if d != dim]
    if len(other) != 1:
        raise ValueError("x should be 2-dimensional")
    traces = []
    for i in range(x.sizes[other[0]]):
        xi = x.isel({other[0]: i})
        tr = to_trace(xi, dim=dim, **kwargs)
        lab = x.coords.get(other[0])
        if lab is not None:
            tr.stats.station = str(np.asarray(lab.values)[i])[:8]
        traces.append(tr)
    return Stream(traces)
