r"""
:mod:`signal.peak_local_max` -- 2-D local peak detection
========================================================

Local maxima over the trailing two dims via max-pool comparison
(spec: ``xcorr/signal/peak_local_max.py:95-188`` =
skimage.feature.peak_local_max). The TPU formulation is a
``reduce_window`` max filter followed by an equality compare — no
coordinate sorting loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..ndlabel import DataArray, Dataset
from ..util.history import historicize

__all__ = ["peak_local_max"]


def _max_filter_2d(data, size):
    """Sliding-window maximum over the trailing two dims."""
    ndim = data.ndim
    window = (1,) * (ndim - 2) + (size, size)
    strides = (1,) * ndim
    return jax.lax.reduce_window(
        data, -jnp.inf, jax.lax.max, window, strides, "SAME")


def peak_local_max(x, min_distance: int = 1, threshold_abs: float = None,
                   threshold_rel: float = None, exclude_border: bool = True,
                   dims: tuple = None, extend: bool = False,
                   as_dataframe: bool = False, **kwargs):
    """Boolean peak mask (or extended outputs) over the trailing two dims.

    Peaks are points equal to the maximum within a
    ``(2·min_distance+1)²`` neighborhood, above the thresholds.
    """
    dims = tuple(dims) if dims else x.dims[-2:]
    order = tuple(d for d in x.dims if d not in dims) + dims
    data = jnp.asarray(np.nan_to_num(
        np.asarray(x.transpose(*order).data, dtype=np.float64),
        nan=-np.inf))

    size = 2 * int(min_distance) + 1
    mx = _max_filter_2d(data, size)
    peaks = (data == mx) & jnp.isfinite(data)
    if threshold_abs is not None:
        peaks &= data > threshold_abs
    if threshold_rel is not None:
        peaks &= data > threshold_rel * jnp.max(data, axis=(-2, -1),
                                                keepdims=True)
    if exclude_border:
        b = int(min_distance)
        mask = np.zeros(data.shape[-2:], dtype=bool)
        if b > 0:
            mask[b:-b, b:-b] = True
        else:
            mask[:, :] = True
        peaks &= jnp.asarray(mask)

    out = DataArray(np.asarray(peaks), dims=order, name=f"plm_{x.name}",
                    attrs={"long_name": "Local peak mask", "units": "-",
                           "min_distance": min_distance})
    out._coords = {k: c for k, c in x.coords.items()
                   if all(d in order for d in c.dims)}
    historicize(out, f="peak_local_max", a={
        "x": x.name, "min_distance": min_distance, "dim": list(dims)})

    if not (extend or as_dataframe):
        if order != x.dims:
            out = out.transpose(*x.dims)
        return out

    vals = x.transpose(*order).copy(deep=False)
    vals.data = np.where(np.asarray(peaks), vals.data, np.nan)
    if extend and not as_dataframe:
        ds = Dataset()
        ds[out.name] = out
        ds[f"{x.name}_peaks"] = vals
        return ds

    # long-form DataFrame of peak coordinates + values, ranked by value
    pk = np.asarray(peaks)
    idx = np.argwhere(pk)
    rows = {}
    for axis, d in enumerate(order):
        coord = x.coords.get(d)
        cvals = (np.asarray(coord.values) if coord is not None
                 else np.arange(x.sizes[d]))
        rows[d] = cvals[idx[:, axis]]
    rows["value"] = np.asarray(x.transpose(*order).data)[tuple(idx.T)]
    df = pd.DataFrame(rows).sort_values("value", ascending=False)
    return df.reset_index(drop=True)
