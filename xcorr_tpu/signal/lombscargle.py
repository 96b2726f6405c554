r"""
:mod:`signal.lombscargle` -- Lomb-Scargle periodogram
=====================================================

NaN-tolerant Lomb-Scargle over an axis
(spec: ``xcorr/signal/lombscargle.py:106-141`` =
scipy.signal.lombscargle with per-row valid masks).
"""

from __future__ import annotations

import numpy as np
import scipy.signal as sp_signal

from ..ndlabel import DataArray
from ..util.history import historicize
from ._helpers import get_dim

__all__ = ["lombscargle"]


def lombscargle(x, freqs=None, nfreqs: int = 100, dim: str = None,
                normalize: bool = False, **kwargs):
    """Lomb-Scargle periodogram along ``dim``, skipping NaN samples
    per row."""
    dim = get_dim(x, dim)
    coord = np.asarray(x.coords[dim].values, dtype=np.float64)
    if freqs is None:
        span = coord[-1] - coord[0]
        fmin = 1.0 / span
        fmax = 0.5 * (coord.size - 1) / span
        freqs = np.linspace(fmin, fmax, nfreqs)
    freqs = np.asarray(freqs, dtype=np.float64)
    ang = 2 * np.pi * freqs

    order = tuple(d for d in x.dims if d != dim) + (dim,)
    data = x.transpose(*order).data
    flat = data.reshape(-1, data.shape[-1])
    out = np.zeros((flat.shape[0], freqs.size))
    for i, row in enumerate(flat):
        valid = ~np.isnan(row)
        if valid.sum() < 2:
            out[i] = np.nan
            continue
        out[i] = sp_signal.lombscargle(coord[valid],
                                       row[valid] - row[valid].mean(),
                                       ang, normalize=normalize)
    out = out.reshape(data.shape[:-1] + (freqs.size,))

    out_dims = tuple(d for d in order if d != dim) + ("freq",)
    y = DataArray(out, dims=out_dims, name=x.name, attrs=dict(x.attrs))
    y._coords = {k: c for k, c in x.coords.items()
                 if all(d in out_dims for d in c.dims)}
    y._coords["freq"] = DataArray(freqs, dims=("freq",), name="freq", attrs={
        "long_name": "Frequency", "units": "s-1"})
    historicize(y, f="lombscargle", a={"x": x.name, "dim": dim,
                                       "normalize": normalize})
    return y
