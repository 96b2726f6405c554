r"""
:mod:`signal.detrend` -- Detrend / demean
=========================================

NaN-aware constant/linear detrending along a dimension
(spec: ``xcorr/signal/detrend.py:31-145``).
"""

from __future__ import annotations

import numpy as np

from .. import ops
from ..util.history import historicize
from ._helpers import core_dim_last, get_dim, wrap_like

__all__ = ["detrend", "demean"]


def detrend(x, dim: str = None, type: str = None, **kwargs):
    """Remove the mean ('constant'/'demean') or least-squares line
    ('linear') along ``dim``."""
    dim = get_dim(x, dim)
    type = type or "constant"
    data, dims = core_dim_last(x, dim)
    if type in ("constant", "demean"):
        out = ops.detrend.demean(data)
    elif type == "linear":
        out = ops.detrend.detrend_linear(data)
    else:
        raise ValueError(f"unknown detrend type {type!r}")
    y = wrap_like(np.asarray(out).astype(x.dtype), x, dims)
    historicize(y, f="detrend", a={"x": x.name, "type": type, "dim": dim})
    return y


def demean(x, **kwargs):
    """Remove the mean along the core dim."""
    return detrend(x, type="demean", **kwargs)
