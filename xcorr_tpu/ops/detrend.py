r"""
:mod:`ops.detrend` -- Demean / detrend
======================================

NaN-aware constant and linear detrending along the last axis
(spec: ``xcorr/signal/detrend.py:31-145``). Closed-form least squares —
no factorizations, pure fused elementwise + reductions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["demean", "detrend_linear", "detrend_simple"]


def demean(x):
    """Subtract the (NaN-aware) mean along the last axis."""
    m = jnp.nanmean(x, axis=-1, keepdims=True)
    return x - m


def detrend_simple(x):
    """Subtract the line through the FIRST and LAST samples along the
    last axis — obspy's ``detrend('simple')``, which is an endpoint
    line, NOT the least-squares fit (``stream/trace.py`` detrend)."""
    n = x.shape[-1]
    if n < 2:
        return x
    first = x[..., :1]
    slope = (x[..., -1:] - first) / jnp.asarray(n - 1, x.dtype)
    t = jnp.arange(n, dtype=x.dtype)
    return x - (first + slope * t)


def detrend_linear(x):
    """Remove the least-squares line along the last axis (NaN-aware).

    The fit runs on a CENTERED time axis: the uncentered normal
    equations subtract near-equal ~n^3-magnitude sums (``cnt*stt -
    st*st`` and ``sx - slope*st``), which at day scale in float32
    cancels catastrophically (measured: a 1e-3/sample trend over 4.75M
    samples left an O(0.01) constant offset, 15x the f64 answer).
    Centering t on its per-row valid mean makes every sum either
    sign-definite or data-scaled — no cancellation of time-axis
    magnitudes.
    """
    n = x.shape[-1]
    t = jnp.arange(n, dtype=x.dtype) - jnp.asarray(0.5 * (n - 1), x.dtype)
    valid = ~jnp.isnan(x)
    xf = jnp.where(valid, x, 0.0)
    cnt = jnp.sum(valid, axis=-1, keepdims=True).astype(x.dtype)
    st = jnp.sum(jnp.where(valid, t, 0.0), axis=-1, keepdims=True)
    tm = jnp.where(cnt != 0, st / cnt, 0.0)   # valid-sample center
    u = t - tm
    um = jnp.where(valid, u, 0.0)
    suu = jnp.sum(um * um, axis=-1, keepdims=True)   # sign-definite
    sx = jnp.sum(xf, axis=-1, keepdims=True)
    ym = jnp.where(cnt != 0, sx / cnt, 0.0)
    sux = jnp.sum(um * xf, axis=-1, keepdims=True)   # sum(u)=0 on valid
    slope = jnp.where(suu != 0, sux / suu, 0.0)
    return x - (ym + slope * u)
