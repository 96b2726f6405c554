r"""
:mod:`ops.detrend` -- Demean / detrend
======================================

NaN-aware constant and linear detrending along the last axis
(spec: ``xcorr/signal/detrend.py:31-145``). Closed-form least squares —
no factorizations, pure fused elementwise + reductions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["demean", "detrend_linear"]


def demean(x):
    """Subtract the (NaN-aware) mean along the last axis."""
    m = jnp.nanmean(x, axis=-1, keepdims=True)
    return x - m


def detrend_linear(x):
    """Remove the least-squares line along the last axis (NaN-aware)."""
    n = x.shape[-1]
    t = jnp.arange(n, dtype=x.dtype)
    valid = ~jnp.isnan(x)
    xf = jnp.where(valid, x, 0.0)
    cnt = jnp.sum(valid, axis=-1, keepdims=True).astype(x.dtype)
    st = jnp.sum(jnp.where(valid, t, 0.0), axis=-1, keepdims=True)
    stt = jnp.sum(jnp.where(valid, t * t, 0.0), axis=-1, keepdims=True)
    sx = jnp.sum(xf, axis=-1, keepdims=True)
    stx = jnp.sum(xf * t, axis=-1, keepdims=True)
    det = cnt * stt - st * st
    slope = jnp.where(det != 0, (cnt * stx - st * sx) / det, 0.0)
    intercept = jnp.where(cnt != 0, (sx - slope * st) / cnt, 0.0)
    return x - (intercept + slope * t)
