r"""
:mod:`signal.hilbert` -- Analytic signal and envelope
=====================================================

Frequency-domain analytic signal (spec: ``xcorr/signal/hilbert.py:29-120``
= scipy.signal.hilbert) and its magnitude envelope.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..util.convert import to_numpy
from ..util.history import historicize
from ._helpers import core_dim_last, get_dim, wrap_like

__all__ = ["hilbert", "envelope"]


def _analytic(data):
    n = data.shape[-1]
    X = jnp.fft.fft(data, axis=-1)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1
        h[1:n // 2] = 2
    else:
        h[0] = 1
        h[1:(n + 1) // 2] = 2
    return jnp.fft.ifft(X * jnp.asarray(h), axis=-1)


def hilbert(x, dim: str = None, **kwargs):
    """Analytic signal of ``x`` along ``dim`` (complex output)."""
    dim = get_dim(x, dim)
    data, dims = core_dim_last(x, dim)
    out = _analytic(data)
    y = wrap_like(to_numpy(out), x, dims)
    historicize(y, f="hilbert", a={"x": x.name, "dim": dim})
    return y


def envelope(x, dim: str = None, **kwargs):
    """Amplitude envelope: |hilbert(x)|."""
    from .absolute import absolute
    y = absolute(hilbert(x, dim=dim, **kwargs))
    historicize(y, f="envelope", a={"x": x.name, "dim": dim})
    return y
