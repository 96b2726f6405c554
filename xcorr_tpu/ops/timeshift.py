r"""
:mod:`ops.timeshift` -- Sub-sample spectral time shift
======================================================

Shift signals by (possibly per-row) sub-sample delays via
``rfft -> X·exp(-2πi·delay·f) -> irfft``
(spec: ``xcorr/signal/timeshift.py:90-96``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fft import next_fast_len

__all__ = ["timeshift"]


def timeshift(x, delay, delta: float, nfft: int = None):
    """Shift ``x`` along the last axis by ``delay`` seconds.

    ``delay`` broadcasts against the batch dims (e.g. per-(pair, time)
    offsets). Positive delay moves the signal to later times.
    """
    n = x.shape[-1]
    nfft = nfft or next_fast_len(n)
    X = jnp.fft.rfft(x, n=nfft, axis=-1)
    f = jnp.fft.rfftfreq(nfft, d=delta).astype(x.dtype)
    delay = jnp.asarray(delay, dtype=x.dtype)[..., None]
    # phase ramp via lax.complex — a complex literal (-2j...) would
    # embed a complex constant, which the axon PJRT tunnel cannot
    # transfer to the device
    theta = (-2.0 * jnp.pi) * f * delay.astype(jnp.result_type(
        x.dtype, jnp.float32))
    phase = jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
    y = jnp.fft.irfft(X * phase, n=nfft, axis=-1)
    return y[..., :n].astype(x.dtype)
