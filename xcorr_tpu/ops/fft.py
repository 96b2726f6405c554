r"""
:mod:`ops.fft` -- FFT sizing and spectral helpers
=================================================

TPU-friendly FFT length selection. The reference correlates at the hostile
odd length 2·npts-1 (8,639,999 = 29 × 297,931 for the canonical day window,
``xcorr/util/cc.py:66-67``); XLA TPU FFTs want smooth radix-2/3/5 sizes, so
every spectral kernel here pads to the next fast length and keeps the lag
bookkeeping exact (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["next_fast_len", "rfft_freqs"]


@lru_cache(maxsize=None)
def next_fast_len(n: int, radices=(2, 3, 5)) -> int:
    """Smallest integer >= n that factors entirely into ``radices``.

    Default 5-smooth sizes match XLA's efficient TPU FFT radices; the
    canonical padded day-correlation 8,639,999 maps to 8,640,000
    (= 2^9·3^3·5^4, ~1e-7 overhead) instead of the 94% overhead of the
    next power of two.
    """
    if n <= 1:
        return 1
    # upper bound: next power of two always qualifies
    limit = 1
    while limit < n:
        limit *= 2
    # enumerate all radices-smooth numbers <= limit
    vals = {1}
    for r in radices:
        new = set(vals)
        for v in vals:
            x = v
            while x * r <= limit:
                x *= r
                new.add(x)
        vals = new
    return min(v for v in vals if v >= n)


def rfft_freqs(nfft: int, delta: float):
    """Real-FFT frequency vector (numpy, host side)."""
    return np.fft.rfftfreq(nfft, d=delta)


def rfft(x, nfft: int):
    """Batched real FFT along the last axis, zero-padded to ``nfft``."""
    return jnp.fft.rfft(x, n=nfft, axis=-1)


def irfft(X, nfft: int):
    """Batched inverse real FFT along the last axis."""
    return jnp.fft.irfft(X, n=nfft, axis=-1)
