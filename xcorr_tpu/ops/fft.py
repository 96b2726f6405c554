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


# Odd parts XLA's TPU FFT decomposes without falling back to a dense DFT
# matmul. Measured on v5e: 2^a (any a) and 2^a*{3,5,9,15} compile and run
# fast; a large smooth odd part (e.g. 8,640,000 = 2^9*16875) triggers an
# O(m^2) DFT-matrix lowering that OOMs HBM at day scale.
_TPU_SAFE_ODD = (1, 3, 5, 9, 15)


@lru_cache(maxsize=None)
def next_fast_len(n: int, radices=None) -> int:
    """Smallest TPU-efficient FFT length >= n.

    Candidates are ``2^a * m`` with the odd part ``m`` restricted to
    :data:`_TPU_SAFE_ODD`; the canonical padded day-correlation 8,639,999
    maps to 9,437,184 (= 2^20*9, 9.2% overhead) instead of the 94%
    overhead of the next power of two — and never hits XLA's dense-DFT
    fallback that a fully 5-smooth size (8,640,000) triggers.

    Passing explicit ``radices`` (e.g. (2, 3, 5)) restores an unrestricted
    smooth-number search (useful off-TPU).
    """
    if n <= 1:
        return 1
    # upper bound: next power of two always qualifies
    limit = 1
    while limit < n:
        limit *= 2
    if radices is None:
        best = limit
        for m in _TPU_SAFE_ODD:
            v = m
            while v < n:
                v *= 2
            if v <= limit:
                best = min(best, v)
        return best
    # unrestricted smooth-number search
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
