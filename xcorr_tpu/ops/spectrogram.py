r"""
:mod:`ops.spectrogram` -- Batched STFT power spectrograms
=========================================================

Framed rfft with arbitrary hop (spec: ``xcorr/signal/spectrogram.py:124-158``
= scipy.signal.spectrogram with per-sample hop and zero padding). Framing is
a strided gather; the FFT batches all frames at once — the TPU answer to
scipy's per-segment loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.signal as sp_signal

__all__ = ["stft_psd"]


def stft_psd(x, win_len: int, hop: int = 1, nfft: int = None,
             window: str = "hann", sampling_rate: float = 1.0,
             scaling: str = "density"):
    """Power spectrogram along the last axis.

    Returns ``(freqs, psd)`` with psd shaped ``(..., nfreq, nframes)``
    (frequency leading, matching the reference layout ``(freq, time)``).
    ``nframes = (n - win_len)//hop + 1``.
    """
    n = x.shape[-1]
    nfft = nfft or win_len
    win = sp_signal.get_window(window, win_len).astype(np.float64)
    nframes = (n - win_len) // hop + 1

    idx = np.arange(win_len)[None, :] + hop * np.arange(nframes)[:, None]
    frames = x[..., idx]  # (..., nframes, win_len)
    frames = frames * jnp.asarray(win, dtype=x.dtype)
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    psd = (spec.real ** 2 + spec.imag ** 2)
    if scaling == "density":
        scale = 1.0 / (sampling_rate * float((win ** 2).sum()))
    else:  # 'spectrum'
        scale = 1.0 / float(win.sum() ** 2)
    psd = psd * jnp.asarray(scale, dtype=psd.dtype)
    # one-sided correction (all bins except DC and Nyquist doubled)
    nf = psd.shape[-1]
    corr = np.full(nf, 2.0)
    corr[0] = 1.0
    if nfft % 2 == 0:
        corr[-1] = 1.0
    psd = psd * jnp.asarray(corr, dtype=psd.dtype)
    freqs = np.fft.rfftfreq(nfft, d=1.0 / sampling_rate)
    return freqs, jnp.swapaxes(psd, -1, -2)
