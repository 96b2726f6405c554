r"""
:mod:`signal.cwt` -- Continuous wavelet transform / scaleogram
==============================================================

Complex Morlet CWT with log-spaced scales from the wavelet center
frequency (spec: ``xcorr/signal/cwt.py:28-261``, default wavelet
``cmor1.5-1.0``).

Divergence from the reference: pywt's integrated-psi convolution is
replaced by a direct FFT-domain wavelet filter bank — one batched complex
multiply per scale stack, the natural TPU formulation. The complex Morlet
``psi(t) = (pi*B)^(-1/2) exp(2i*pi*C*t) exp(-t^2/B)`` and the
scale-to-frequency mapping ``f = C * fs / scale`` match pywt's cmorB-C
definition.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from ..ndlabel import DataArray
from ..util.convert import to_numpy
from ..util.history import historicize
from ._helpers import core_dim_last, get_dim

__all__ = ["cwt", "scaleogram"]


def _parse_cmor(wavelet: str):
    m = re.match(r"cmor([\d.]+)-([\d.]+)", wavelet)
    if not m:
        raise ValueError(f"unsupported wavelet {wavelet!r}; expected "
                         "'cmorB-C'")
    return float(m.group(1)), float(m.group(2))


def cwt(x, wavelet: str = "cmor1.5-1.0", scales=None, freqs=None,
        nfreqs: int = 100, fmin: float = None, fmax: float = None,
        dim: str = None, dtype=None, **kwargs):
    """Complex CWT along ``dim``; output gains a leading labelled ``freq``
    dimension."""
    dim = get_dim(x, dim)
    coord = x.coords[dim]
    if "sampling_rate" in coord.attrs:
        fs = float(coord.attrs["sampling_rate"])
    else:
        vals = np.asarray(coord.values, dtype=np.float64)
        fs = 1.0 / float(np.abs(vals[1] - vals[0]))
    B, C = _parse_cmor(wavelet)

    n = x.sizes[dim]
    if freqs is None:
        if scales is not None:
            freqs = C * fs / np.asarray(scales, dtype=np.float64)
        else:
            fmax = fmax or fs / 2
            fmin = fmin or max(fs / n * 4, fmax / 1000)
            freqs = np.logspace(np.log10(fmin), np.log10(fmax), nfreqs)
    freqs = np.asarray(freqs, dtype=np.float64)
    scales_out = C * fs / freqs

    data, dims = core_dim_last(x, dim)
    X = jnp.fft.fft(data, axis=-1)  # (..., n)
    w = np.fft.fftfreq(n, d=1.0 / fs)  # Hz

    # frequency response of the Morlet at each scale:
    # Psi_hat(f) ~ exp(-pi^2 B (scale*f/fs*... )) — evaluate analytically:
    # psi(t)=(pi B)^(-1/2) exp(2i pi C t) exp(-t^2/B) has
    # FT(psi)(f) = exp(-pi^2 B (f - C)^2); scaled psi_s(t)=psi(t/s)/sqrt(s)
    # gives FT = sqrt(s) * exp(-pi^2 B (s f/fs*fs... ))
    sf = scales_out[:, None] * w[None, :] / fs  # dimensionless s*f/fs... *
    H = np.exp(-np.pi ** 2 * B * (sf - C) ** 2)  # (nscales, n)
    H = H * np.sqrt(scales_out[:, None] / fs)

    out = jnp.fft.ifft(X[..., None, :] * jnp.asarray(H), axis=-1)
    # (..., nscales, n)

    out_dims = tuple(d for d in dims if d != dim) + ("freq", dim)
    y = DataArray(to_numpy(out).astype(dtype or np.complex128),
                  dims=out_dims, name=x.name, attrs=dict(x.attrs))
    y._coords = {k: c for k, c in x.coords.items()
                 if all(d in out_dims for d in c.dims)}
    y._coords["freq"] = DataArray(freqs, dims=("freq",), name="freq", attrs={
        "long_name": "Frequency", "standard_name": "frequency",
        "units": "s-1", "wavelet": wavelet})
    historicize(y, f="cwt", a={"x": x.name, "wavelet": wavelet, "dim": dim})
    return y


def scaleogram(x, **kwargs):
    """|CWT|² power scaleogram (the reference's timelapse/psd input,
    ``xcorr/scripts/timelapse.py:208-209``)."""
    from .absolute import absolute
    y = absolute(cwt(x, **kwargs))
    y.data = y.data ** 2
    y.name = "psd"
    y.attrs["long_name"] = "Scaleogram Power"
    historicize(y, f="scaleogram", a={})
    return y
