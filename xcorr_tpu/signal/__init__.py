r"""
:mod:`xcorr_tpu.signal` -- Labelled signal operations
=====================================================

The ~25 signal operations of the reference (``xcorr/signal/``) as labelled
wrappers over the jit-compiled device kernels in :mod:`xcorr_tpu.ops`:
validate dims -> move the core dim last -> run the batched kernel ->
restore coords/CF attrs -> append provenance history. Also registers the
``.signal`` accessor on :class:`xcorr_tpu.ndlabel.DataArray`.
"""

from .absolute import absolute, abs  # noqa: A004
from .beamform import plane_wave_estimate
from .correlate import correlate1d, correlate2d
from .cwt import cwt, scaleogram
from .detrend import detrend, demean
from .fft import fft, ifft, rfft, irfft
from .filter import filter  # noqa: A004
from .hilbert import hilbert, envelope
from .lombscargle import lombscargle
from .normalize import norm1d, norm2d
from .peak_local_max import peak_local_max
from .rms import rms
from .snr import snr
from .spectrogram import spectrogram
from .taper import taper
from .timeshift import timeshift
from .tri import tri_mask, tri_mirror
from .trigger import coincidence_trigger, trigger_periods, trigger_values
from .unbias import unbias, unbias_weights
from .window import window

from . import accessor  # noqa: F401  (registers .signal)

__all__ = ["absolute", "abs", "plane_wave_estimate", "correlate1d",
           "correlate2d", "cwt", "scaleogram", "detrend", "demean", "fft",
           "ifft", "rfft", "irfft", "filter", "hilbert", "envelope",
           "lombscargle", "norm1d", "norm2d", "peak_local_max", "rms",
           "snr", "spectrogram", "taper", "timeshift", "tri_mask",
           "tri_mirror", "coincidence_trigger", "trigger_periods",
           "trigger_values", "unbias", "unbias_weights", "window"]
