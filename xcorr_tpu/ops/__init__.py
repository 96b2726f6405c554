r"""
:mod:`xcorr_tpu.ops` -- Device compute kernels
==============================================

The TPU compute layer: jit-compiled JAX/XLA (and Pallas) kernels operating on
dense, batched arrays. Every kernel is shape-static, batch-leading and
fusable; the labelled-array wrappers live in :mod:`xcorr_tpu.signal`.

Replaces the reference's third-party native hot paths (pyfftw/scipy per-trace
calls; see SURVEY.md §2.9).
"""

from . import fft, fft4, cc, filter, taper, detrend, timeshift, spectrogram

__all__ = ["fft", "fft4", "cc", "filter", "taper", "detrend", "timeshift",
           "spectrogram"]
