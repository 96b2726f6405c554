r"""
xcorr-tpu
=========

A TPU-native waveform cross-correlation framework: the capabilities of
``psmsmets/xcorr`` rebuilt on JAX/XLA/Pallas.

The public facade mirrors the reference's (``xcorr/__init__.py:34-51``):
``init``, ``process``, ``postprocess``, ``merge``, ``read``, ``write``,
``mfread``, ``lazy_process``, ``Client``.
"""

__version__ = "0.1.0"

from . import ndlabel  # noqa: F401

__all__ = ["ndlabel", "__version__"]
