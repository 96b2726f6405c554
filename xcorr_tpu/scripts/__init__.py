r"""
:mod:`xcorr_tpu.scripts` -- CLI entry points
============================================

The seven cookbook console scripts (reference ``setup.cfg:51-59``):
``xcorr-snr``, ``xcorr-ct``, ``xcorr-psd``, ``xcorr-timelapse``,
``xcorr-beamform``, ``xcorr-plmax``, ``xcorr-swresp`` (+ the ``cc`` batch
config).
"""

from . import utils  # noqa: F401

__all__ = ["utils"]
