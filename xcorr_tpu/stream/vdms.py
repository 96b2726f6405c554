r"""
:mod:`stream.vdms` -- CTBTO VDMS request hook
=============================================

The reference's third waterfall tier fetches IMS hydroacoustic data via the
optional ``pyvdms`` client (``xcorr/stream/client.py:760-789``). That
service needs CTBTO credentials and a message-queue round trip; this
module keeps the interface position in the waterfall with a pluggable
request callable so deployments with VDMS access can slot it in.
"""

from __future__ import annotations

import warnings

from .trace import Stream

__all__ = ["VDMSClient"]


class VDMSClient:
    """Placeholder VDMS tier: wraps a user-supplied ``request`` callable
    ``request(receiver: str, day) -> Stream``; without one, every query
    returns an empty stream with a one-time warning."""

    def __init__(self, request=None):
        self._request = request
        self._warned = False

    def available(self):
        return self._request is not None

    def get_waveforms(self, receiver: str, day, verb: int = 0) -> Stream:
        if self._request is None:
            if not self._warned:
                warnings.warn(
                    "VDMS tier not configured (no request callable); "
                    "skipping CTBTO IMS fetch.", UserWarning)
                self._warned = True
            return Stream()
        return self._request(receiver, day)
