r"""
:mod:`stream.vdms` -- CTBTO VDMS request tier
=============================================

The reference's third waterfall tier fetches IMS hydroacoustic data via
the optional ``pyvdms`` client (``xcorr/stream/client.py:760-789``,
``:163-180``): an IMS2.0 waveform request is submitted to the CTBTO
message system, its status polled until completion, and the returned
miniSEED parsed into a day stream (archived by the caller through the
``max_gap`` gate, like every downloaded tier).

That service needs CTBTO principal-user credentials and a message-queue
round trip, so this module implements the full request/poll/parse cycle
against a pluggable *transport* (``submit``/``status``/``fetch``) —
deployments with VDMS access wire a thin adapter over pyvdms or the raw
message queue; tests inject a fake transport. A bare ``request``
callable (the round-1 hook) is still accepted.
"""

from __future__ import annotations

import time as _time
import warnings

from .trace import Stream

__all__ = ["VDMSClient", "format_ims2_request"]

#: terminal states of a VDMS request (pyvdms last_request semantics)
_DONE = ("COMPLETED", "SUCCESS")
_FAILED = ("ERROR", "FAILED", "REJECTED", "CANCELLED")


def format_ims2_request(receiver: str, day, msg_id: str,
                        email: str = None) -> str:
    """The IMS2.0 waveform request message for one receiver-day.

    Mirrors the message pyvdms submits for
    ``Client.get_waveforms(net, sta, loc, cha, t0, t0+86400)``.
    """
    import pandas as pd
    net, sta, loc, cha = receiver.split(".")
    t0 = pd.to_datetime(day).normalize()
    t1 = t0 + pd.Timedelta(days=1)
    fmt = "%Y/%m/%d %H:%M:%S"
    lines = [
        "BEGIN IMS2.0",
        "MSG_TYPE REQUEST",
        f"MSG_ID {msg_id}",
    ]
    if email:
        lines.append(f"E-MAIL {email}")
    lines += [
        f"TIME {t0.strftime(fmt)} TO {t1.strftime(fmt)}",
        f"STA_LIST {sta}",
        f"CHAN_LIST {cha}",
        "WAVEFORM IMS2.0:CM6",
        "STOP",
    ]
    return "\n".join(lines)


class VDMSClient:
    """VDMS waterfall tier over a pluggable transport.

    Parameters
    ----------
    request : callable, optional
        Legacy one-shot hook ``request(receiver, day) -> Stream``; takes
        precedence when given.
    transport : object, optional
        Message-queue adapter with
        ``submit(message: str) -> request_id``,
        ``status(request_id) -> str`` (QUEUED/RUNNING/COMPLETED/ERROR…),
        ``fetch(request_id) -> Stream | bytes`` (miniSEED payload).
    email : str, optional
        Contact address stamped into the IMS2.0 message.
    poll_interval, timeout : float
        Status-poll cadence and overall deadline in seconds.
    """

    def __init__(self, request=None, transport=None, email: str = None,
                 poll_interval: float = 1.0, timeout: float = 300.0):
        self._request = request
        self._transport = transport
        self._email = email
        self._poll_interval = poll_interval
        self._timeout = timeout
        self._counter = 0
        self._warned = False
        #: (request_id, status) of the most recent request, for
        #: inspection after a fetch (pyvdms ``last_request`` analogue)
        self.last_request = None

    def available(self):
        return self._request is not None or self._transport is not None

    def get_waveforms(self, receiver: str, day, verb: int = 0) -> Stream:
        if self._request is not None:
            return self._request(receiver, day)
        if self._transport is None:
            if not self._warned:
                warnings.warn(
                    "VDMS tier not configured (no transport or request "
                    "callable); skipping CTBTO IMS fetch.", UserWarning)
                self._warned = True
            return Stream()

        self._counter += 1
        msg_id = f"xcorr_tpu_{self._counter}"
        message = format_ims2_request(receiver, day, msg_id, self._email)
        request_id = self._transport.submit(message)
        self.last_request = (request_id, "SUBMITTED")

        deadline = _time.monotonic() + self._timeout
        while True:
            status = str(self._transport.status(request_id)).upper()
            self.last_request = (request_id, status)
            if status in _DONE:
                break
            if status in _FAILED:
                if verb > 0:
                    print(f"VDMS request {request_id} failed: {status}")
                return Stream()
            if _time.monotonic() >= deadline:
                warnings.warn(
                    f"VDMS request {request_id} timed out after "
                    f"{self._timeout:.0f}s (last status {status})",
                    UserWarning)
                return Stream()
            _time.sleep(self._poll_interval)

        result = self._transport.fetch(request_id)
        if result is None:
            return Stream()
        if isinstance(result, Stream):
            return result
        if isinstance(result, (bytes, bytearray)):
            from ..native.mseed import read_mseed_bytes
            return Stream(read_mseed_bytes(bytes(result)))
        # a list of traces
        return Stream(list(result))
