r"""
:mod:`xcorr_tpu.stream` -- Waveform ingest
==========================================

Waveform containers, station inventory, the hashed preprocess-operations
DSL, and archive clients (reference layer: ``xcorr/stream/``).
"""

from .trace import Trace, Stream, Stats, UTCDateTime
from .inventory import Inventory, Channel, PAZResponse

__all__ = ["Trace", "Stream", "Stats", "UTCDateTime",
           "Inventory", "Channel", "PAZResponse"]
