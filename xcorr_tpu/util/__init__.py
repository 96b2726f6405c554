r"""
:mod:`xcorr_tpu.util` -- Utilities
==================================

Host-side utilities: provenance hashing, history logging, time handling,
SEED-id/geodesy receiver helpers and correlation lag math
(reference layer: ``xcorr/util/``).
"""

from . import (cc, geo, hasher, history, metadata, profiler, sysmem,
               receiver, time, convert, xfer)
from .hasher import (hash, hash_obj, hash_Trace, hash_Stream, hash_DataArray,
                     hash_Dataset)
from .history import historicize
from .time import to_seconds, to_datetime, get_dates, update_lag_indices

__all__ = ["cc", "geo", "hasher", "history", "metadata", "profiler",
           "receiver", "time", "xfer",
           "convert", "hash", "hash_obj", "hash_Trace", "hash_Stream",
           "hash_DataArray", "hash_Dataset", "historicize", "to_seconds",
           "to_datetime", "get_dates", "update_lag_indices"]
