r"""
:mod:`parallel.distributed` -- Multi-host initialization
========================================================

Pod-slice / multi-host bring-up (SURVEY.md §2.8 P5: the reference forms a
Dask cluster from a scheduler file, ``xcorr/scripts/utils.py:50-79``; the
TPU equivalent is ``jax.distributed.initialize`` + per-host processes).

Work distribution across hosts stays embarrassingly parallel: each host
processes its own slice of the (pair x day) grid and writes its own
shards; the device mesh then spans all hosts' chips for the batched
compute (``jax.make_mesh`` over ``jax.devices()``).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["initialize", "host_slice"]


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None):
    """Initialize JAX multi-host (no-op when single-process).

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID) or cloud
    TPU metadata when available.
    """
    import jax
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return False  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def host_slice(items, process_id: int = None, num_processes: int = None):
    """This host's contiguous share of a work-item list."""
    import jax
    pid = process_id if process_id is not None else jax.process_index()
    n = num_processes if num_processes is not None else jax.process_count()
    bounds = np.linspace(0, len(items), n + 1).astype(int)
    return list(items)[bounds[pid]: bounds[pid + 1]]
