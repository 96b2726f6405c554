r"""
:mod:`xcorr_tpu.parallel` -- Device-mesh scaling
================================================

Multi-chip batch engine: ``jax.sharding.Mesh`` + ``shard_map`` over a
dense ``(pair x window)`` batch axis, replacing the reference's Dask task
fan-out (SURVEY.md §2.8 P1/P2).
"""

from .mesh import make_mesh, batch_sharding
from .batch import sharded_correlate
from .distributed import initialize, host_slice
from .pipeline import FusedPipeline, MultiSpanPipeline
from .engine import device_process, device_process_bulk

__all__ = ["make_mesh", "batch_sharding", "sharded_correlate",
           "initialize", "host_slice", "FusedPipeline",
           "MultiSpanPipeline", "device_process", "device_process_bulk"]
