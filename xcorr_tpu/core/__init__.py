r"""
:mod:`xcorr_tpu.core` -- Core dataset engine
============================================

CCF dataset construction, batched correlation, postprocessing, merging and
the ``ds.xcorr`` accessor (reference layer: ``xcorr/core/``).
"""

from .init import init
from .process import process
from .postprocess import postprocess
from .merge import merge
from . import accessors  # noqa: F401  (registers ds.xcorr)
from . import plot

__all__ = ["init", "process", "postprocess", "merge", "plot"]
