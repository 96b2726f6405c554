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
from . import util  # noqa: F401
from . import ops  # noqa: F401
from . import io  # noqa: F401
from . import stream  # noqa: F401
from . import signal  # noqa: F401  (registers .signal accessor)
from . import core  # noqa: F401  (registers ds.xcorr accessor)
from . import parallel  # noqa: F401

from .core import init, process, postprocess, merge, plot
from .core.lazy import lazy_process, lazy_processes
from .io import read, write, mfread, validate, validate_list, ncfile
from .stream import Client, SyntheticClient, Inventory

__all__ = ["ndlabel", "util", "ops", "io", "stream", "signal", "core",
           "parallel", "init", "process", "postprocess", "merge", "plot",
           "read",
           "write", "mfread", "validate", "validate_list", "ncfile",
           "lazy_process", "lazy_processes", "Client", "SyntheticClient",
           "Inventory", "__version__"]
