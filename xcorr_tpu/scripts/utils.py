r"""
:mod:`scripts.utils` -- Shared CLI plumbing
===========================================

Logging init, common argparse groups, output naming and attrs handling
(spec: ``xcorr/scripts/utils.py:29-203``). The reference's Dask cluster
bootstrap (``init_dask``) becomes a host thread-pool configuration — device
parallelism is handled by the JAX mesh, not a task scheduler.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import pandas as pd

__all__ = ["init_logging", "add_common_arguments", "add_attrs_group",
           "parse_attrs", "ncfile_name", "init_compute"]


def init_logging(debug: bool = False):
    """Configure stdout logging (reference ``scripts/utils.py:29-47``)."""
    # keep day-scale numpy buffers on the reusable heap (measured 300x
    # faster repeated large allocations on microVM hosts; util.sysmem)
    from ..util.sysmem import (enable_persistent_compile_cache,
                               malloc_heap_reuse)
    malloc_heap_reuse()
    enable_persistent_compile_cache()
    logging.basicConfig(
        stream=sys.stdout,
        format="%(asctime)s %(levelname)s %(message)s",
        level=logging.DEBUG if debug else logging.INFO,
    )
    return logging.getLogger()


def init_compute(args, workload: str = "correlate"):
    """Configure host-side worker count and the JAX platform.

    Replaces the reference's ``init_dask`` LocalCluster/scheduler bootstrap
    (``scripts/utils.py:50-79``): device work runs on the JAX backend;
    ``--nworkers`` only sizes the host IO thread pool. ``--platform`` (or
    the JAX_PLATFORMS env var) pins the backend — needed because some TPU
    plugins register regardless of the env var.

    ``workload="analysis"`` (the derived-analysis CLIs: snr/ct/psd/
    beamform/plmax/swresp/timelapse) auto-pins the cpu backend when a
    TUNNELED device runtime is registered (assumed to be the device
    path) and no platform was given: those workloads are per-op
    dispatch/transfer bound through a tunnel (same-session
    measurements: snr_ct 11.1 cpu vs 0.76 tunneled-tpu pair-days/s,
    timelapse 78 vs ~8 cells/s, beamform 1.07 vs 0.31), while the
    correlation engine's day-scale batches still win on the device
    (pipeline 0.25-0.37 tpu vs 0.05 cpu). Hosts without a tunneled
    plugin (e.g. a real PCIe-attached TPU host) are unaffected; pass
    ``--platform`` to override either way.
    """
    n = getattr(args, "nworkers", None) or os.cpu_count() or 4
    if getattr(args, "debug", False):
        logging.getLogger().setLevel(logging.DEBUG)
    plat = getattr(args, "platform", None) or \
        os.environ.get("JAX_PLATFORMS")
    if not plat and workload == "analysis":
        from ..util import xfer
        if xfer.tunneled_runtime_registered():
            plat = "cpu"
            logging.info(
                "analysis workload + tunneled device runtime: pinning "
                "the cpu backend (per-op dispatch/transfer latency "
                "dominates through a tunnel; override with --platform)")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat.split(",")[0])
        except RuntimeError:
            pass  # backend already initialized
    # multi-host formation join (--coordinator/--num-processes/
    # --process-id or the JAX_* env vars): the analog of the
    # reference's scheduler-file cluster attach. Must happen before
    # first backend use; lazy_process then auto-detects the formation
    # and takes this host's slice of the campaign.
    distributed = False
    coord = getattr(args, "coordinator", None) or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = getattr(args, "num_processes", None)
    pid = getattr(args, "process_id", None)
    if coord:
        from ..parallel.distributed import initialize
        distributed = initialize(coordinator_address=coord,
                                 num_processes=nproc, process_id=pid)
        if distributed:
            import jax
            logging.info("joined multi-host formation: process %d/%d",
                         jax.process_index(), jax.process_count())
    elif nproc is not None or pid is not None:
        # fail loudly instead of letting jax.distributed.initialize
        # probe metadata services with no coordinator to find
        raise SystemExit(
            "--num-processes/--process-id require --coordinator "
            "(or JAX_COORDINATOR_ADDRESS)")
    return {"nworkers": n, "distributed": distributed}


def add_common_arguments(parser: argparse.ArgumentParser,
                         dask: bool = True):
    """The shared CLI options (reference ``scripts/utils.py:115-159``)."""
    parser.add_argument(
        "-n", "--nworkers", metavar="..", type=int, default=None,
        help="Set the number of host IO workers (defaults to cpu count)")
    parser.add_argument(
        "--scheduler", metavar="..", type=str, default=None,
        help="Accepted for reference-CLI compatibility (ignored: device "
             "parallelism uses the JAX mesh; to join a multi-host "
             "formation use --coordinator)")
    # multi-host formation join: the TPU-native analog of the
    # reference's `--scheduler` Dask cluster attach
    # (xcorr/scripts/utils.py:50-79) — each host process joins the same
    # jax.distributed formation and takes its host_slice of the
    # campaign (core.lazy auto-detects the multi-process state)
    parser.add_argument(
        "--coordinator", metavar="host:port", type=str, default=None,
        help="Join an existing jax.distributed formation at this "
             "coordinator address (defaults to JAX_COORDINATOR_ADDRESS)")
    parser.add_argument(
        "--num-processes", metavar="N", type=int, default=None,
        help="Total host processes in the formation "
             "(with --coordinator; defaults to JAX_NUM_PROCESSES)")
    parser.add_argument(
        "--process-id", metavar="I", type=int, default=None,
        help="This host's process index in the formation "
             "(with --coordinator; defaults to JAX_PROCESS_ID)")
    parser.add_argument(
        "--platform", metavar="..", type=str, default=None,
        help="Pin the JAX backend (cpu/tpu); defaults to JAX_PLATFORMS")
    parser.add_argument(
        "--prefix", metavar="..", type=str, default=None,
        help="Set the output file prefix")
    parser.add_argument(
        "--suffix", metavar="..", type=str, default=None,
        help="Set the output file suffix")
    parser.add_argument(
        "--overwrite", action="store_true", default=False,
        help="Overwrite output when it exists")
    parser.add_argument(
        "--plot", action="store_true", default=False,
        help="Render result plots")
    parser.add_argument(
        "--quick-and-dirty", action="store_true", default=False,
        dest="quick_and_dirty",
        help="Skip hash verification on reads")
    parser.add_argument(
        "--debug", action="store_true", default=False,
        help="Verbose debug logging")
    parser.add_argument(
        "--version", action="version",
        version=_version_string())
    return parser


def _version_string():
    from .. import __version__
    return f"xcorr-tpu {__version__}"


def add_attrs_group(parser: argparse.ArgumentParser):
    """Global-attribute options (reference ``scripts/utils.py:162-203``)."""
    group = parser.add_argument_group("dataset attributes")
    group.add_argument("--title", metavar="..", type=str, default="")
    group.add_argument("--institution", metavar="..", type=str,
                       default="n/a")
    group.add_argument("--author", metavar="..", type=str, default="n/a")
    group.add_argument("--source", metavar="..", type=str, default="n/a")
    group.add_argument("--attrs-json", metavar="..", type=str, default=None,
                       help="JSON file with global attributes")
    return parser


def parse_attrs(args):
    """Build the global attrs dict from CLI options (+ optional JSON)."""
    attrs = {
        "title": args.title,
        "institution": args.institution,
        "author": args.author,
        "source": args.source,
    }
    if getattr(args, "attrs_json", None):
        with open(args.attrs_json) as f:
            attrs.update(json.load(f))
    return attrs


def ncfile_name(prefix: str, start, end, suffix: str = None):
    """Canonical derived-product filename
    (reference ``scripts/utils.py:82-112``)."""
    start = pd.to_datetime(start)
    end = pd.to_datetime(end)
    name = "{p}_{s}_{e}{x}.nc".format(
        p=prefix,
        s=start.strftime("%Y%j"),
        e=end.strftime("%Y%j"),
        x=f"_{suffix}" if suffix else "",
    )
    return name
