r"""
:mod:`scripts.beamform` -- Plane-wave beamforming CLI (``xcorr-beamform``)
==========================================================================

Per day: merge the array-pair CCF shards, postprocess, estimate the
least-squares plane wave with local aeqd xy coordinates
(spec: ``xcorr/scripts/beamform.py:33-104``).
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

from .. import io as xio
from .. import ndlabel
from ..core.postprocess import postprocess
from ..io.filesystem import ncfile
from ..ndlabel import DataArray
from ..signal.beamform import plane_wave_estimate
from ..util.receiver import get_pair_xy_coordinates, split_pair
from . import utils

__all__ = ["beamform_day", "main"]


def beamform_day(pairs, day, root, inventory, clim=(1460.0, 1500.0),
                 envelope: bool = False, attrs: dict = None,
                 filter_kwargs: dict = None):
    """Plane-wave estimate from one day's array-pair CCFs.

    The receiver array is formed by whichever side of the pairs *varies*
    (the other side is the common reference, e.g. the distant source
    station); co-array lags come from the pair CCFs.
    """
    datasets = []
    for pair in pairs:
        nc = ncfile(pair, day, root)
        if not os.path.exists(nc):
            continue
        ds = xio.read(nc, fast=True)
        if ds is None:
            continue
        try:
            ds = postprocess(ds, clim=clim, filter_kwargs=filter_kwargs)
        except ValueError:
            continue
        datasets.append(ds)
    if len(datasets) < 3:
        return None
    merged = ndlabel.concat(datasets, "pair")

    # local aeqd xy of the array receivers (meters; the varying side)
    pair_strs = [str(p) for p in merged.coords["pair"].values]
    firsts = [split_pair(p)[0] for p in pair_strs]
    seconds = [split_pair(p)[1] for p in pair_strs]
    arr = firsts if len(set(firsts)) > len(set(seconds)) else seconds
    receivers, x_km, y_km = get_pair_xy_coordinates(
        pair_strs, inventory, km=True)
    idx = [receivers.index(r) for r in arr]
    x = DataArray(np.asarray(x_km)[idx] * 1e3, dims=("pair",),
                  name="x")
    y = DataArray(np.asarray(y_km)[idx] * 1e3, dims=("pair",),
                  name="y")
    x._coords = {"pair": merged.coords["pair"]}
    y._coords = {"pair": merged.coords["pair"]}

    return plane_wave_estimate(merged["cc"], x, y, dim="lag",
                               envelope=envelope, **(attrs or {}))


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="xcorr-beamform",
        description="Plane-wave beamforming across a CCF receiver array.")
    parser.add_argument("start", metavar="start", type=str)
    parser.add_argument("end", metavar="end", type=str)
    parser.add_argument("--root", metavar="..", type=str, default="data/cc")
    parser.add_argument("--pair", metavar="..", type=str, action="append",
                        required=True, help="Array pair (repeat >= 3x)")
    parser.add_argument("--inventory", metavar="..", type=str,
                        required=True, help="Inventory JSON")
    parser.add_argument("--celerity", metavar="..", type=float, nargs=2,
                        default=(1460.0, 1500.0))
    parser.add_argument("--envelope", action="store_true", default=False)
    parser.add_argument("--filter-freq", metavar="..", type=float,
                        default=3.0,
                        help="Postprocess highpass corner (Hz)")
    parser.add_argument("--out", metavar="..", type=str, default=None)
    utils.add_common_arguments(parser)
    utils.add_attrs_group(parser)
    args = parser.parse_args(argv)

    log = utils.init_logging(args.debug)
    cfg = utils.init_compute(args, workload="analysis")
    attrs = utils.parse_attrs(args)

    from ..stream import Inventory
    inventory = Inventory.from_json(args.inventory)
    days = pd.date_range(args.start, args.end, freq="1D")

    with ThreadPoolExecutor(max_workers=cfg["nworkers"]) as ex:
        results = list(ex.map(
            lambda d: beamform_day(args.pair, d, args.root, inventory,
                                   clim=tuple(args.celerity),
                                   envelope=args.envelope, attrs=attrs,
                                   filter_kwargs={
                                       "frequency": args.filter_freq,
                                       "btype": "highpass", "order": 2}),
            days))
    keep = [(d, r) for d, r in zip(days, results) if r is not None]
    if not keep:
        log.error("no beamform results")
        return 1
    # concat along the existing time dim: each day's result already
    # carries its per-window timestamps (overwriting with one stamp per
    # day mismatched the dimension length whenever a day kept more than
    # one valid window)
    merged = ndlabel.concat([r for _, r in keep], "time")
    out = args.out or utils.ncfile_name(
        (args.prefix or "") + "beamform", days[0], days[-1], args.suffix)
    if os.path.exists(out) and not args.overwrite:
        log.error("%s exists (use --overwrite)", out)
        return 1
    xio.write(merged, out, verb=1, force_write=True)
    log.info("wrote %s", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
