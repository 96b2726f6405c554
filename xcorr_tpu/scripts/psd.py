r"""
:mod:`scripts.psd` -- PSD spectrograms of triggered periods (``xcorr-psd``)
===========================================================================

For each triggered period x pair: read the CCF shards, postprocess with a
celerity window, compute the per-sample-hop PSD spectrogram, combine with
the SNR values and write one netCDF per period
(spec: ``xcorr/scripts/psd.py:42-100``).
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import pandas as pd

from .. import io as xio
from .. import ndlabel
from ..core.postprocess import postprocess
from ..io.filesystem import ncfile
from ..signal.spectrogram import spectrogram
from . import utils

__all__ = ["psd_of_period", "main"]


def psd_of_period(pairs, start, end, root, clim=(1460.0, 1500.0),
                  duration: float = 2.5, padding_factor: int = 4,
                  filter_kwargs: dict = None, **kwargs):
    """PSD spectrogram dataset for one triggered period."""
    days = pd.date_range(pd.Timestamp(start).normalize(),
                         pd.Timestamp(end).normalize(), freq="1D")
    out = []
    for pair in pairs:
        files = [ncfile(pair, d, root) for d in days]
        files = [f for f in files if os.path.exists(f)]
        if not files:
            continue
        ds = xio.mfread(files, fast=True)
        try:
            ds = postprocess(ds, clim=clim, time_lim=(start, end),
                             filter_kwargs=filter_kwargs)
        except ValueError:
            continue
        psd = spectrogram(ds["cc"], duration=duration,
                          padding_factor=padding_factor)
        psd_ds = ndlabel.Dataset(attrs=dict(ds.attrs))
        psd_ds["psd"] = psd
        psd_ds["distance"] = ds["distance"]
        out.append(psd_ds)
    if not out:
        return None
    return ndlabel.concat(out, "pair") if len(out) > 1 else out[0]


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="xcorr-psd",
        description="PSD spectrograms of triggered CCF periods.")
    parser.add_argument("ct", metavar="ct", type=str,
                        help="Coincidence-trigger netCDF (from xcorr-ct)")
    parser.add_argument("--root", metavar="..", type=str, default="data/cc")
    parser.add_argument("--pair", metavar="..", type=str, action="append",
                        default=None)
    parser.add_argument("--celerity", metavar="..", type=float, nargs=2,
                        default=(1460.0, 1500.0))
    parser.add_argument("--duration", metavar="..", type=float, default=2.5)
    parser.add_argument("--padding-factor", metavar="..", type=int,
                        default=4)
    parser.add_argument("--filter-freq", metavar="..", type=float,
                        default=3.0,
                        help="Postprocess highpass corner (Hz)")
    parser.add_argument("--outdir", metavar="..", type=str, default=".")
    utils.add_common_arguments(parser)
    args = parser.parse_args(argv)

    log = utils.init_logging(args.debug)
    cfg = utils.init_compute(args, workload="analysis")

    ct_ds = xio.read(args.ct, fast=True) or xio.from_netcdf(args.ct)
    from ..signal.trigger import trigger_periods
    periods = trigger_periods(ct_ds["ct"])
    log.info("%d triggered periods", len(periods))

    pairs = args.pair or [str(p) for p in
                          ct_ds.coords["pair"].values.tolist()]

    def run(idx_row):
        idx, row = idx_row
        ds = psd_of_period(pairs, row["start"], row["end"], args.root,
                           clim=tuple(args.celerity),
                           duration=args.duration,
                           padding_factor=args.padding_factor,
                           filter_kwargs={
                               "frequency": args.filter_freq,
                               "btype": "highpass", "order": 2})
        if ds is None:
            return None
        out = os.path.join(
            args.outdir,
            utils.ncfile_name("psd", row["start"], row["end"],
                              args.suffix))
        xio.write(ds, out, verb=0, force_write=True)
        return out

    with ThreadPoolExecutor(max_workers=cfg["nworkers"]) as ex:
        outs = list(ex.map(run, periods.iterrows()))
    for o in outs:
        if o:
            log.info("wrote %s", o)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
