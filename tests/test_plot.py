"""Smoke tests for the plotting helpers (Agg backend)."""
import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd

from xcorr_tpu.ndlabel import DataArray, Dataset
from xcorr_tpu.core import plot as xplot


def make_ds():
    fs, nlag, nt = 20.0, 400, 6
    ds = Dataset()
    ds.coords["pair"] = np.array(["A.B..C-D.E..F"], dtype=object)
    ds.coords["time"] = pd.date_range("2014-01-01", periods=nt,
                                      freq="3h").values
    lag = np.arange(nlag) / fs
    ds.coords["lag"] = lag
    ds.coords["lag"].attrs.update({"sampling_rate": fs, "delta": 1 / fs,
                                   "units": "s"})
    ds["cc"] = (("pair", "time", "lag"),
                np.random.default_rng(0).normal(
                    size=(1, nt, nlag)).astype(np.float32))
    return ds


def test_plot_ccf_and_ccfs():
    ds = make_ds()
    fig = xplot.plot_ccf(ds, spectrogram_kwargs={"duration": 2.0,
                                                 "padding_factor": 2})
    assert fig is not None
    ax = xplot.plot_ccfs(ds)
    assert ax is not None
    ax = xplot.plot_ccfs_colored(ds)
    assert ax is not None


def test_plot_snr_ct_and_trigs():
    nt = 50
    t = pd.date_range("2014-01-01", periods=nt, freq="3h").values
    snr = DataArray(np.random.default_rng(1).uniform(1, 5, (2, nt)),
                    dims=("pair", "time"),
                    coords={"pair": np.array(["P", "Q"], dtype=object),
                            "time": t}, name="snr")
    ct = DataArray(np.where(np.arange(nt) % 10 < 3, 0.0, np.nan),
                   dims=("time",), coords={"time": t}, name="ct")
    ax = xplot.plot_snr_ct(snr, ct)
    assert ax is not None
    from xcorr_tpu.signal.trigger import plot_trigs
    assert plot_trigs(snr, ct) is not None
