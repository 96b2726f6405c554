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


def test_plot_ccf_celerity_axis():
    """With a pair distance, plot_ccf adds the celerity secondary axis
    (m/s tick labels) and sets lag limits from distance/celerity."""
    import matplotlib.pyplot as plt

    ds = make_ds()
    ds["distance"] = (("pair",), np.array([14.6]), {"units": "km"})
    gs = xplot.plot_ccf(ds, cmin=1460.0, cmax=1500.0)
    fig = gs.figure
    fig.canvas.draw()  # tick labels materialize at draw time
    ax1 = fig.axes[0]
    # the celerity axis is a secondary (child) axis of the CCF panel
    labels = [t.get_text() for child in ax1.child_axes
              for t in child.get_xticklabels()]
    assert any("m/s" in txt for txt in labels)
    # lag limits follow distance/celerity (14600 m / 1500..1460 m/s)
    lo, hi = ax1.get_xlim()
    assert abs(lo - 14600.0 / 1500.0) < 0.1
    assert abs(hi - 14600.0 / 1460.0) < 0.1
    plt.close("all")


def test_plot_ccfs_multi_pair_panels():
    """plot_ccfs renders one stacked panel per pair."""
    import matplotlib.pyplot as plt

    ds = make_ds()
    from xcorr_tpu.ndlabel import concat
    ds2 = make_ds()
    ds2.coords["pair"] = np.array(["E.F..G-H.I..J"], dtype=object)
    both = concat([ds, ds2], "pair")
    gs = xplot.plot_ccfs(both)
    assert len(gs.figure.axes) == 2
    plt.close("all")
