r"""
:mod:`core.plot` -- CCF plotting helpers
========================================

Matplotlib convenience plots (spec: ``xcorr/core/plot.py:31-520``):
``plot_ccf`` (CCF + spectrogram panel), ``plot_ccfs`` (stacked per-time
traces), ``plot_ccfs_colored`` and ``plot_snr_ct``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_ccf", "plot_ccfs", "plot_ccfs_colored", "plot_snr_ct",
           "set_year_labels"]


def plot_ccf(ds, pair=None, time=None, spectrogram_kwargs: dict = None,
             ax=None, **kwargs):
    """One (pair, time) CCF trace with its spectrogram panel."""
    import matplotlib.pyplot as plt

    sel = {}
    if pair is not None:
        sel["pair"] = pair
    if time is not None:
        sel["time"] = time
    cc = ds["cc"].sel(sel) if sel else ds["cc"].isel(pair=0, time=0)
    while cc.ndim > 1:
        cc = cc.isel({cc.dims[0]: 0})

    fig, (ax1, ax2) = plt.subplots(2, 1, sharex=True,
                                   figsize=kwargs.pop("figsize", (9, 6)))
    lag = cc.coords["lag"].values
    ax1.plot(lag, cc.values, lw=0.5, color="k")
    ax1.set_ylabel("CC")
    psd = cc.signal.spectrogram(**(spectrogram_kwargs
                                   or {"duration": 2.5,
                                       "padding_factor": 4}))
    vals = np.asarray(psd.values)
    ax2.pcolormesh(lag, psd.coords["freq"].values,
                   10 * np.log10(vals + 1e-30), shading="auto",
                   cmap="viridis")
    ax2.set_xlabel("Lag [s]")
    ax2.set_ylabel("Frequency [Hz]")
    return fig


def plot_ccfs(ds, pair=None, alpha: float = 0.6, ax=None, **kwargs):
    """All time windows of one pair, overlain."""
    import matplotlib.pyplot as plt

    cc = ds["cc"].sel(pair=pair) if pair is not None \
        else ds["cc"].isel(pair=0)
    if ax is None:
        _, ax = plt.subplots(figsize=kwargs.pop("figsize", (9, 4)))
    lag = cc.coords["lag"].values
    for i in range(cc.sizes["time"]):
        ax.plot(lag, cc.values[i], lw=0.4, alpha=alpha)
    ax.set_xlabel("Lag [s]")
    ax.set_ylabel("CC")
    return ax


def plot_ccfs_colored(ds, pair=None, ax=None, cmap: str = "viridis",
                      **kwargs):
    """Per-time colored CCF waterfall."""
    import matplotlib.pyplot as plt

    cc = ds["cc"].sel(pair=pair) if pair is not None \
        else ds["cc"].isel(pair=0)
    if ax is None:
        _, ax = plt.subplots(figsize=kwargs.pop("figsize", (9, 5)))
    lag = cc.coords["lag"].values
    t = cc.coords["time"].values
    pc = ax.pcolormesh(lag, t, cc.values, shading="auto", cmap=cmap)
    plt.colorbar(pc, ax=ax, label="CC")
    ax.set_xlabel("Lag [s]")
    return ax


def plot_snr_ct(snr, ct=None, ax=None, **kwargs):
    """SNR time series with triggered periods shaded."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=kwargs.pop("figsize", (9, 4)))
    t = snr.coords["time"].values
    vals = np.atleast_2d(snr.values)
    for row in vals:
        ax.plot(t, row, lw=0.7)
    if ct is not None:
        trig = np.asarray(ct.values)
        on = ~np.isnan(trig)
        ax.fill_between(t, 0, np.nanmax(vals) if vals.size else 1.0,
                        where=on, alpha=0.15, color="red")
    ax.set_ylabel("SNR")
    return ax


def set_year_labels(ax, **kwargs):
    """Format a datetime x-axis with year ticks."""
    import matplotlib.dates as mdates

    ax.xaxis.set_major_locator(mdates.YearLocator())
    ax.xaxis.set_major_formatter(mdates.DateFormatter("%Y"))
    return ax
