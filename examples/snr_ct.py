"""SNR + coincidence-trigger walkthrough over a multi-day dataset.

The hermetic analogue of the reference's ``examples/lazy/lazy_snr.py``
(dask mfread + snr) plus the trigger step of ``scripts/snr.py``: produce
a few day-shards with the SyntheticClient, multi-file-read them, run the
postprocess chain, compute the signal-to-noise ratio over
distance-derived lag windows, coincidence-trigger the SNR series, and
plot SNR with the triggered periods shaded.

Run:  python examples/snr_ct.py
"""
import os
import tempfile

import matplotlib

matplotlib.use(os.environ.get("MPLBACKEND", "Agg"))
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import xcorr_tpu
from xcorr_tpu.stream import Channel, Inventory, SyntheticClient

FS = 5.0
PAIR = "IM.H03S1..EDH-IU.RAR.10.BHZ"
preprocess = {
    "EDH": [("detrend", {"type": "demean"}),
            ("taper", {"type": "cosine", "max_percentage": 0.05})],
    "BHZ": [("detrend", {"type": "demean"}),
            ("taper", {"type": "cosine", "max_percentage": 0.05})],
}
client = SyntheticClient(sampling_rate=FS,
                         delays={"IM.H03S1..EDH": 0.0,
                                 "IU.RAR.10.BHZ": 4.0},
                         source_period=600.0, source_amplitude=20.0)
inv = Inventory([
    Channel("IM", "H03S1", "", "EDH", latitude=-33.6, longitude=-78.8),
    Channel("IU", "RAR", "10", "BHZ", latitude=-21.2, longitude=-159.8),
])
init_args = dict(preprocess=preprocess,
                 attrs={"institution": "example", "author": "example",
                        "source": "synthetic"},
                 sampling_rate=FS, window_length=3600.0,
                 window_overlap=0.5, clip_lag=(-300.0, 300.0),
                 inventory=inv, unbiased_cc=False)

root = tempfile.mkdtemp(prefix="xcorr_example_")
times = pd.date_range("2015-01-01", periods=2, freq="1D")
xcorr_tpu.lazy_process([PAIR], times, init_args, client, inventory=inv,
                       root=root, engine="device", verb=0)

# --- multi-file read (reference: xcorr.mfread glob) --------------------
pattern = os.path.join(root, "*", "*", "*.nc")
ds = xcorr_tpu.mfread(pattern, fast=True)
assert ds is not None, "No data found!"

# --- extract valid cc and postprocess ----------------------------------
cc = (ds["cc"].where(ds["status"] == 1, drop=True)
      .signal.demean()
      .signal.taper(max_length=5.0)
      .signal.filter(frequency=0.5, btype="highpass", order=2)
      .signal.taper(max_length=1.5))

# --- signal / noise lag windows + SNR ----------------------------------
lag = np.asarray(cc.coords["lag"].values)
s = (lag >= -10.0) & (lag <= 10.0)       # the synthetic arrival band
n = (lag >= 60.0) & (lag <= 280.0)       # trailing noise window
sn = cc.signal.snr(s, n, dim="lag", extend=True)["snr"]
print("SNR per (pair, time):")
print(np.asarray(sn.values).round(2))

# --- coincidence trigger over the SNR series ---------------------------
ct = sn.signal.coincidence_trigger(thr_on=float(np.nanmedian(sn.values)),
                                   extend=0)
print(f"{int(ct.attrs['nperiods'])} triggered period(s)")

# --- figure: SNR lines + shaded triggers -------------------------------
ax = xcorr_tpu.core.plot.plot_snr_ct(sn, ct)
out = os.path.join(root, "snr_ct.png")
ax.figure.tight_layout()
ax.figure.savefig(out, dpi=90)
print(f"figure: {out}")
