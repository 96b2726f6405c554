"""Postprocess walkthrough: read shards -> signal chain -> windows -> plots.

The hermetic analogue of the reference's ``examples/core/postprocess.py``
(which reads a real archive): shards are first produced with the
SyntheticClient, then merged and postprocessed exactly like the
reference narrative — highpass + taper the CCFs, unbias a copy, build
valid/signal/noise lag windows from the pair distance, and draw the
biased-vs-unbiased comparison figure.

Run:  python examples/postprocess.py
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

# --- produce two day-shards with the synthetic archive -----------------
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
times = pd.date_range("2015-01-15", periods=2, freq="1D")
xcorr_tpu.lazy_process([PAIR], times, init_args, client, inventory=inv,
                       root=root, engine="device", verb=0)

# --- read + merge the shards (reference: xcorr.merge on ncfile glob) ---
files = [xcorr_tpu.ncfile(PAIR, t, root) for t in times]
ds = xcorr_tpu.merge(files, quick_and_dirty=True)
assert ds is not None, "No data found!"

# --- apply signal processing to the CCFs -------------------------------
ds["cc_f"] = (ds["cc"]
              .signal.filter(frequency=0.5, btype="highpass", order=2)
              .signal.taper(max_length=5.0))
ds["cc_w"] = ds["cc_f"].signal.unbias()

# --- define lag windows from the pair distance -------------------------
lag = ds.coords["lag"]
distance = float(np.asarray(ds["distance"].values).ravel()[0]) * 1e3  # m
v = np.asarray(lag.values) <= 200.0
print(f"pair distance {distance/1e3:.1f} km; "
      f"{int(v.sum())} valid lag samples")

# --- biased vs unbiased comparison figure ------------------------------
fig, ax = plt.subplots(figsize=(10, 4))
lagv = np.asarray(lag.values)
line1, = ax.plot(lagv, ds["cc_w"].values[0, 0], lw=0.8)
line2, = ax.plot(lagv, ds["cc_f"].values[0, 0], lw=0.8, alpha=0.7)
ax.legend((line1, line2), ("unbiased", "biased"))
ax.set_xlabel("Lag [s]")
ax.set_ylabel("Cross-correlation Estimate [-]")
fig.tight_layout()
out = os.path.join(root, "postprocess.png")
fig.savefig(out, dpi=90)
peak = lagv[int(np.argmax(ds["cc"].values[0, 0]))]
print(f"CCF peak at lag {peak:+.1f} s (injected -4.0 s); figure: {out}")
