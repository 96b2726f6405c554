"""Availability scans, preprocess preflight and multi-file reads.

The analogue of the reference's ``examples/lazy/lazy_availability.py``,
``lazy_preprocessing.py`` and ``mfread.py``.

Run:  JAX_PLATFORMS=cpu python examples/availability_and_mfread.py
"""
import os

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import pandas as pd

import xcorr_tpu
from xcorr_tpu.stream import Channel, Inventory, SyntheticClient

FS = 5.0
PAIR = "IM.H03S1..EDH-IU.RAR.10.BHZ"

pre = {c: [("detrend", {"type": "demean"}),
           ("filter", {"type": "bandpass", "freqmin": 0.3,
                       "freqmax": 2.0})] for c in ("EDH", "BHZ")}
inv = Inventory([
    Channel("IM", "H03S1", "", "EDH", latitude=-33.6, longitude=-78.8),
    Channel("IU", "RAR", "10", "BHZ", latitude=-21.2, longitude=-159.8),
])
# one receiver-day is missing from the archive
client = SyntheticClient(sampling_rate=FS,
                         delays={"IU.RAR.10.BHZ": 4.0},
                         missing={("IU.RAR.10.BHZ", "2014002")})

days = pd.date_range("2014-01-01", periods=3, freq="1D")

# --- availability scan (reference: verify_waveform_availability) -------
av = client.verify_waveform_availability([PAIR], days, parallel=True,
                                         verb=1)
print(av.values, "->", list(av.coords["receiver"].values))

# --- preprocess preflight on one day -----------------------------------
pf = client.verify_waveform_processing(
    ["IM.H03S1..EDH", "IU.RAR.10.BHZ"], days[0] + pd.Timedelta("12h"),
    operations=pre, sampling_rate=FS)
print("preflight:", pf.values.ravel().tolist())

# --- produce shards; the missing day is flagged and skipped -------------
init_args = dict(preprocess=pre,
                 attrs={"institution": "ex", "author": "ex",
                        "source": "synthetic"},
                 sampling_rate=FS, window_length=3600.0,
                 window_overlap=0.5, clip_lag=(-100.0, 100.0),
                 inventory=inv)
results = xcorr_tpu.lazy_process([PAIR], days, init_args, client,
                                 inventory=inv, root="data/cc_av",
                                 nworkers=2, verb=1)
print("per-day completion:", results)

# --- mfread: validated multi-file open + combine -------------------------
files = [xcorr_tpu.ncfile(PAIR, d, "data/cc_av") for d in days
         if os.path.exists(xcorr_tpu.ncfile(PAIR, d, "data/cc_av"))]
merged = xcorr_tpu.mfread(files, fast=True)
print(merged)
