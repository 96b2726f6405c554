"""Eager end-to-end example: init -> process -> write -> read -> postprocess.

The hermetic analogue of the reference's ``examples/core/process.py``
(which needs a real waveform archive): a SyntheticClient generates
deterministic waveforms with a known 4-second inter-receiver delay, so the
CCF peak lands at lag -4 s.

Run:  python examples/process.py
"""
import os

import numpy as np
import pandas as pd

# pin the CPU backend when no accelerator is wanted (see CLAUDE.md)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import xcorr_tpu
from xcorr_tpu.stream import Channel, Inventory, SyntheticClient

FS = 5.0

preprocess = {
    "EDH": [
        ("detrend", {"type": "demean"}),
        ("filter", {"type": "bandpass", "freqmin": 0.3, "freqmax": 2.0}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ],
    "BHZ": [
        ("detrend", {"type": "demean"}),
        ("filter", {"type": "bandpass", "freqmin": 0.3, "freqmax": 2.0}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ],
}

inventory = Inventory([
    Channel("IM", "H03S1", "", "EDH", latitude=-33.6, longitude=-78.8),
    Channel("IU", "RAR", "10", "BHZ", latitude=-21.2, longitude=-159.8),
])

client = SyntheticClient(sampling_rate=FS,
                         delays={"IU.RAR.10.BHZ": 4.0},
                         source_period=600.0, source_amplitude=20.0)

ds = xcorr_tpu.init(
    pair="IM.H03S1..EDH-IU.RAR.10.BHZ",
    starttime=pd.Timestamp("2014-01-01"),
    endtime=pd.Timestamp("2014-01-01T06:00"),
    preprocess=preprocess,
    attrs={"institution": "Example, dept", "author": "you - you@example",
           "source": "synthetic"},
    sampling_rate=FS, window_length=3600.0, window_overlap=0.5,
    clip_lag=(-100.0, 100.0), inventory=inventory,
)
print(ds)

xcorr_tpu.process(ds, client=client, verb=1)

peak = ds.coords["lag"].values[int(np.argmax(ds["cc"].values[0, 0]))]
print(f"\nCCF peak at lag {peak:+.2f} s (injected delay: -4 s)")

nc = xcorr_tpu.ncfile("IM.H03S1..EDH-IU.RAR.10.BHZ",
                      pd.Timestamp("2014-01-01"), "data/cc_eager")
xcorr_tpu.write(ds, nc, verb=1)

back = xcorr_tpu.read(nc, verb=1)
post = xcorr_tpu.postprocess(
    back, clim=(90_000.0, 2_000_000.0),
    filter_kwargs={"frequency": 0.5, "btype": "highpass", "order": 2})
print("\npostprocessed:", post["cc"].shape, "history:",
      post["cc"].attrs["history"][-120:])
