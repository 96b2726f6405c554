"""Batch production example: lazy_process over pairs x days with resume.

The analogue of the reference's ``examples/lazy/lazy_process.py`` — the
Dask cluster is replaced by the host thread pool + device batching; resume
comes free from the per-(pair, day) status flags.

Run:  python examples/lazy_process.py
"""
import os

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import pandas as pd

import xcorr_tpu
from xcorr_tpu.stream import Channel, Inventory, SyntheticClient
from xcorr_tpu.util.profiler import StageTimer

FS = 5.0
ROOT = "data/cc"

preprocess = {
    "EDH": [("detrend", {"type": "demean"}),
            ("filter", {"type": "bandpass", "freqmin": 0.3,
                        "freqmax": 2.0})],
    "BHZ": [("detrend", {"type": "demean"}),
            ("filter", {"type": "bandpass", "freqmin": 0.3,
                        "freqmax": 2.0})],
}

inventory = Inventory([
    Channel("IM", "H03S1", "", "EDH", latitude=-33.6, longitude=-78.8),
    Channel("IM", "H03S2", "", "EDH", latitude=-33.62, longitude=-78.82),
    Channel("IU", "RAR", "10", "BHZ", latitude=-21.2, longitude=-159.8),
])

client = SyntheticClient(
    sampling_rate=FS,
    delays={"IM.H03S2..EDH": 0.5, "IU.RAR.10.BHZ": 4.0},
    source_period=600.0, source_amplitude=20.0)

pairs = ["IM.H03S1..EDH-IU.RAR.10.BHZ", "IM.H03S2..EDH-IU.RAR.10.BHZ"]
times = pd.date_range("2014-01-01", "2014-01-04", freq="1D",
                      inclusive="left")
init_args = dict(preprocess=preprocess,
                 attrs={"institution": "Example", "author": "you",
                        "source": "synthetic"},
                 sampling_rate=FS, window_length=3600.0,
                 window_overlap=0.5, clip_lag=(-100.0, 100.0),
                 inventory=inventory)

timer = StageTimer()
with timer("lazy_process", items=len(pairs) * len(times)):
    results = xcorr_tpu.lazy_process(pairs, times, init_args, client,
                                     inventory=inventory, root=ROOT,
                                     nworkers=4)
print(timer.report())

# second run: every shard is complete, so each task early-exits
with timer("resume"):
    again = xcorr_tpu.lazy_process(pairs, times, init_args, client,
                                   inventory=inventory, root=ROOT,
                                   nworkers=4)
print("resume results:", again)

merged = xcorr_tpu.merge(
    [xcorr_tpu.ncfile(p, t, ROOT) for p in pairs for t in times])
print(merged)
