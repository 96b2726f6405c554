"""Waveform client walkthrough: SDS archive, waterfall, miniSEED codec.

The analogue of the reference's ``examples/stream/client.py`` (which
reads a pre-existing waveform archive), made hermetic: a synthetic day
is written into a temporary SDS tree first, then read back through the
production :class:`~xcorr_tpu.stream.Client` waterfall.

Run:  JAX_PLATFORMS=cpu python examples/client.py
"""
import os
import tempfile

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import pandas as pd

from xcorr_tpu.stream import Client, SyntheticClient, to_SDS
from xcorr_tpu.native import mseed

FS = 5.0
RECEIVER = "IM.H10N1..EDH"
DAY = pd.Timestamp("2015-01-15")

root = tempfile.mkdtemp(prefix="sds_")

# --- populate the archive (stands in for an existing deployment) -------
day_st = SyntheticClient(sampling_rate=FS).get_waveforms(
    receiver=RECEIVER, time=DAY + pd.Timedelta("12h"),
    centered=True, duration=86400.0, buffer=0.0)
to_SDS(day_st, root)

# --- client over the SDS tree ------------------------------------------
# The waterfall tries each local archive root, then the FDSN web
# service, then the VDMS tier (neither configured here); downloaded
# remote days pass the max_gap duration gate before being archived.
client = Client(sds_root=root, max_gap=300.0)
print(client)

# Get waveforms for an entire day (default duration is 86400 s)
EDH = client.get_waveforms(
    receiver=RECEIVER,
    time=DAY,
    centered=False,
    verb=1,
)
print(EDH)

# Validate the duration (fraction of the expected samples present)
assert client.check_duration(EDH, sampling_rate=FS)

# --- miniSEED round trip through the native codec -----------------------
# The archive above stores HDF5 day files; deployments with existing
# miniSEED holdings go through the C++ Steim codec instead.
if mseed.available():
    path = os.path.join(root, "day.mseed")
    mseed.write_mseed(path, EDH[0])
    back = mseed.read_mseed(path)
    print(f"miniSEED round trip: {back[0].stats.npts} samples, "
          f"dtype {back[0].data.dtype}")
