"""Stream-operations DSL walkthrough: hashed config, host apply, device
compile.

The hermetic analogue of the reference's ``examples/stream/operations.py``
(which reads a real SDS archive + StationXML): define per-channel
operation chains as config-as-data, hash them (the provenance contract
stored in every dataset), apply them on the host through the Trace layer,
and compile the SAME chain into one fused device function — the
TPU-native path the production engine uses.

Run:  python examples/stream_operations.py
"""
import os

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

from xcorr_tpu import stream
from xcorr_tpu.stream import Channel, Inventory, SyntheticClient
from xcorr_tpu.stream.compile import compile_operations

# --- per-channel operation chains (config-as-data) ---------------------
preprocess = {
    "BHZ": [
        ("merge", {"method": 1, "fill_value": "interpolate",
                   "interpolation_samples": 0}),
        ("filter", {"type": "highpass", "freq": 0.05}),
        ("detrend", {"type": "demean"}),
        ("filter", {"type": "lowpass", "freq": 2.0}),
        ("trim", {}),
        ("detrend", {"type": "demean"}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ],
    "EDH": [
        ("merge", {"method": 1, "fill_value": "interpolate",
                   "interpolation_samples": 0}),
        ("filter", {"type": "bandpass", "freqmin": 0.05, "freqmax": 2.0}),
        ("detrend", {"type": "demean"}),
        ("trim", {}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ],
}

# --- the hash IS the provenance contract -------------------------------
preprocess = stream.process.hash_operations(preprocess)
print(f"operations sha256: {preprocess['sha256_hash']}")
stream.process.check_operations_hash(preprocess, raise_error=True)
as_json = stream.process.operations_to_json(preprocess)
assert stream.process.operations_to_dict(as_json) is not None

# --- host apply through the Trace layer --------------------------------
fs = 5.0
client = SyntheticClient(sampling_rate=fs,
                         delays={"IU.RAR.10.BHZ": 0.0},
                         source_period=600.0, source_amplitude=20.0)
inv = Inventory([Channel("IU", "RAR", "10", "BHZ",
                         latitude=-21.2, longitude=-159.8)])
st = client.get_processed_waveforms(
    receiver="IU.RAR.10.BHZ", time=np.datetime64("2015-01-01T12:00"),
    operations=preprocess, duration=3600.0, inventory=inv,
    sampling_rate=fs, verb=0)
tr = st[0]
print(f"host-processed: {tr.stats.npts} samples @ "
      f"{tr.stats.sampling_rate:g} Hz")

# --- device compile of the same chain ----------------------------------
npts_raw = int(3600 * 1.1 * fs)  # buffered window
fn, npts_out, fs_out = compile_operations(
    preprocess["BHZ"], npts_raw, fs, trim_to=int(3600 * fs),
    trim_offset=int(3600 * 0.05 * fs))
block = np.random.default_rng(0).normal(
    size=(4, npts_raw)).astype(np.float32)
out = np.asarray(fn(block))
print(f"device chain: {block.shape} -> {out.shape} @ {fs_out:g} Hz "
      f"(one fused executable for the whole per-channel chain)")
