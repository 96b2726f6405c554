"""Tour of the labelled signal-op library and the .signal accessor.

The analogue of the reference's ``examples/stream/operations.py`` — every
op runs on synthetic data, so it works anywhere.

Run:  JAX_PLATFORMS=cpu python examples/signal_ops.py
"""
import os

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from xcorr_tpu.ndlabel import DataArray
from xcorr_tpu import signal as xs

fs = 50.0
n = 4000
lag = (np.arange(n) - n // 2) / fs
rng = np.random.default_rng(0)
cc = DataArray(
    rng.normal(size=(1, n)).astype(np.float32) * 0.1,
    dims=("pair", "lag"),
    coords={"pair": np.array(["IM.H03S1..EDH-IU.RAR.10.BHZ"], dtype=object),
            "lag": lag},
    name="cc",
    attrs={"long_name": "Cross-correlation Estimate",
           "standard_name": "cc", "units": "-", "unbiased": 0},
)
cc.coords["lag"].attrs.update({
    "sampling_rate": fs, "delta": 1 / fs, "npts": (n + 1) // 2,
    "index_min": 0, "index_max": n, "units": "s"})
cc.values[0, n // 2 + 500] = 2.0  # injected arrival at +10 s

# --- the postprocess-style chain --------------------------------------
out = (cc.signal.demean()
         .signal.taper(max_length=2.0)
         .signal.filter(frequency=3.0, btype="highpass", order=2))
print("chain history:", out.attrs["history"][:120], "...")

# --- SNR with masked windows ------------------------------------------
sig_mask = (out.coords["lag"] >= 8.0) & (out.coords["lag"] <= 12.0)
noi_mask = out.coords["lag"] <= -10.0
snr = out.signal.snr(sig_mask, noi_mask, extend=True,
                     institution="ex", author="ex", source="ex")
print("SNR:", float(snr["snr"].values[0]), "peak lag:",
      float(snr["lag_s_max"].values[0]))

# --- spectrogram + peak finding ----------------------------------------
psd = out.signal.spectrogram(duration=1.0, padding_factor=2)
print("psd dims:", psd.dims, psd.shape)
peaks = psd.signal.peak_local_max(min_distance=10, threshold_rel=0.5,
                                  as_dataframe=True)
print("top spectrogram peaks:\n", peaks.head(3))

# --- spectral round trip -----------------------------------------------
F = out.signal.rfft()
back = F.signal.irfft()
print("rfft->irfft round trip err:",
      float(np.abs(back.values[..., :out.sizes['lag']]
                   - out.values).max()))

# --- wavelets and envelopes ----------------------------------------------
sg = out.signal.scaleogram(fmin=1.0, fmax=20.0, nfreqs=30)
print("scaleogram dims:", sg.dims)
env = out.signal.envelope()
print("envelope peak:", float(env.values.max()))
