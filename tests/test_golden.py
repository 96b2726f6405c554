"""Golden-value fixtures for the ops whose third-party oracles
(pywt, skimage) are absent in this environment (VERDICT r4 ask #7).

Fixtures live in ``tests/fixtures/golden_*.npz`` and were generated
once by ``tests/fixtures/make_golden.py`` with INDEPENDENT float64
oracles: a direct time-domain quadrature of the CWT correlation
integral (pywt cmorB-C definition, ref xcorr/signal/cwt.py:91-139)
and a brute-force Chebyshev-neighborhood maximum search following
skimage's documented semantics (ref
xcorr/signal/peak_local_max.py:95-188)."""
import os

import numpy as np
import pytest

from xcorr_tpu.ndlabel import DataArray
from xcorr_tpu.signal.cwt import cwt
from xcorr_tpu.signal.peak_local_max import peak_local_max

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def test_cwt_matches_quadrature_golden():
    g = np.load(os.path.join(FIX, "golden_cwt.npz"))
    x, fs, freqs = g["x"], float(g["fs"]), g["freqs"]
    W = g["W_real"] + 1j * g["W_imag"]
    t = np.arange(x.size) / fs
    da = DataArray(x, dims=("time",), coords={"time": t}, name="x")
    out = cwt(da, wavelet=f"cmor{float(g['B'])}-{float(g['C'])}",
              freqs=freqs)
    Wlib = np.asarray(out.data)
    assert Wlib.shape == W.shape
    # absolute floor covers rows whose true response is ~1e-6 (wavelet
    # tail truncation noise in the quadrature); energetic rows must
    # match to near machine precision
    assert np.abs(Wlib - W).max() < 5e-6
    for i in range(freqs.size):
        mx = np.abs(W[i]).max()
        if mx > 1e-3:
            # rows near Nyquist carry ~2e-6 rel from the quadrature's
            # spatial wrap vs the library's spectral truncation
            assert np.abs(Wlib[i] - W[i]).max() / mx < 1e-5, freqs[i]


@pytest.mark.parametrize("case", [0, 1, 2, 3])
def test_peak_local_max_matches_bruteforce_golden(case):
    g = np.load(os.path.join(FIX, "golden_plm.npz"))
    img, params = g["img"], g["params"]
    md, ta, tr, eb = params[case]
    kw = dict(min_distance=int(md), exclude_border=bool(eb))
    if ta > -1e29:
        kw["threshold_abs"] = float(ta)
    if tr > -1e29:
        kw["threshold_rel"] = float(tr)
    da = DataArray(img, dims=("y", "x"), name="img")
    mask = np.asarray(peak_local_max(da, **kw).data)
    assert np.array_equal(mask, g[f"mask{case}"])
