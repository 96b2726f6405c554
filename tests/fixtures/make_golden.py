"""Generate golden-value fixtures for cwt and peak_local_max.

Run once (CPU, float64) and commit the resulting ``.npz`` files; the
test suite asserts the library implementations against these frozen
numbers (VERDICT r4 ask #7 — pin the numerical behavior with fixed
reference values, not just properties).

The oracles here are INDEPENDENT of the library code paths:

* cwt: direct time-domain quadrature of the continuous wavelet
  correlation integral  W(s, t) = s^(-1/2) * (1/fs) *
  sum_u x[u] conj(psi((u - t)/(s*fs_samples)))  with the complex
  Morlet ``psi(t) = (pi*B)^(-1/2) exp(2i*pi*C*t) exp(-t^2/B)``
  (pywt cmorB-C definition, ref xcorr/signal/cwt.py:91-139), evaluated
  with periodic wrap to match the library's circular-FFT convention.
* peak_local_max: brute-force per-pixel Chebyshev-neighborhood
  maximum test with exclude-border, following skimage's documented
  maximum-filter semantics (ref xcorr/signal/peak_local_max.py:95-188).
"""
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------------
# cwt golden: two-tone signal, direct quadrature oracle
# ---------------------------------------------------------------------

def psi_cmor(t, B, C):
    return (np.pi * B) ** -0.5 * np.exp(2j * np.pi * C * t) * np.exp(
        -t ** 2 / B)


def cwt_quadrature(x, fs, freqs, B, C):
    """Direct (periodic) quadrature of the CWT correlation integral."""
    n = x.size
    scales_samples = C * fs / freqs          # pywt convention
    scales_sec = scales_samples / fs
    u = np.arange(n) / fs                    # absolute sample times (s)
    out = np.empty((freqs.size, n), dtype=np.complex128)
    period = n / fs
    for i, s in enumerate(scales_sec):
        for k in range(n):
            # periodic distance u - t_k wrapped to [-period/2, period/2)
            d = u - u[k]
            d = (d + period / 2) % period - period / 2
            w = np.conj(psi_cmor(d / s, B, C))
            out[i, k] = (x * w).sum() / fs / np.sqrt(s)
    return out


def make_cwt():
    fs = 8.0
    n = 256
    t = np.arange(n) / fs
    x = (np.sin(2 * np.pi * 0.5 * t)
         + 0.5 * np.sin(2 * np.pi * 2.0 * t + 0.7)).astype(np.float64)
    freqs = np.array([0.25, 0.5, 1.0, 2.0, 3.0])
    B, C = 1.5, 1.0
    W = cwt_quadrature(x, fs, freqs, B, C)
    np.savez(os.path.join(HERE, "golden_cwt.npz"),
             x=x, fs=fs, freqs=freqs, B=B, C=C,
             W_real=W.real, W_imag=W.imag)
    print("golden_cwt.npz:", W.shape,
          "|W| row maxima:", np.abs(W).max(axis=1))


# ---------------------------------------------------------------------
# peak_local_max golden: seeded random field + hand-placed bumps
# ---------------------------------------------------------------------

def plm_bruteforce(img, min_distance, threshold_abs, threshold_rel,
                   exclude_border):
    h, w = img.shape
    md = int(min_distance)
    thr = -np.inf
    if threshold_abs is not None:
        thr = max(thr, threshold_abs)
    if threshold_rel is not None:
        thr = max(thr, threshold_rel * img.max())
    mask = np.zeros_like(img, dtype=bool)
    for i in range(h):
        for j in range(w):
            v = img[i, j]
            if not np.isfinite(v) or v <= thr:
                continue
            if exclude_border and (i < md or j < md or i >= h - md
                                   or j >= w - md):
                continue
            neigh = img[max(0, i - md):i + md + 1,
                        max(0, j - md):j + md + 1]
            if v == np.nanmax(neigh):
                mask[i, j] = True
    return mask


def make_plm():
    rng = np.random.default_rng(1234)
    img = rng.normal(size=(24, 32))
    # hand-placed strong bumps: two distant peaks + one pair 2 apart
    img[5, 6] += 10.0
    img[15, 20] += 12.0
    img[15, 23] += 11.0   # 3 columns from the stronger bump
    cases = []
    for md, ta, tr, eb in [(1, None, None, True),
                           (2, 0.0, None, True),
                           (3, None, 0.5, True),
                           (2, None, None, False)]:
        m = plm_bruteforce(img, md, ta, tr, eb)
        cases.append((md, -1e30 if ta is None else ta,
                      -1e30 if tr is None else tr, eb, m))
    np.savez(os.path.join(HERE, "golden_plm.npz"),
             img=img,
             params=np.array([(c[0], c[1], c[2], c[3])
                              for c in cases], dtype=np.float64),
             **{f"mask{i}": c[4] for i, c in enumerate(cases)})
    for i, c in enumerate(cases):
        print(f"plm case {i}: md={c[0]} npeaks={int(c[4].sum())}")


if __name__ == "__main__":
    make_cwt()
    make_plm()
