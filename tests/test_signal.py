"""Signal-layer tests: labelled ops vs oracles and known-answer synthetics."""
import numpy as np
import pandas as pd
import pytest
import scipy.signal as sp_signal

from xcorr_tpu import signal as xs
from xcorr_tpu.ndlabel import DataArray, Dataset


def make_cc(npair=2, nlag=512, fs=50.0, seed=0):
    lag = (np.arange(nlag) - nlag // 2) / fs
    da = DataArray(
        np.random.default_rng(seed).normal(size=(npair, nlag)),
        dims=("pair", "lag"),
        coords={"pair": np.array([f"P{i}-Q{i}" for i in range(npair)],
                                 dtype=object),
                "lag": lag},
        name="cc",
        attrs={"long_name": "Cross-correlation Estimate",
               "standard_name": "cc", "units": "-", "unbiased": 0},
    )
    da.coords["lag"].attrs.update({
        "sampling_rate": fs, "delta": 1 / fs, "npts": nlag,
        "index_min": 0, "index_max": 2 * nlag - 1, "units": "s"})
    return da


class TestChainOps:
    def test_filter_matches_scipy(self):
        da = make_cc()
        out = da.signal.filter(frequency=3.0, btype="highpass", order=2)
        sos = sp_signal.butter(2, 3.0, btype="highpass", fs=50.0,
                               output="sos")
        want = sp_signal.sosfiltfilt(sos, da.values, axis=-1)
        np.testing.assert_allclose(out.values, want, rtol=1e-7, atol=1e-10)
        assert "filter" in out.attrs["history"]

    def test_demean_taper(self):
        da = make_cc() + 3.0
        out = da.signal.demean()
        np.testing.assert_allclose(out.values.mean(axis=-1), 0, atol=1e-12)
        tp = out.signal.taper(max_length=0.5)
        assert tp.values[0, 0] == 0.0

    def test_timeshift_per_pair_delay(self):
        da = make_cc(npair=3)
        delays = DataArray(np.array([0.0, 0.1, -0.1]), dims=("pair",))
        out = da.signal.timeshift(delay=delays, dim="lag")
        np.testing.assert_allclose(out.values[0], da.values[0], atol=1e-9)
        assert not np.allclose(out.values[1], da.values[1])

    def test_unbias(self):
        from xcorr_tpu.util import cc as cc_host
        npts, fs = 51, 50.0
        full_lag = cc_host.lag(npts, 1 / fs)  # length 101
        imin, imax = 25, 90  # clipped window
        da = DataArray(
            np.random.default_rng(1).normal(size=(1, imax - imin)),
            dims=("pair", "lag"),
            coords={"pair": np.array(["A-B"], dtype=object),
                    "lag": full_lag[imin:imax]},
            name="cc", attrs={"long_name": "cc", "standard_name": "cc",
                              "unbiased": 0})
        da.coords["lag"].attrs.update({
            "sampling_rate": fs, "delta": 1 / fs, "npts": npts,
            "index_min": imin, "index_max": imax, "units": "s"})
        out = da.signal.unbias()
        assert out.attrs["unbiased"] == 1
        k = np.arange(imin, imax) - (npts - 1)
        w = npts / (npts - np.abs(k))
        np.testing.assert_allclose(out.values, da.values * w, rtol=1e-12)
        # double unbias warns and returns unchanged
        with pytest.warns(UserWarning):
            again = out.signal.unbias()
        np.testing.assert_array_equal(again.values, out.values)


class TestFFT:
    def test_fft_ifft_roundtrip_restores_dim(self):
        da = make_cc()
        F = da.signal.fft(dim="lag")
        assert F.dims == ("pair", "freq")
        assert np.iscomplexobj(F.values)
        back = F.signal.ifft(dim="freq")
        # reciprocal attrs restore the original dim name
        assert back.dims == ("pair", "lag")
        np.testing.assert_allclose(np.real(back.values), da.values,
                                   atol=1e-10)
        np.testing.assert_allclose(back.coords["lag"].values,
                                   da.coords["lag"].values, atol=1e-9)

    def test_rfft_irfft_roundtrip(self):
        da = make_cc(nlag=512)
        F = da.signal.rfft(dim="lag")
        assert F.sizes["freq"] == 257
        back = F.signal.irfft(dim="freq")
        np.testing.assert_allclose(back.values, da.values, atol=1e-10)


class TestCorrelate:
    def test_correlate1d_peak(self):
        fs = 10.0
        n = 256
        t = np.arange(n) / fs
        sig = np.random.default_rng(3).normal(size=n)
        shift = 12
        a = DataArray(np.roll(sig, shift)[None], dims=("pair", "time"),
                      coords={"pair": np.array(["A-B"], dtype=object),
                              "time": t}, name="a")
        b = DataArray(sig[None], dims=("pair", "time"),
                      coords={"pair": np.array(["A-B"], dtype=object),
                              "time": t}, name="b")
        cc = xs.correlate1d(a, b, dim="time")
        assert cc.dims == ("pair", "delta_time")
        assert cc.sizes["delta_time"] == 2 * n - 1
        peak_lag = cc.coords["delta_time"].values[
            int(np.argmax(cc.values[0]))]
        np.testing.assert_allclose(peak_lag, shift / fs, atol=1e-9)

    def test_correlate2d_matches_scipy(self):
        rng = np.random.default_rng(5)
        a = rng.normal(size=(16, 20))
        b = rng.normal(size=(16, 20))
        da = DataArray(a[None], dims=("pair", "f", "t"),
                       coords={"pair": np.array(["X-Y"], dtype=object),
                               "f": np.arange(16.0), "t": np.arange(20.0)})
        db = DataArray(b[None], dims=("pair", "f", "t"),
                       coords={"pair": np.array(["X-Y"], dtype=object),
                               "f": np.arange(16.0), "t": np.arange(20.0)})
        cc = xs.correlate2d(da, db, dims=("f", "t"), normalize=False)
        want = sp_signal.correlate2d(a, b, mode="full")
        # scipy correlate2d(a, b)[k] = sum a[k' + ...]: align conventions —
        # our r[i, j] at delta index (i-(n1-1), j-(n2-1)) equals
        # sum a[m+di, n+dj] b[m, n] = scipy.correlate(a, b, 'full') flipped
        got = cc.values[0]
        corr = sp_signal.fftconvolve(a, b[::-1, ::-1], mode="full")
        np.testing.assert_allclose(got, corr, rtol=1e-9, atol=1e-9)
        assert cc.sizes["delta_f"] == 31 and cc.sizes["delta_t"] == 39


class TestSNR:
    def test_known_snr(self):
        fs = 50.0
        nlag = 2048
        lag = np.arange(nlag) / fs
        data = np.random.default_rng(7).normal(size=(1, nlag)) * 0.1
        data[0, 1000] = 5.0  # injected peak
        da = DataArray(data, dims=("pair", "lag"),
                       coords={"pair": np.array(["A-B"], dtype=object),
                               "lag": lag},
                       name="cc", attrs={"long_name": "cc",
                                         "standard_name": "cc",
                                         "units": "-"})
        da.coords["lag"].attrs.update({"sampling_rate": fs, "delta": 1 / fs,
                                       "units": "s"})
        sigm = (da.coords["lag"] >= 15.0) & (da.coords["lag"] <= 25.0)
        noim = da.coords["lag"] >= 30.0
        out = xs.snr(da, sigm, noim, dim="lag", extend=True,
                     institution="t", author="t", source="t")
        assert isinstance(out, Dataset)
        s = out["s"].values[0]
        assert s == pytest.approx(5.0)
        assert out["lag_s_max"].values[0] == pytest.approx(20.0)
        noise_rms = np.sqrt((data[0, lag >= 30.0] ** 2).mean())
        assert out["snr"].values[0] == pytest.approx(5.0 / noise_rms)


class TestTrigger:
    def test_coincidence_periods(self):
        nt = 200
        t = pd.date_range("2015-01-01", periods=nt, freq="3h").values
        snr_vals = np.ones((2, nt))
        snr_vals[:, 50:70] = 20.0  # coincident on both elements
        snr_vals[0, 100:120] = 20.0  # only one element -> no trigger
        da = DataArray(snr_vals, dims=("pair", "time"),
                       coords={"pair": np.array(["A-B", "C-D"],
                                                dtype=object), "time": t},
                       name="snr", attrs={"long_name": "snr",
                                          "standard_name": "snr"})
        da.coords["time"].attrs.update({"window_length": 86400.0,
                                        "window_overlap": 0.875})
        ct = xs.coincidence_trigger(da, thr_on=10.0, extend=0)
        assert ct.attrs["nperiods"] == 1
        vals = ct.values
        assert np.nansum(vals == 0) >= 19
        assert np.isnan(vals[100])  # single-element trigger excluded
        periods = xs.trigger_periods(ct)
        assert len(periods) == 1

    def test_similarity_threshold_gates_events(self):
        """similarity_threshold drops coincident events whose
        characteristic functions disagree in shape, keeps matching ones
        (spec: xcorr/signal/trigger.py:146-150 obspy semantics)."""
        nt = 200
        t = pd.date_range("2015-01-01", periods=nt, freq="3h").values
        snr_vals = np.ones((2, nt))
        # event A: both elements rise with the SAME ramp shape
        ramp = np.linspace(12.0, 30.0, 20)
        snr_vals[0, 50:70] = ramp
        snr_vals[1, 50:70] = ramp * 1.5  # scaled copy: similarity ~1
        # event B: coincident but OPPOSITE shapes (anticorrelated)
        snr_vals[0, 120:140] = ramp
        snr_vals[1, 120:140] = ramp[::-1]
        da = DataArray(snr_vals, dims=("pair", "time"),
                       coords={"pair": np.array(["A-B", "C-D"],
                                                dtype=object), "time": t},
                       name="snr", attrs={"long_name": "snr",
                                          "standard_name": "snr"})
        da.coords["time"].attrs.update({"window_length": 86400.0,
                                        "window_overlap": 0.875})
        # no gate: both coincident events trigger
        ct = xs.coincidence_trigger(da, thr_on=10.0, extend=0)
        assert ct.attrs["nperiods"] == 2
        # gate at 0.9: the anticorrelated event is dropped
        ct = xs.coincidence_trigger(da, thr_on=10.0, extend=0,
                                    similarity_threshold=0.9)
        assert ct.attrs["nperiods"] == 1
        vals = ct.values
        assert np.isfinite(vals[50:70]).any()
        assert np.isnan(vals[120:140]).all()


class TestPeakLocalMax:
    def test_finds_injected_peaks(self):
        grid = np.zeros((1, 64, 64))
        grid[0, 10, 20] = 5.0
        grid[0, 40, 50] = 3.0
        grid[0, 11, 21] = 1.0  # suppressed by min_distance
        da = DataArray(grid, dims=("pair", "f", "t"),
                       coords={"pair": np.array(["A-B"], dtype=object),
                               "f": np.arange(64.0), "t": np.arange(64.0)},
                       name="psd")
        mask = xs.peak_local_max(da, min_distance=3, threshold_abs=0.5)
        peaks = np.argwhere(mask.values[0])
        assert {tuple(p) for p in peaks} == {(10, 20), (40, 50)}
        df = xs.peak_local_max(da, min_distance=3, threshold_abs=0.5,
                               as_dataframe=True)
        assert df.iloc[0]["value"] == 5.0


class TestBeamform:
    def test_recovers_plane_wave(self):
        # 5 receivers, plane wave from az=60 deg at 1.48 km/s
        fs = 10.0
        n = 1024
        rng = np.random.default_rng(11)
        src = sp_signal.sosfiltfilt(
            sp_signal.butter(4, 0.3, output="sos"), rng.normal(size=4 * n))
        x_m = np.array([0.0, 2.0, -1.5, 1.0, -2.0]) * 1e3
        y_m = np.array([0.0, 1.0, 2.0, -2.0, -1.0]) * 1e3
        vel = 1480.0  # m/s
        az = 60.0  # propagation direction (deg from north)
        sx = np.sin(np.radians(az)) / vel  # s/m
        sy = np.cos(np.radians(az)) / vel
        sig = np.zeros((5, n))
        for i in range(5):
            delay = x_m[i] * sx + y_m[i] * sy  # seconds
            shift = int(round(delay * fs))
            sig[i] = src[2 * n - shift: 3 * n - shift]
        t = np.arange(n) / fs
        s = DataArray(sig, dims=("r", "time"),
                      coords={"r": np.arange(5), "time": t}, name="s")
        s.coords["time"].attrs.update({"sampling_rate": fs,
                                       "delta": 1 / fs, "units": "s"})
        x = DataArray(x_m, dims=("r",), coords={"r": np.arange(5)})
        y = DataArray(y_m, dims=("r",), coords={"r": np.arange(5)})
        ds = xs.plane_wave_estimate(s, x, y, dim="time",
                                    institution="t", author="t", source="t")
        # wave travels toward az -> it arrives FROM az+180 (DOA convention)
        assert abs(float(ds["doa"].values) - (az + 180.0) % 360.0) < 10.0
        assert abs(float(ds["vel"].values) - vel) / vel < 0.2


class TestCwtLombscargle:
    def test_cwt_peak_frequency(self):
        fs = 100.0
        n = 2048
        t = np.arange(n) / fs
        f0 = 12.0
        da = DataArray(np.sin(2 * np.pi * f0 * t)[None],
                       dims=("pair", "time"),
                       coords={"pair": np.array(["A-B"], dtype=object),
                               "time": t}, name="cc")
        da.coords["time"].attrs.update({"sampling_rate": fs,
                                        "delta": 1 / fs, "units": "s"})
        sg = xs.scaleogram(da, fmin=2.0, fmax=40.0, nfreqs=60)
        power = sg.values[0, :, n // 2 - 200: n // 2 + 200].mean(axis=-1)
        peak_f = sg.coords["freq"].values[np.argmax(power)]
        assert abs(peak_f - f0) / f0 < 0.1

    def test_lombscargle_sine(self):
        rng = np.random.default_rng(13)
        t = np.sort(rng.uniform(0, 100, 400))
        f0 = 0.5
        y = np.sin(2 * np.pi * f0 * t)
        da = DataArray(y[None], dims=("pair", "time"),
                       coords={"pair": np.array(["A-B"], dtype=object),
                               "time": t}, name="v")
        out = xs.lombscargle(da, freqs=np.linspace(0.05, 2.0, 300))
        peak = out.coords["freq"].values[np.argmax(out.values[0])]
        assert abs(peak - f0) < 0.02

    def test_lombscargle_scipy_oracle_nan_rows(self):
        """Vectorized closed form == scipy per row (NaN gaps, both
        normalizations); an all-NaN row yields NaN."""
        import scipy.signal as sp_signal

        rng = np.random.default_rng(7)
        t = np.sort(rng.uniform(0, 50, 257))
        rows = rng.normal(size=(6, t.size))
        rows[0, ::3] = np.nan          # regular gaps
        rows[1, 10:200] = np.nan       # a long hole
        rows[2] = np.nan               # all invalid
        freqs = np.linspace(0.07, 2.3, 111)
        ang = 2 * np.pi * freqs
        da = DataArray(rows, dims=("pair", "time"),
                       coords={"time": t}, name="v")
        for normalize in (False, True):
            out = xs.lombscargle(da, freqs=freqs, normalize=normalize)
            assert np.isnan(out.values[2]).all()
            for i in (0, 1, 3, 4, 5):
                valid = ~np.isnan(rows[i])
                y = rows[i][valid] - rows[i][valid].mean()
                want = sp_signal.lombscargle(t[valid], y, ang,
                                             normalize=normalize)
                np.testing.assert_allclose(out.values[i], want,
                                           rtol=1e-9, atol=1e-12)


class TestTri:
    def test_mask_and_mirror(self):
        c1 = DataArray(np.arange(4), dims=("time1",), name="time1")
        c2 = DataArray(np.arange(4), dims=("time2",), name="time2")
        m = xs.tri_mask(c1, c2, k=1)
        assert m.values.sum() == 6
        x = DataArray(np.triu(np.arange(16, dtype=float).reshape(4, 4), 0),
                      dims=("time1", "time2"))
        full = xs.tri_mirror(x, upper=True)
        np.testing.assert_allclose(full.values, full.values.T)


class TestSpectrogram:
    def test_psd_shape_and_peak(self):
        fs = 50.0
        n = 1000
        lag = np.arange(n) / fs
        da = DataArray(np.sin(2 * np.pi * 10.0 * lag)[None],
                       dims=("pair", "lag"),
                       coords={"pair": np.array(["A-B"], dtype=object),
                               "lag": lag}, name="cc")
        da.coords["lag"].attrs.update({"sampling_rate": fs, "delta": 1 / fs,
                                       "units": "s"})
        psd = da.signal.spectrogram(duration=2.5, padding_factor=4)
        assert psd.dims == ("pair", "freq", "lag")
        assert psd.sizes["lag"] == n  # zero-padded back to input length
        mid = psd.values[0, :, n // 2]
        peak_f = psd.coords["freq"].values[np.argmax(mid)]
        assert abs(peak_f - 10.0) < 0.5
