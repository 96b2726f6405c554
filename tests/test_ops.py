"""Oracle tests: device kernels vs scipy/numpy reference implementations."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sp_signal

from xcorr_tpu import ops
from xcorr_tpu.util import cc as cc_host


class TestNextFastLen:
    def test_basic(self):
        assert ops.fft.next_fast_len(1) == 1
        assert ops.fft.next_fast_len(7) == 8
        assert ops.fft.next_fast_len(8) == 8
        assert ops.fft.next_fast_len(17) == 18  # 2*3^2

    def test_canonical_day(self):
        # canonical padded day-correlation length: 2^20*9 (TPU-safe
        # odd part; the 5-smooth 8,640,000 triggers XLA's dense-DFT
        # fallback on TPU)
        assert ops.fft.next_fast_len(8_639_999) == 9_437_184
        # unrestricted search still available off-TPU
        assert ops.fft.next_fast_len(8_639_999,
                                     radices=(2, 3, 5)) == 8_640_000


class TestCorrelate:
    def test_matches_host_reference(self):
        rng = np.random.default_rng(7)
        x = rng.normal(size=(3, 128))
        y = rng.normal(size=(3, 128))
        got = np.asarray(ops.cc.correlate(jnp.asarray(x), jnp.asarray(y),
                                          normalize=True))
        for i in range(3):
            want = cc_host.cc(x[i], y[i], normalize=True, unbiased=False)
            np.testing.assert_allclose(got[i], want, rtol=1e-9, atol=1e-12)

    def test_nfft_below_full_raises(self):
        x = jnp.zeros((1, 64), jnp.float32)
        with pytest.raises(ValueError, match="alias"):
            ops.cc.correlate(x, x, nfft=64)

    def test_pre_padded_shorter_input_raises(self):
        x = jnp.zeros((1, 64), jnp.float32)
        with pytest.raises(ValueError, match="pre_padded_n"):
            ops.cc.correlate(x, x, pre_padded_n=128)

    def test_precision_knob_validated(self, monkeypatch):
        """The kernel precision knob (kwarg or XCORR_CC_PRECISION)
        rejects bad values; valid values pass through on every path
        (on the cpu monolithic path it is a no-op)."""
        x = jnp.zeros((1, 64), jnp.float32)
        with pytest.raises(ValueError, match="precision"):
            ops.cc.correlate(x, x, precision="bogus")
        monkeypatch.setenv("XCORR_CC_PRECISION", "nope")
        with pytest.raises(ValueError, match="precision"):
            ops.cc.correlate(x, x)
        monkeypatch.setenv("XCORR_CC_PRECISION", "default")
        r_env = np.asarray(ops.cc.correlate(x + 1.0, x + 1.0))
        monkeypatch.delenv("XCORR_CC_PRECISION")
        r_kw = np.asarray(ops.cc.correlate(x + 1.0, x + 1.0,
                                           precision="default"))
        np.testing.assert_array_equal(r_env, r_kw)

    def test_unnormalized_matches_npcorrelate(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 64))
        y = rng.normal(size=(1, 64))
        got = np.asarray(ops.cc.correlate(jnp.asarray(x), jnp.asarray(y),
                                          normalize=False))[0]
        want = np.correlate(x[0], y[0], "full")
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)

    @pytest.mark.parametrize("imin,imax", [(0, 127), (64, 100), (10, 64),
                                           (63, 64), (0, 20), (100, 127)])
    def test_lag_clipping(self, imin, imax):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 64))
        y = rng.normal(size=(2, 64))
        full = np.asarray(ops.cc.correlate(jnp.asarray(x), jnp.asarray(y)))
        clipped = np.asarray(ops.cc.correlate(
            jnp.asarray(x), jnp.asarray(y), index_min=imin, index_max=imax))
        np.testing.assert_allclose(clipped, full[:, imin:imax], rtol=1e-12)

    def test_unbiased_weights_fused(self):
        rng = np.random.default_rng(9)
        x = rng.normal(size=(1, 32))
        y = rng.normal(size=(1, 32))
        got = np.asarray(ops.cc.correlate(
            jnp.asarray(x), jnp.asarray(y), unbiased=True))[0]
        want = cc_host.cc(x[0], y[0], normalize=True, unbiased=True)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)

    def test_fourstep_rejects_unsupported_args(self):
        """Forcing method='fourstep' with unbiased/nfft/clip_weight must
        raise, not silently drop the option."""
        x = jnp.asarray(np.zeros((1, 64), dtype=np.float32))
        for kw in ({"unbiased": True}, {"nfft": 128},
                   {"clip_weight": 2.0}):
            with pytest.raises(ValueError, match="fourstep"):
                ops.cc.correlate(x, x, method="fourstep", **kw)

    def test_impulse_pair_peak_at_injected_lag(self):
        n, shift = 512, 37
        sig = np.random.default_rng(11).normal(size=n)
        x = np.roll(sig, shift)
        r = np.asarray(ops.cc.correlate(jnp.asarray(x[None]),
                                        jnp.asarray(sig[None])))[0]
        assert int(np.argmax(r)) - (n - 1) == shift

    def test_float32_accuracy(self):
        rng = np.random.default_rng(13)
        x = rng.normal(size=(1, 4096)).astype(np.float32)
        y = rng.normal(size=(1, 4096)).astype(np.float32)
        got = np.asarray(ops.cc.correlate(jnp.asarray(x), jnp.asarray(y)))[0]
        want = cc_host.cc(x[0].astype(np.float64), y[0].astype(np.float64),
                          normalize=True, unbiased=False)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, atol=5e-6)


class TestFilter:
    @pytest.mark.parametrize("btype,freq", [
        ("highpass", 3.0), ("lowpass", 8.0), ("bandpass", (2.0, 10.0))])
    def test_sosfilt_matches_scipy(self, btype, freq):
        fs = 50.0
        sos = ops.filter.butter_sos(4, freq, btype, fs)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 2000))
        got = np.asarray(ops.filter.sosfilt(jnp.asarray(sos),
                                            jnp.asarray(x)))
        want = sp_signal.sosfilt(sos, x, axis=-1)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)

    def test_sosfilt_with_zi_matches_scipy(self):
        fs = 50.0
        sos = ops.filter.butter_sos(2, 3.0, "highpass", fs)
        zi = sp_signal.sosfilt_zi(sos)
        x = np.random.default_rng(2).normal(size=512)
        want, _ = sp_signal.sosfilt(sos, x, zi=zi)
        got = np.asarray(ops.filter.sosfilt(
            jnp.asarray(sos), jnp.asarray(x[None]),
            zi=jnp.asarray(zi)[:, None, :]))[0]
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("btype,freq", [
        ("highpass", 3.0), ("bandpass", (2.0, 10.0))])
    def test_sosfiltfilt_matches_scipy(self, btype, freq):
        fs = 50.0
        sos = ops.filter.butter_sos(2, freq, btype, fs)
        rng = np.random.default_rng(4)
        x = rng.normal(size=(3, 4000))
        got = np.asarray(ops.filter.sosfiltfilt(sos, jnp.asarray(x)))
        want = sp_signal.sosfiltfilt(sos, x, axis=-1)
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)

    def test_sosfiltfilt_eager_uses_jitted_cache(self):
        """Eager calls must route through the cached compiled cascade
        (op-by-op associative-scan dispatch was 7.0 of 9.2 s of the
        snr_ct benchmark) and match the traced path exactly."""
        fs = 50.0
        sos = ops.filter.butter_sos(2, 3.0, "highpass", fs)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 2000)))
        before = ops.filter._filtfilt_jitted.cache_info()
        eager = np.asarray(ops.filter.sosfiltfilt(sos, x))
        eager2 = np.asarray(ops.filter.sosfiltfilt(sos, x))
        after = ops.filter._filtfilt_jitted.cache_info()
        assert after.hits > before.hits  # second call reused the closure
        import jax
        traced = np.asarray(jax.jit(
            lambda d: ops.filter.sosfiltfilt(sos, d))(x))
        np.testing.assert_allclose(eager, traced, rtol=0, atol=0)
        np.testing.assert_array_equal(eager, eager2)


class TestTaperDetrend:
    def test_demean(self):
        x = np.random.default_rng(0).normal(size=(4, 100)) + 5.0
        out = np.asarray(ops.detrend.demean(jnp.asarray(x)))
        np.testing.assert_allclose(out.mean(axis=-1), 0.0, atol=1e-12)

    def test_detrend_linear_matches_scipy(self):
        rng = np.random.default_rng(8)
        x = rng.normal(size=(2, 500)) + np.linspace(0, 3, 500)
        got = np.asarray(ops.detrend.detrend_linear(jnp.asarray(x)))
        want = sp_signal.detrend(x, axis=-1, type="linear")
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)

    def test_detrend_nan_aware(self):
        x = np.linspace(0, 5, 200)[None, :].copy()
        x[0, 10:20] = np.nan
        got = np.asarray(ops.detrend.detrend_linear(jnp.asarray(x)))
        valid = ~np.isnan(got[0])
        np.testing.assert_allclose(got[0][valid], 0.0, atol=1e-10)

    def test_taper_vector_ends(self):
        t = ops.taper.taper_vector(100, "hann", max_percentage=0.1)
        assert t[0] == 0.0 and t[-1] == 0.0
        np.testing.assert_allclose(t[15:85], 1.0)

    def test_taper_max_length_cap(self):
        t = ops.taper.taper_vector(1000, "cosine", max_percentage=0.5,
                                   max_length=5.0, sampling_rate=10.0)
        # capped at 50 samples per side
        np.testing.assert_allclose(t[50:950], 1.0)
        assert t[0] == 0.0

    def test_taper_ramp_matches_reference_and_obspy(self):
        """The generic ramp must equal BOTH obspy's symmetric 2n+1
        window sides (Trace.taper) and the reference signal-layer's
        periodic 2n window left half (xcorr/signal/window.py:92) —
        the two are the same sequence; the old periodic 2n+1 form
        diverged by up to 8%."""
        for wlen in (5, 10, 50):
            t = ops.taper.taper_vector(10 * wlen, "hann",
                                       max_percentage=0.1)
            obspy_ramp = sp_signal.windows.hann(
                2 * wlen + 1, sym=True)[:wlen]
            ref_ramp = sp_signal.windows.hann(
                2 * wlen, sym=False)[:wlen]
            np.testing.assert_allclose(t[:wlen], obspy_ramp, atol=1e-7)
            np.testing.assert_allclose(t[:wlen], ref_ramp, atol=1e-7)
            # right side is the mirrored ramp (obspy convention)
            np.testing.assert_allclose(t[-wlen:], obspy_ramp[::-1],
                                       atol=1e-7)

    def test_detrend_linear_f32_day_scale(self):
        """f32 stability at day scale: the uncentered normal equations
        cancel catastrophically (measured O(0.01) residual offset); the
        centered fit stays at the f32 representability floor."""
        n = 4_750_000
        rng = np.random.default_rng(3)
        x = (1e-3 * np.arange(n) + 0.5
             + rng.normal(size=n) * 0.1).astype(np.float32)
        got = np.asarray(ops.detrend.detrend_linear(
            jnp.asarray(x)[None]))[0]
        want = sp_signal.detrend(x.astype(np.float64), type="linear")
        assert np.abs(got - want).max() < 2e-3
        assert abs(got.mean()) < 1e-3


class TestTimeshift:
    def test_integer_shift(self):
        fs = 10.0
        n = 256
        x = np.sin(2 * np.pi * 0.5 * np.arange(n) / fs)
        shifted = np.asarray(ops.timeshift.timeshift(
            jnp.asarray(x[None]), jnp.asarray([1.0]), delta=1 / fs))[0]
        # positive delay of 1 s = 10 samples to later times
        np.testing.assert_allclose(shifted[20:200], x[10:190], atol=1e-6)

    def test_subsample_shift_matches_spectral_oracle(self):
        # exact parity with the reference formula
        # (xcorr/signal/timeshift.py:90-96): rfft -> phase ramp -> irfft
        rng = np.random.default_rng(21)
        x = rng.normal(size=1000)
        d = 0.3
        got = np.asarray(ops.timeshift.timeshift(
            jnp.asarray(x[None]), jnp.asarray([d]), delta=1.0))[0]
        nfft = ops.fft.next_fast_len(1000)
        X = np.fft.rfft(x, nfft)
        f = np.fft.rfftfreq(nfft, 1.0)
        want = np.fft.irfft(X * np.exp(-2j * np.pi * f * d), nfft)[:1000]
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_per_row_delays_broadcast(self):
        x = np.vstack([np.sin(2 * np.pi * 0.01 * np.arange(512))] * 3)
        delays = np.array([0.0, 5.0, -5.0])
        out = np.asarray(ops.timeshift.timeshift(
            jnp.asarray(x), jnp.asarray(delays), delta=1.0))
        np.testing.assert_allclose(out[0], x[0], atol=1e-9)
        np.testing.assert_allclose(out[1][50:500], x[1][45:495], atol=1e-6)


class TestSpectrogram:
    def test_matches_scipy_density(self):
        fs = 50.0
        x = np.random.default_rng(17).normal(size=2048)
        win_len, hop, nfft = 125, 25, 500
        freqs, got = ops.spectrogram.stft_psd(
            jnp.asarray(x[None]), win_len=win_len, hop=hop, nfft=nfft,
            window="hann", sampling_rate=fs)
        f_sp, t_sp, want = sp_signal.spectrogram(
            x, fs=fs, window="hann", nperseg=win_len,
            noverlap=win_len - hop, nfft=nfft, detrend=False,
            scaling="density", mode="psd")
        np.testing.assert_allclose(freqs, f_sp)
        np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-7,
                                   atol=1e-12)


class TestFourStep:
    """The four-step pruned correlation must agree with the monolithic
    kernel bit-for-bit at f32 tolerance."""

    @pytest.mark.parametrize("n,imin,imax", [
        (1000, 0, 1999), (1000, 999, 1500), (1000, 200, 900),
        (5000, 4999, 6999), (1000, 500, 1500)])
    def test_matches_monolithic(self, n, imin, imax):
        from xcorr_tpu.ops.fft4 import correlate4
        rng = np.random.default_rng(n)
        x = rng.normal(size=(2, n)).astype(np.float32)
        y = rng.normal(size=(2, n)).astype(np.float32)
        want = np.asarray(ops.cc.correlate(
            jnp.asarray(x), jnp.asarray(y), index_min=imin,
            index_max=imax))
        got = np.asarray(correlate4(x, y, index_min=imin, index_max=imax,
                                    n1=64))
        np.testing.assert_allclose(got, want, atol=5e-7)

    def test_unnormalized(self):
        from xcorr_tpu.ops.fft4 import correlate4
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 512)).astype(np.float32)
        y = rng.normal(size=(1, 512)).astype(np.float32)
        got = np.asarray(correlate4(x, y, normalize=False, n1=32))[0]
        want = np.correlate(x[0].astype(np.float64),
                            y[0].astype(np.float64), "full")
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_pallas_stageb_interpret(self):
        """The fused Pallas stage-B path (interpret mode on CPU) must be
        oracle-exact vs the monolithic kernel."""
        from jax.experimental import pallas as pl
        from xcorr_tpu.ops import fft4, pallas_fft
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        pl.pallas_call = interp
        try:
            pallas_fft.plan_fused_stageb.cache_clear()
            pallas_fft.plan_fused_corr.cache_clear()
            fft4.plan_correlate4.cache_clear()
            rng = np.random.default_rng(3)
            n, imin, imax = 2000, 1999, 3000
            x = rng.normal(size=(2, n)).astype(np.float32)
            y = rng.normal(size=(2, n)).astype(np.float32)
            want = np.asarray(ops.cc.correlate(
                jnp.asarray(x), jnp.asarray(y), index_min=imin,
                index_max=imax))
            fn = fft4.plan_correlate4(n, imin, imax, n1=16,
                                      stageb="pallas")
            got = np.asarray(fn(x, y))
            # default precision='high' multiplies in bf16x3 (~18 mantissa
            # bits recovered): relative error ~2^-18 per product. At this
            # tiny n the CC values are ~0.02 so the absolute tolerance is
            # looser than the production-scale one (values ~1e-4..2e-3,
            # measured 1e-7 abs on v5e)
            np.testing.assert_allclose(got, want, atol=2e-6)
            fn = fft4.plan_correlate4(n, imin, imax, n1=16,
                                      stageb="pallas",
                                      precision="highest")
            got = np.asarray(fn(x, y))
            np.testing.assert_allclose(got, want, atol=5e-7)
            # n1=32: HALF=24 < N1 -> the Hermitian half-row fold
            # (C(N1-k1) = conj(C(k1)) + real-ifft weights) is exercised
            fn = fft4.plan_correlate4(n, imin, imax, n1=32,
                                      stageb="pallas",
                                      precision="highest")
            got = np.asarray(fn(x, y))
            np.testing.assert_allclose(got, want, atol=5e-7)
        finally:
            pl.pallas_call = orig
            pallas_fft.plan_fused_stageb.cache_clear()
            pallas_fft.plan_fused_corr.cache_clear()
            fft4.plan_correlate4.cache_clear()

    def test_pre_padded_matches(self):
        """``pre_padded=True`` plans consume stage-A-geometry buffers
        (zero tail, ``ops.fft4.padded_len``) and must match the
        self-padding plan to f32 ulp — the engine materializes window
        stacks at padded length so the kernel skips its zero-extension
        pass.  Not bit-exact: XLA fuses the self-padding plan's pad into
        the stage-A contraction (skipping the zero region), which
        reorders the f32 accumulation relative to the dense pre-padded
        dot."""
        from jax.experimental import pallas as pl
        from xcorr_tpu.ops import fft4, pallas_fft
        rng = np.random.default_rng(5)
        n, imin, imax = 2000, 1999, 3000
        x = rng.normal(size=(2, n)).astype(np.float32)
        y = rng.normal(size=(2, n)).astype(np.float32)

        def padded(v, plen):
            out = np.zeros((v.shape[0], plen), np.float32)
            out[:, :n] = v
            return out

        for stageb, n1 in (("fft", 16), ("matmul", 16)):
            plen = fft4.padded_len(n, n1=n1, stageb=stageb)
            want = np.asarray(fft4.plan_correlate4(
                n, imin, imax, n1=n1, stageb=stageb)(x, y))
            got = np.asarray(fft4.plan_correlate4(
                n, imin, imax, n1=n1, stageb=stageb, pre_padded=True)(
                padded(x, plen), padded(y, plen)))
            np.testing.assert_allclose(got, want, rtol=2e-6, atol=5e-8)

        # fused Pallas path (interpret mode on CPU)
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        pl.pallas_call = interp
        try:
            pallas_fft.plan_fused_corr.cache_clear()
            fft4.plan_correlate4.cache_clear()
            plen = fft4.padded_len(n, n1=32)
            want = np.asarray(fft4.plan_correlate4(
                n, imin, imax, n1=32, stageb="pallas",
                precision="highest")(x, y))
            got = np.asarray(fft4.plan_correlate4(
                n, imin, imax, n1=32, stageb="pallas",
                precision="highest", pre_padded=True)(
                padded(x, plen), padded(y, plen)))
            np.testing.assert_allclose(got, want, rtol=2e-6, atol=5e-8)
            # dispatch-level length validation
            with pytest.raises(ValueError, match="pre-padded"):
                ops.cc.correlate(jnp.asarray(padded(x, plen)),
                                 jnp.asarray(padded(y, plen)),
                                 index_min=imin, index_max=imax,
                                 method="fourstep", pre_padded_n=n + 1)
        finally:
            pl.pallas_call = orig
            pallas_fft.plan_fused_corr.cache_clear()
            fft4.plan_correlate4.cache_clear()

    def test_pallas_fused_inverse_interpret(self, monkeypatch):
        """XCORR_FFT4_FUSED_INV=1 (pruned inverse folded into the
        kernel as cross-block accumulation) must match the two-stage
        path exactly (interpret mode on CPU)."""
        from jax.experimental import pallas as pl
        from xcorr_tpu.ops import fft4, pallas_fft
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        pl.pallas_call = interp
        try:
            rng = np.random.default_rng(4)
            n, imin, imax = 2000, 1999, 3000
            x = rng.normal(size=(2, n)).astype(np.float32)
            y = rng.normal(size=(2, n)).astype(np.float32)
            want = np.asarray(ops.cc.correlate(
                jnp.asarray(x), jnp.asarray(y), index_min=imin,
                index_max=imax))
            for n1, precision in ((16, "highest"), (32, "highest"),
                                  (32, "high")):
                for flag in ("0", "1"):
                    monkeypatch.setenv("XCORR_FFT4_FUSED_INV", flag)
                    pallas_fft.plan_fused_corr.cache_clear()
                    pallas_fft.plan_fused_corr_acc.cache_clear()
                    fft4.plan_correlate4.cache_clear()
                    fn = fft4.plan_correlate4(n, imin, imax, n1=n1,
                                              stageb="pallas",
                                              precision=precision)
                    got = np.asarray(fn(x, y))
                    atol = 5e-7 if precision == "highest" else 2e-6
                    np.testing.assert_allclose(
                        got, want, atol=atol,
                        err_msg=f"n1={n1} prec={precision} "
                                f"fused={flag}")
        finally:
            pl.pallas_call = orig
            pallas_fft.plan_fused_stageb.cache_clear()
            pallas_fft.plan_fused_corr.cache_clear()
            pallas_fft.plan_fused_corr_acc.cache_clear()
            fft4.plan_correlate4.cache_clear()

    def test_optin_plans_reject_high_block(self):
        """The accumulator/full plans build the non-presplit constant
        layout; precision='high_block' must raise up front instead of
        failing with a dot_general shape mismatch at trace time."""
        from xcorr_tpu.ops import pallas_fft
        with pytest.raises(ValueError, match="high_block"):
            pallas_fft.plan_fused_corr_acc(16, 1024, 16384, 8,
                                           precision="high_block")
        with pytest.raises(ValueError, match="high_block"):
            pallas_fft.plan_fused_corr_full(16, 1024, 16384, 8, 8,
                                            precision="high_block")

    def test_pallas_full_fused_interpret(self, monkeypatch):
        """XCORR_FFT4_FULL=1 (stage-A + stage-B + multiply + inverse +
        pruned inverse in ONE kernel, bf16 hi/lo pre-split inputs) must
        match the stage-A-outside path to the bf16x3 expansion tolerance
        (interpret mode on CPU)."""
        from jax.experimental import pallas as pl
        from xcorr_tpu.ops import fft4, pallas_fft

        def clear():
            pallas_fft.plan_fused_corr.cache_clear()
            pallas_fft.plan_fused_corr_full.cache_clear()
            fft4.plan_correlate4.cache_clear()

        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        pl.pallas_call = interp
        try:
            rng = np.random.default_rng(6)
            n, imin, imax = 2000, 1999, 3000
            x = rng.normal(size=(2, n)).astype(np.float32)
            y = rng.normal(size=(2, n)).astype(np.float32)
            want = np.asarray(ops.cc.correlate(
                jnp.asarray(x), jnp.asarray(y), index_min=imin,
                index_max=imax))
            for n1 in (16, 32):
                monkeypatch.setenv("XCORR_FFT4_FULL", "1")
                clear()
                fn = fft4.plan_correlate4(n, imin, imax, n1=n1,
                                          stageb="pallas",
                                          precision="high")
                got = np.asarray(fn(x, y))
                np.testing.assert_allclose(got, want, atol=2e-6,
                                           err_msg=f"n1={n1}")
                # pre-padded inputs take the same kernel
                plen = fft4.padded_len(n, n1=n1)
                pad = np.zeros((2, plen), np.float32)
                padx, pady = pad.copy(), pad.copy()
                padx[:, :n] = x
                pady[:, :n] = y
                fnp = fft4.plan_correlate4(n, imin, imax, n1=n1,
                                           stageb="pallas",
                                           precision="high",
                                           pre_padded=True)
                np.testing.assert_allclose(np.asarray(fnp(padx, pady)),
                                           want, atol=2e-6)
        finally:
            pl.pallas_call = orig
            monkeypatch.delenv("XCORR_FFT4_FULL", raising=False)
            clear()


class TestFourStepPlan:
    """Host-side invariants of the four-step plan geometry."""

    @pytest.mark.parametrize("n,imin,imax,n1", [
        (1000, None, None, 8),       # full 2n-1 lag window
        (1000, 999, 1500, 8),        # positive lags only
        (1000, 200, 999, 8),         # negative lags only
        (1000, 500, 1500, 8),        # straddles zero lag (two segments)
        (4_320_000, 4_319_999, 5_939_999, 576),  # production config
        (4_320_000, None, None, 576),
        (777, 100, 1453, 16),        # odd window, nearly full
    ])
    def test_lag_window_is_slice_contiguous(self, n, imin, imax, n1):
        """The pruned flat layout must expose the lag window as static
        slices (asserted inside _plan against the element gather)."""
        from xcorr_tpu.ops import fft4
        nn = 2 * n - 1
        imin = 0 if imin is None else imin
        imax = nn if imax is None else imax
        p = fft4._plan(n, imin, imax, n1)
        total = sum(ln for _, ln in p["segs_flat"])
        assert total == imax - imin
        assert len(p["segs_flat"]) in (1, 2)

    def test_segments_cover_pruned_rows_only(self):
        from xcorr_tpu.ops import fft4
        p = fft4._plan(2048, 1000, 3000, 8)
        flat_max = len(p["out_rows"]) * p["N2"]
        for s, ln in p["segs_flat"]:
            assert 0 <= s and s + ln <= flat_max


class TestFourStepSequenceParallel:
    """SURVEY.md §2.8 P6: the k1 (slow DFT) axis of the four-step shards
    over a mesh axis — intra-op "sequence parallelism" for single windows
    whose working set exceeds one chip's HBM. Stage A frees k1, all
    middle stages are row-local, and the pruned inverse contracts over
    k1, so GSPMD's only collective is the inverse reduction over ICI.

    All host-mesh tests run ``stageb='matmul'``: XLA's CPU fft thunk
    RET_CHECKs on the layouts sharding induces (see the
    ``plan_correlate4`` docstring); on TPU both stage-B forms shard."""

    def _data(self, n=2000, b=4, seed=7):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(b, n)).astype(np.float32)
        y = rng.normal(size=(b, n)).astype(np.float32)
        return x, y

    def test_seq_sharded_matches_unsharded(self):
        import jax
        from jax.sharding import Mesh
        from xcorr_tpu.ops import fft4
        n, imin, imax = 2000, 1500, 3000
        x, y = self._data(n)
        want = np.asarray(
            fft4.plan_correlate4(n, imin, imax, n1=16)(x, y))
        devs = np.asarray(jax.devices("cpu")[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("batch", "seq"))
        fn = fft4.plan_correlate4(n, imin, imax, n1=16,
                                  stageb="matmul", mesh=mesh)
        got = np.asarray(fn(x, y))
        # identical math; only the f32 reduction order differs across
        # the seq shards
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=5e-8)
        # the pruned inverse contraction over the sharded k1 axis must
        # lower to a cross-device reduction
        hlo = fn.lower(x, y).compile().as_text()
        assert "all-reduce" in hlo or "reduce-scatter" in hlo

    def test_seq_only_mesh_and_missing_axis_names(self):
        import jax
        from jax.sharding import Mesh
        from xcorr_tpu.ops import fft4
        n, imin, imax = 2000, 1999, 3000
        x, y = self._data(n, b=2, seed=8)
        want = np.asarray(
            fft4.plan_correlate4(n, imin, imax, n1=16)(x, y))
        # 1-D seq-only mesh: the default mesh_axes ("batch", "seq")
        # must tolerate the absent batch axis (the doubly permuted
        # matmul fast axis is row-local, so sharding is unchanged)
        mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), ("seq",))
        got = np.asarray(fft4.plan_correlate4(
            n, imin, imax, n1=16, stageb="matmul", mesh=mesh)(x, y))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-7)

    def test_mesh_rejects_pallas_and_packed(self):
        import jax
        from jax.sharding import Mesh
        from xcorr_tpu.ops import fft4
        mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), ("seq",))
        with pytest.raises(ValueError, match="single-chip"):
            fft4.plan_correlate4(2000, 1999, 3000, n1=16,
                                 stageb="pallas", mesh=mesh)
        with pytest.raises(ValueError, match="packed"):
            fft4.plan_correlate4(2000, 1999, 3000, n1=16,
                                 packed=True, mesh=mesh)
