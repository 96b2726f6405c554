"""Device-compiled preprocess chains vs the host (Trace-method) path."""
import numpy as np
import pytest

from xcorr_tpu.stream import PAZResponse, Stats, Trace
from xcorr_tpu.stream.compile import compile_operations


def host_run(ops_list, data, fs, response=None):
    """Reference: the per-trace host path."""
    from xcorr_tpu.stream import Inventory, Channel
    from xcorr_tpu.stream.process import process
    tr = Trace(data.copy(), Stats(network="IU", station="TST",
                                  location="", channel="BHZ",
                                  starttime="2014-01-01",
                                  sampling_rate=fs))
    inv = None
    if response is not None:
        inv = Inventory([Channel("IU", "TST", "", "BHZ",
                                 response=response)])
    out = process(tr, ops_list, inventory=inv, raise_error=True)
    return out.data if hasattr(out, "data") else out[0].data


class TestCompiledChains:
    def test_detrend_taper_filter_chain(self):
        fs, n = 50.0, 20_000
        ops_list = [
            ("detrend", {"type": "demean"}),
            ("taper", {"type": "cosine", "max_percentage": 0.05,
                       "max_length": 30.0}),
            ("filter", {"type": "bandpass", "freqmin": 3.0,
                        "freqmax": 20.0}),
            ("detrend", {"type": "demean"}),
        ]
        rng = np.random.default_rng(0)
        data = rng.normal(size=n) + 5.0
        fn, n_out, fs_out = compile_operations(ops_list, n, fs)
        got = np.asarray(fn(data[None]))[0]
        want = host_run(ops_list, data, fs)
        assert (n_out, fs_out) == (n, fs)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_decimate_matches_host(self):
        fs, n = 250.0, 25_000
        ops_list = [("decimate", {"factor": 5})]
        data = np.random.default_rng(1).normal(size=n)
        fn, n_out, fs_out = compile_operations(ops_list, n, fs)
        got = np.asarray(fn(data[None]))[0]
        want = host_run(ops_list, data, fs)
        assert fs_out == 50.0
        assert got.size == want.size
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_lanczos_interpolate_matches_host(self):
        fs, n = 40.0, 8_000
        ops_list = [("interpolate", {"sampling_rate": 50, "method":
                                     "lanczos", "a": 20})]
        data = np.random.default_rng(2).normal(size=n)
        fn, n_out, fs_out = compile_operations(ops_list, n, fs)
        got = np.asarray(fn(data[None]))[0]
        want = host_run(ops_list, data, fs)
        assert fs_out == 50.0
        assert n_out == want.size  # strict sample-count parity
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_remove_response_and_sensitivity(self):
        fs, n = 20.0, 10_000
        paz = PAZResponse(poles=[-0.04 + 0.04j, -0.04 - 0.04j],
                          zeros=[0, 0], gain=1.0, sensitivity=2.5e8)
        data = np.random.default_rng(3).normal(size=n)
        for ops_list in ([("remove_sensitivity", {})],
                         [("remove_response", {"output": "VEL",
                                               "water_level": 60.0})]):
            fn, n_out, fs_out = compile_operations(ops_list, n, fs,
                                                   response=paz)
            got = np.asarray(fn(data[None]))[0]
            want = host_run(ops_list, data, fs, response=paz)
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-12)

    def test_production_edh_chain(self):
        """The canonical EDH hydrophone chain end-to-end (250 -> 50 Hz)."""
        fs, n = 250.0, 50_000
        ops_list = [
            ("merge", {"method": 1}),              # host op: skipped
            ("detrend", {"type": "demean"}),
            ("remove_sensitivity", {}),
            ("filter", {"type": "bandpass", "freqmin": 3.0,
                        "freqmax": 20.0}),
            ("decimate", {"factor": 5}),
            ("trim", {}),                          # host op: skipped
            ("detrend", {"type": "demean"}),
            ("taper", {"type": "cosine", "max_percentage": 0.05,
                       "max_length": 30.0}),
        ]
        paz = PAZResponse(sensitivity=1e9)
        data = np.random.default_rng(4).normal(size=(3, n))  # batch of 3
        fn, n_out, fs_out = compile_operations(ops_list, n, fs,
                                               response=paz)
        got = np.asarray(fn(data))
        assert fs_out == 50.0
        assert got.shape == (3, n_out)
        want0 = host_run([o for o in ops_list
                          if o[0] not in ("merge", "trim")],
                         data[0], fs, response=paz)
        np.testing.assert_allclose(got[0], want0, rtol=1e-5, atol=1e-10)

    def test_running_rms(self):
        fs, n = 10.0, 6_000
        ops_list = [("running_rms", {"window": 60.0})]
        data = np.random.default_rng(5).normal(size=n)
        fn, n_out, fs_out = compile_operations(ops_list, n, fs)
        got = np.asarray(fn(data[None]))[0]
        assert n_out == 10  # 600 s / 60 s windows
        want = np.sqrt((data.reshape(10, 600) ** 2).mean(axis=1))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_unsupported_op_raises(self):
        with pytest.raises(NotImplementedError):
            compile_operations([("frobnicate", {})], 100, 1.0)

    def test_trim_to(self):
        fn, n_out, _ = compile_operations(
            [("detrend", {"type": "demean"})], 1000, 10.0, trim_to=800)
        assert n_out == 800
        out = np.asarray(fn(np.ones((1, 1000))))
        assert out.shape == (1, 800)


class TestFusedPipeline:
    def test_device_pipeline_matches_host_process(self):
        """The fused device pipeline must reproduce the host path
        (core.process semantics) on identical raw blocks."""
        import jax.numpy as jnp
        from xcorr_tpu import ops
        from xcorr_tpu.parallel import FusedPipeline
        from xcorr_tpu.stream.process import process as host_process

        fs, dur = 10.0, 2000.0
        npts_raw = int(dur * fs)
        npts = int(1800.0 * fs)  # correlation window after trim
        ops_list = [
            ("detrend", {"type": "demean"}),
            ("filter", {"type": "bandpass", "freqmin": 0.3,
                        "freqmax": 3.0}),
            ("taper", {"type": "cosine", "max_percentage": 0.05}),
        ]
        rng = np.random.default_rng(0)
        B = 3
        x_raw = rng.normal(size=(B, npts_raw))
        y_raw = rng.normal(size=(B, npts_raw))

        pipe = FusedPipeline(ops_list, ops_list, npts_raw, fs, npts_raw,
                             fs, npts, index_min=npts - 1,
                             index_max=npts - 1 + 500)
        got = pipe(x_raw, y_raw)
        assert got.shape == (B, 500)

        # host path: per-trace preprocessing then the oracle correlator
        for b in range(B):
            tra = Trace(x_raw[b].copy(), Stats(network="IU", station="A",
                                               location="", channel="BHZ",
                                               sampling_rate=fs))
            trb = Trace(y_raw[b].copy(), Stats(network="IU", station="B",
                                               location="", channel="BHZ",
                                               sampling_rate=fs))
            a = host_process(tra, ops_list, raise_error=True).data[:npts]
            c = host_process(trb, ops_list, raise_error=True).data[:npts]
            want = np.asarray(ops.cc.correlate(
                jnp.asarray(a[None]), jnp.asarray(c[None]),
                index_min=npts - 1, index_max=npts - 1 + 500))[0]
            np.testing.assert_allclose(got[b], want, atol=1e-5)


class TestMultiSpanPipeline:
    def test_pre_padded_stack_matches(self):
        """``pre_padded_len`` materializes the preprocessed window stack
        at stage-A geometry (zero tail) inside the step; the result must
        match the plain pipeline (on accelerators the correlate kernel
        then skips its zero-extension pass; on CPU it trims back)."""
        from xcorr_tpu.ops.fft4 import padded_len
        from xcorr_tpu.parallel import MultiSpanPipeline

        fs, span_dur = 10.0, 3000.0
        span = int(span_dur * fs)
        npts_raw = int(2000.0 * fs)
        npts = int(1800.0 * fs)
        ops_list = [("detrend", {"type": "demean"}),
                    ("taper", {"type": "cosine", "max_percentage": 0.05})]
        offsets = [(0, 0), (0, 5000)]
        rng = np.random.default_rng(3)
        raw_a = rng.normal(size=(1, span)).astype(np.float32)
        raw_b = rng.normal(size=(1, span)).astype(np.float32)

        common = dict(index_min=npts - 1, index_max=npts - 1 + 400)
        args = (ops_list, ops_list, span, fs, span, fs, offsets, offsets,
                npts_raw, npts_raw, npts)
        want = MultiSpanPipeline(*args, **common)(raw_a, raw_b)
        got = MultiSpanPipeline(
            *args, pre_padded_len=padded_len(npts), **common)(raw_a, raw_b)
        assert got.shape == want.shape == (2, 400)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=5e-8)


class TestCompileTrimSemantics:
    """Host parity of the buffer trim position and the strict stage
    gates (review findings: trailing detrend/taper must act on the
    FINAL window; never silently default a response/taper/rate op)."""

    def test_trim_applies_at_dsl_position(self):
        """Explicit ('trim', {}) mid-chain: the slice happens THERE, so
        the trailing demean+taper see the final window — matching the
        host path, where starttime/endtime inject at the trim op."""
        fs = 10.0
        npts, off = 2_000, 100          # final window, buffer samples
        n_buf = npts + 2 * off
        ops_list = [
            ("filter", {"type": "highpass", "freq": 0.1}),
            ("trim", {}),
            ("detrend", {"type": "demean"}),
            ("taper", {"type": "cosine", "max_percentage": 0.05}),
        ]
        rng = np.random.default_rng(7)
        data = rng.normal(size=n_buf) + 3.0
        fn, n_out, fs_out = compile_operations(
            ops_list, n_buf, fs, trim_to=npts, trim_offset=off)
        got = np.asarray(fn(data[None]))[0]
        assert (n_out, fs_out) == (npts, fs)
        # oracle: filter on the buffered trace, slice the host-inclusive
        # npts+1 window (Trace.trim endtime is inclusive), demean+taper
        # on it, then drop the extra endtime sample (the client's final
        # st.trim)
        filt = host_run([ops_list[0]], data, fs)[off:off + npts + 1]
        want = host_run(ops_list[2:], filt, fs)[:npts]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
        # the taper ramps must actually be present at the window edges
        # (the last kept sample sits one INSIDE the inclusive taper, so
        # it is ramp-suppressed rather than exactly zero)
        assert abs(got[0]) < 1e-12
        assert abs(got[-1]) < 0.01 * float(np.std(got))

    def test_trim_without_marker_slices_at_end(self):
        """No explicit trim op: the slice lands at the end (matching
        the client's trailing st.trim)."""
        fs, npts, off = 10.0, 1_000, 50
        n_buf = npts + 2 * off
        ops_list = [("detrend", {"type": "demean"})]
        data = np.random.default_rng(8).normal(size=n_buf)
        fn, n_out, _ = compile_operations(ops_list, n_buf, fs,
                                          trim_to=npts, trim_offset=off)
        got = np.asarray(fn(data[None]))[0]
        want = (data - data.mean())[off:off + npts]
        assert n_out == npts
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_detrend_simple_is_endpoint_line(self):
        fs, n = 10.0, 500
        data = np.random.default_rng(9).normal(size=n) + \
            np.linspace(0.0, 3.0, n)
        fn, _, _ = compile_operations([("detrend", {"type": "simple"})],
                                      n, fs)
        got = np.asarray(fn(data[None]))[0]
        want = host_run([("detrend", {"type": "simple"})], data, fs)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
        assert abs(got[0]) < 1e-6 and abs(got[-1]) < 1e-6

    def test_strict_stage_gates(self):
        fs, n = 10.0, 1_000
        with pytest.raises(ValueError, match="taper"):
            compile_operations([("taper", {"type": "hann"})], n, fs)
        with pytest.raises(ValueError, match="remove_sensitivity"):
            compile_operations([("remove_sensitivity", {})], n, fs)
        with pytest.raises(ValueError, match="remove_response"):
            compile_operations([("remove_response", {})], n, fs)
        with pytest.raises(ValueError, match="running_rms"):
            compile_operations([("running_rms", {"window": 200.0})],
                               n, fs)
        with pytest.raises(NotImplementedError, match="resample"):
            compile_operations([("resample", {"sampling_rate": 5.0})],
                               n, fs)
        # explicit sensitivity parameter still compiles without a
        # response
        fn, _, _ = compile_operations(
            [("remove_sensitivity", {"sensitivity": 2.0})], n, fs)
        out = np.asarray(fn(np.ones((1, n), np.float32)))
        assert float(out[0, 0]) == 0.5
