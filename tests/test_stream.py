"""Stream-layer tests: client waterfall, availability scans, duration,
running RMS, FDSN request building, VDMS gating, DSL host path."""
import io as _io
import urllib.request

import numpy as np
import pandas as pd
import pytest

from xcorr_tpu.stream import (Channel, Client, Inventory, Stats, Stream,
                              SyntheticClient, Trace, duration, running_rms)
from xcorr_tpu.stream import process as stream_process


class TestSyntheticClient:
    def test_deterministic(self):
        c1 = SyntheticClient(sampling_rate=5.0)
        c2 = SyntheticClient(sampling_rate=5.0)
        a = c1._get_waveforms_for_date("IU.RAR.10.BHZ", "2014-01-01")
        b = c2._get_waveforms_for_date("IU.RAR.10.BHZ", "2014-01-01")
        np.testing.assert_array_equal(a[0].data, b[0].data)
        # different days differ
        c = c1._get_waveforms_for_date("IU.RAR.10.BHZ", "2014-01-02")
        assert not np.array_equal(a[0].data, c[0].data)

    def test_get_waveforms_window(self):
        client = SyntheticClient(sampling_rate=5.0)
        st = client.get_waveforms(
            receiver="IU.RAR.10.BHZ", time=pd.Timestamp("2014-01-01T12:00"),
            centered=True, duration=3600.0, buffer=180.0)
        assert len(st) == 1
        # duration + 2*buffer
        assert st[0].stats.npts == pytest.approx(
            (3600 + 360) * 5 + 1, abs=2)

    def test_availability_scan(self):
        client = SyntheticClient(
            sampling_rate=5.0,
            missing={("IU.RAR.10.BHZ", "2014001")})
        days = pd.date_range("2014-01-01", periods=2, freq="1D")
        av = client.verify_waveform_availability(
            ["IM.H03S1..EDH-IU.RAR.10.BHZ"], days, substitute=False,
            parallel=True)
        assert av.dims == ("receiver", "time")
        sel = av.sel(receiver="IU.RAR.10.BHZ")
        assert sel.values[0] == -1 and sel.values[1] == 1

    def test_processing_preflight(self):
        client = SyntheticClient(sampling_rate=5.0)
        ops = {"BHZ": [("detrend", {"type": "demean"})],
               "EDH": [("detrend", {"type": "demean"})]}
        st = client.verify_waveform_processing(
            ["IU.RAR.10.BHZ", "IM.H03S1..EDH"],
            pd.Timestamp("2014-01-01T12:00"), operations=ops,
            sampling_rate=5.0, parallel=False)
        assert (st.values == 1).all()


class TestDuration:
    def test_accounting(self):
        fs = 10.0
        t1 = Trace(np.zeros(1000), Stats(network="N", station="S",
                                         location="", channel="CHZ",
                                         starttime="2014-01-01",
                                         sampling_rate=fs))
        t2 = Trace(np.zeros(500), Stats(network="N", station="S",
                                        location="", channel="CHZ",
                                        starttime="2014-01-01T00:02:00",
                                        sampling_rate=fs))
        df = duration(Stream([t1, t2]))
        assert len(df) == 1
        row = df.iloc[0]
        assert row["segments"] == 2
        assert row["npts"] == 1500
        assert row["gaps"] > 0  # 100s-1000 samples gap


class TestRunningRms:
    def test_band_code_and_values(self):
        fs = 10.0
        tr = Trace(np.ones(6000) * 3.0,
                   Stats(network="N", station="S", location="",
                         channel="BHZ", sampling_rate=fs))
        out = running_rms(tr, window=60.0)
        assert out.stats.channel == "VHZ"  # >= 1 min -> V band code
        np.testing.assert_allclose(out.data, 3.0)
        out2 = running_rms(tr, window=3600.0 / 6)
        assert out2.stats.channel == "VHZ"
        long = Trace(np.ones(40000),
                     Stats(network="N", station="S", location="",
                           channel="BHZ", sampling_rate=fs))
        out3 = running_rms(long, window=3600.0)
        assert out3.stats.channel == "UHZ"  # >= 1h -> U


class TestFdsn:
    def test_request_url(self, monkeypatch):
        captured = {}

        def fake_urlopen(url, timeout=None):
            captured["url"] = url
            return _io.BytesIO(b"")

        monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
        from xcorr_tpu.stream.fdsn import fdsn_dataselect
        st = fdsn_dataselect("IRIS", "IU.RAR.10.BHZ", "2014-01-02")
        assert len(st) == 0  # empty payload -> empty stream
        url = captured["url"]
        assert url.startswith(
            "https://service.iris.edu/fdsnws/dataselect/1/query?")
        assert "network=IU" in url and "station=RAR" in url
        assert "starttime=2014-01-02T00%3A00%3A00" in url

    def test_client_gated_without_url(self):
        client = SyntheticClient(sampling_rate=5.0)
        assert client._remote_fetch("IU.RAR.10.BHZ", "2014-01-01") is not \
            None  # returns empty Stream, never raises


class TestVdms:
    def test_waterfall_uses_vdms_hook(self, tmp_path):
        calls = []

        def request(receiver, day):
            calls.append((receiver, str(day)))
            tr = Trace(np.ones(100),
                       Stats(network="IM", station="H03S1", location="",
                             channel="EDH", starttime=day,
                             sampling_rate=5.0))
            return Stream([tr])

        client = Client(sds_root=str(tmp_path), vdms_request=request)
        st = client._get_waveforms_for_date("IM.H03S1..EDH", "2014-01-01")
        assert len(st) == 1
        assert calls  # VDMS tier was consulted (SDS empty, no FDSN)


class TestProcessDSL:
    def test_hash_roundtrip_and_tamper(self):
        ops = stream_process.example_process_dict()
        hashed = stream_process.hash_operations(ops)
        assert stream_process.check_operations_hash(hashed)
        js = stream_process.operations_to_json(hashed)
        back = stream_process.operations_to_dict(js)
        assert back["sha256_hash"] == hashed["sha256_hash"]
        hashed["BHZ"][0] = ("merge", {"method": 0})
        assert not stream_process.check_operations_hash(hashed)

    def test_callable_operation(self):
        def double(waveforms, factor=2.0):
            for tr in waveforms:
                tr.data = tr.data * factor
            return waveforms

        tr = Trace(np.ones(10), Stats(network="N", station="S",
                                      location="", channel="CHZ",
                                      sampling_rate=1.0))
        out = stream_process.process(Stream([tr]), [(double,
                                                     {"factor": 3.0})])
        np.testing.assert_allclose(out[0].data, 3.0)

    def test_invalid_op_warns_not_raises(self):
        tr = Trace(np.ones(10), Stats(network="N", station="S",
                                      location="", channel="CHZ",
                                      sampling_rate=1.0))
        with pytest.warns(UserWarning):
            out = stream_process.process(Stream([tr]),
                                         [("frobnicate", {})])
        assert out is not None  # invalid ops are skipped with a warning
