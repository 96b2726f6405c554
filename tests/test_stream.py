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

    def test_short_source_period(self):
        """Source periods shorter than twice the 60 s edge guard must
        shrink the guard instead of raising (low >= high draw), and
        every receiver still sees the same onset draws."""
        c = SyntheticClient(sampling_rate=5.0, source_period=60.0,
                            delays={"AA": 0.0, "BB": 4.0})
        a = c._get_waveforms_for_date("IM.AA..EDH", "2014-01-01")[0]
        b = c._get_waveforms_for_date("IM.BB..EDH", "2014-01-01")[0]
        assert a.data.shape == b.data.shape == (86400 * 5,)
        assert np.isfinite(a.data).all()
        # degenerate draw range: wavelet barely fits the period
        c2 = SyntheticClient(sampling_rate=5.0, source_period=2.5)
        st = c2._get_waveforms_for_date("IM.AA..EDH", "2014-01-01")
        assert np.isfinite(st[0].data).all()
        # period shorter than the wavelet: noise only, no crash
        c3 = SyntheticClient(sampling_rate=5.0, source_period=0.1)
        st3 = c3._get_waveforms_for_date("IM.AA..EDH", "2014-01-01")
        assert np.isfinite(st3[0].data).all()

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


class TestTraceTrimPad:
    """trim(pad=True) must return exactly the requested grid, including
    windows DISJOINT from the data (regression: an entirely-after
    window returned ``i1 - npts`` samples of pure fill)."""

    @staticmethod
    def _trace():
        from xcorr_tpu.stream.trace import UTCDateTime
        return Trace(np.arange(10.0), Stats(
            network="N", station="S", location="", channel="C",
            sampling_rate=1.0, starttime=UTCDateTime("2014-01-01")))

    def test_window_after_data(self):
        tr = self._trace()
        t0 = tr.stats.starttime
        out = tr.copy().trim(t0 + 20, t0 + 24, pad=True, fill_value=-1.0)
        assert out.stats.npts == 5
        assert np.all(out.data == -1.0)
        assert out.stats.starttime == t0 + 20

    def test_window_before_data(self):
        tr = self._trace()
        t0 = tr.stats.starttime
        out = tr.copy().trim(t0 - 25, t0 - 21, pad=True, fill_value=-1.0)
        assert out.stats.npts == 5
        assert np.all(out.data == -1.0)
        assert out.stats.starttime == t0 - 25

    def test_window_straddling_data(self):
        tr = self._trace()
        t0 = tr.stats.starttime
        out = tr.copy().trim(t0 - 3, t0 + 11, pad=True)
        assert out.stats.npts == 15
        np.testing.assert_array_equal(out.data[:3], 0.0)
        np.testing.assert_array_equal(out.data[3:13], np.arange(10.0))
        np.testing.assert_array_equal(out.data[13:], 0.0)
        assert out.stats.starttime == t0 - 3


class TestMaxGapGating:
    """max_gap duration gate + 4-state availability flags
    (reference ``xcorr/stream/client.py:270-423,794-835``)."""

    @staticmethod
    def _day_trace(fs=5.0, missing_seconds=0.0):
        n = int((86400 - missing_seconds) * fs)
        return Trace(np.zeros(n), Stats(network="IM", station="H03S1",
                                        location="", channel="EDH",
                                        starttime="2014-01-01",
                                        sampling_rate=fs))

    def test_check_duration(self):
        client = SyntheticClient(sampling_rate=5.0, max_gap=300.0)
        assert client.check_duration(Stream([self._day_trace()]))
        assert client.check_duration(
            Stream([self._day_trace(missing_seconds=100.0)]))
        assert not client.check_duration(
            Stream([self._day_trace(missing_seconds=400.0)]))
        assert not client.check_duration(Stream())
        # sampling_rate filters the duration scan (reference kwargs
        # passthrough): a wrong-rate stream contributes no coverage
        assert client.check_duration(Stream([self._day_trace()]),
                                     sampling_rate=5.0)
        assert not client.check_duration(Stream([self._day_trace()]),
                                         sampling_rate=50.0)

    def test_client_summary_and_stream_plot(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        client = Client(sds_root=str(tmp_path))
        s = str(client)
        for key in ("sds read", "fdsn", "vdms", "max gap"):
            assert key in s
        assert "vdms : No" in s
        st = SyntheticClient(sampling_rate=5.0).get_waveforms(
            receiver="IM.H10N1..EDH",
            time=pd.Timestamp("2015-01-15T12:00"),
            centered=True, duration=60.0, buffer=0.0)
        fig = st.plot()
        assert len(fig.axes) == len(st)
        matplotlib.pyplot.close(fig)

    def test_partial_remote_day_rejected(self, tmp_path):
        """A downloaded day with more than max_gap seconds missing is
        neither archived nor returned — unless force_write."""
        short = self._day_trace(missing_seconds=900.0)

        class PartialRemote(Client):
            def _remote_fetch(self, receiver, date, verb=0):
                return Stream([short.copy()])

        client = PartialRemote(sds_root=str(tmp_path / "sds"),
                               max_gap=300.0)
        st = client._get_waveforms_for_date("IM.H03S1..EDH",
                                            pd.Timestamp("2014-01-01"))
        assert len(st) == 0
        assert len(client.write_archive.read(
            "IM.H03S1..EDH", pd.Timestamp("2014-01-01"))) == 0

        # force_write archives the gappy day (it fails the gate, so the
        # CURRENT call still returns empty — reference semantics,
        # xcorr/stream/client.py:316-321); the next call reads it from
        # the archive tier
        forced = PartialRemote(sds_root=str(tmp_path / "sds2"),
                               max_gap=300.0, force_write=True)
        st = forced._get_waveforms_for_date("IM.H03S1..EDH",
                                            pd.Timestamp("2014-01-01"))
        assert len(st) == 0
        assert len(forced.write_archive.read(
            "IM.H03S1..EDH", pd.Timestamp("2014-01-01"))) == 1
        st = forced._get_waveforms_for_date("IM.H03S1..EDH",
                                            pd.Timestamp("2014-01-01"))
        assert len(st) == 1

    def test_probe_flags(self):
        """_test_waveforms_for_date: 1 full, -1 missing/partial, -2 on
        error; availability scan metadata carries all four states."""
        client = SyntheticClient(sampling_rate=5.0,
                                 missing={"IU.RAR.10.BHZ"})
        assert client._test_waveforms_for_date(
            "IM.H03S1..EDH", pd.Timestamp("2014-01-01")) == 1
        assert client._test_waveforms_for_date(
            "IU.RAR.10.BHZ", pd.Timestamp("2014-01-01")) == -1

        class Exploding(SyntheticClient):
            def _get_waveforms_for_date(self, *a, **k):
                raise RuntimeError("boom")

        assert Exploding(sampling_rate=5.0)._test_waveforms_for_date(
            "IM.H03S1..EDH", pd.Timestamp("2014-01-01")) == -2

        av = client.verify_waveform_availability(
            ["IM.H03S1..EDH-IU.RAR.10.BHZ"],
            pd.date_range("2014-01-01", periods=1, freq="1D"),
            substitute=False)
        assert list(av.attrs["flag_values"]) == [-2, -1, 0, 1]
        assert av.sel(receiver="IM.H03S1..EDH").values[0] == 1
        assert av.sel(receiver="IU.RAR.10.BHZ").values[0] == -1


class TestScanAvailability:
    """Header-only SDS availability scans (`SDSArchive.coverage` /
    `Client._scan_availability_flag`): archived days resolve without a
    Steim decode and must flag exactly like the full-fetch probe."""

    @staticmethod
    def _archive_day(root, fmt, missing_seconds=0.0, fs=5.0,
                     day="2014-01-01"):
        from xcorr_tpu.stream.sds import SDSArchive
        n = int((86400 - missing_seconds) * fs)
        rng = np.random.default_rng(1)
        tr = Trace(rng.integers(-500, 500, size=n).astype(np.int32),
                   Stats(network="IM", station="H03S1", location="",
                         channel="EDH", starttime=day, sampling_rate=fs))
        SDSArchive(root, format=fmt).write(Stream([tr]))

    @pytest.mark.parametrize("fmt", ["mseed", "h5"])
    def test_coverage_matches_decode(self, tmp_path, fmt):
        from xcorr_tpu.stream.sds import SDSArchive
        root = str(tmp_path / fmt)
        self._archive_day(root, fmt, missing_seconds=400.0)
        arch = SDSArchive(root)
        segs = arch.coverage("IM.H03S1..EDH", pd.Timestamp("2014-01-01"))
        st = arch.read("IM.H03S1..EDH", pd.Timestamp("2014-01-01"))
        assert sum(n for _, _, n, _ in segs) == \
            sum(tr.stats.npts for tr in st)
        assert all(sid == "IM.H03S1..EDH" for sid, _, _, _ in segs)
        assert all(r == 5.0 for _, _, _, r in segs)

    @pytest.mark.parametrize("fmt", ["mseed", "h5"])
    def test_flag_parity_with_full_probe(self, tmp_path, fmt):
        day = pd.Timestamp("2014-01-01")
        for sub, missing in (("full", 0.0), ("gappy", 400.0)):
            root = str(tmp_path / fmt / sub)
            self._archive_day(root, fmt, missing_seconds=missing)
            fast = Client(sds_root=root)
            slow = Client(sds_root=root, scan_availability=False)
            assert fast._test_waveforms_for_date("IM.H03S1..EDH", day) \
                == slow._test_waveforms_for_date("IM.H03S1..EDH", day) \
                == (1 if missing == 0.0 else -1)
            # a day absent from the archive falls through to the fetch
            # waterfall on both paths (no remote configured -> -1)
            other = pd.Timestamp("2014-01-02")
            assert fast._test_waveforms_for_date("IM.H03S1..EDH", other) \
                == slow._test_waveforms_for_date("IM.H03S1..EDH", other) \
                == -1

    def test_scan_probe_skips_decode(self, tmp_path, monkeypatch):
        """The fast path must never call the decoding day-file reader."""
        from xcorr_tpu.stream import sds as sds_mod
        root = str(tmp_path / "a")
        self._archive_day(root, "mseed")

        def boom(path):
            raise AssertionError("decode path used by availability scan")

        monkeypatch.setattr(sds_mod, "read_dayfile", boom)
        client = Client(sds_root=root)
        assert client._test_waveforms_for_date(
            "IM.H03S1..EDH", pd.Timestamp("2014-01-01")) == 1


class TestSyntheticArchiveWaterfall:
    """SyntheticClient with ``sds_root``: the production waterfall runs
    — first fetch synthesizes AND archives, subsequent fetches read the
    day file (codec path), availability scans the headers."""

    def test_archive_then_read(self, tmp_path, monkeypatch):
        root = str(tmp_path / "sds")
        cl = SyntheticClient(sampling_rate=5.0, sds_root=root)
        day = pd.Timestamp("2014-01-01")
        st1 = cl._get_waveforms_for_date("IM.H03S1..EDH", day)
        assert len(st1) and st1[0].stats.npts == int(86400 * 5)
        # the day file landed in the SDS tree
        from xcorr_tpu.stream.sds import SDSArchive
        segs = SDSArchive(root).coverage("IM.H03S1..EDH", day)
        assert sum(s[2] for s in segs) == int(86400 * 5)
        # second fetch must come from the archive, not the synthesizer
        monkeypatch.setattr(cl, "_synthesize_day",
                            lambda *a: 1 / 0)
        st2 = cl._get_waveforms_for_date("IM.H03S1..EDH", day)
        np.testing.assert_allclose(st2[0].data, st1[0].data)
        # availability resolves header-only from the archive too
        assert cl._test_waveforms_for_date("IM.H03S1..EDH", day) == 1

    @pytest.mark.parametrize("fmt", ["h5", "mseed"])
    def test_concurrent_read_write_locked(self, tmp_path, fmt):
        """Readers take the day file's shared lock: a prefetch thread
        must never observe a half-written file (regression: h5 reads
        raced archive writes and saw datasets without attrs)."""
        from concurrent.futures import ThreadPoolExecutor
        from xcorr_tpu.stream.sds import SDSArchive
        arch = SDSArchive(str(tmp_path / "sds"), format=fmt)
        day = pd.Timestamp("2014-01-01")
        rng = np.random.default_rng(0)
        data = rng.integers(-500, 500, size=20_000).astype(np.int32)
        tr = Trace(data, Stats(network="IM", station="H03S1", location="",
                               channel="EDH", starttime=day,
                               sampling_rate=5.0))
        arch.write(Stream([tr]))

        def hammer(k):
            for _ in range(20):
                if k % 2:
                    arch.write(Stream([tr]))
                else:
                    st = arch.read("IM.H03S1..EDH", day)
                    assert len(st) >= 1
                    assert st[0].stats.npts == data.size
                    segs = arch.coverage("IM.H03S1..EDH", day)
                    assert sum(s[2] for s in segs) == data.size
            return True

        with ThreadPoolExecutor(max_workers=6) as ex:
            assert all(ex.map(hammer, range(6)))

    def test_read_only_archive_reads_lock_free(self, tmp_path,
                                               monkeypatch):
        """Reads must not require write access to the archive tree
        (regression: open(path + '.lock', 'a') raised EROFS/EACCES on
        read-only mounts — the common curated-archive setup). Writers
        must still refuse to proceed without the lock."""
        import builtins
        from xcorr_tpu.stream.sds import SDSArchive
        arch = SDSArchive(str(tmp_path / "sds"))
        day = pd.Timestamp("2014-01-01")
        tr = Trace(np.arange(1000, dtype=np.float32),
                   Stats(network="IM", station="H03S1", location="",
                         channel="EDH", starttime=day, sampling_rate=5.0))
        arch.write(Stream([tr]))

        real_open = builtins.open

        def deny_lock(file, *a, **k):
            if isinstance(file, str) and file.endswith(".lock"):
                raise PermissionError(13, "read-only archive", file)
            return real_open(file, *a, **k)

        monkeypatch.setattr(builtins, "open", deny_lock)
        st = arch.read("IM.H03S1..EDH", day)  # lock-free fallback
        assert len(st) == 1 and st[0].stats.npts == 1000
        assert arch.coverage("IM.H03S1..EDH", day)
        with pytest.raises(PermissionError):
            arch.write(Stream([tr]))  # writers must not fall back

    def test_no_archive_stays_sds_free(self):
        cl = SyntheticClient(sampling_rate=5.0)
        st = cl._get_waveforms_for_date("IM.H03S1..EDH",
                                        pd.Timestamp("2014-01-01"))
        assert len(st) == 1
        assert not cl.archives


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


def _full_day_trace(day, fs=5.0):
    return Trace(np.ones(int(86400 * fs)),
                 Stats(network="IM", station="H03S1", location="",
                       channel="EDH", starttime=day, sampling_rate=fs))


class FakeVdmsTransport:
    """Message-queue fake: serves a canned result after a fixed number
    of status polls."""

    def __init__(self, result, polls=2, final="COMPLETED"):
        self.result = result
        self.polls = polls
        self.final = final
        self.messages = []
        self._seen = {}

    def submit(self, message):
        self.messages.append(message)
        rid = f"req-{len(self.messages)}"
        self._seen[rid] = 0
        return rid

    def status(self, rid):
        self._seen[rid] += 1
        if self._seen[rid] <= self.polls:
            return "QUEUED" if self._seen[rid] == 1 else "RUNNING"
        return self.final

    def fetch(self, rid):
        return self.result


class TestVdms:
    def test_waterfall_uses_vdms_hook(self, tmp_path):
        calls = []

        def request(receiver, day):
            calls.append((receiver, str(day)))
            return Stream([_full_day_trace(day)])

        client = Client(sds_root=str(tmp_path), vdms_request=request)
        st = client._get_waveforms_for_date("IM.H03S1..EDH", "2014-01-01")
        assert len(st) == 1
        assert calls  # VDMS tier was consulted (SDS empty, no FDSN)

    def test_transport_request_cycle(self, tmp_path):
        """Full IMS2.0 submit -> poll -> fetch cycle against a fake
        transport; the day stream is archived on success."""
        day = pd.Timestamp("2014-01-01")
        transport = FakeVdmsTransport(Stream([_full_day_trace(day)]))
        client = Client(sds_root=str(tmp_path), vdms_transport=transport)
        client.vdms._poll_interval = 0.0

        st = client._get_waveforms_for_date("IM.H03S1..EDH", day)
        assert len(st) == 1
        assert st[0].stats.npts == 432000
        # request message carries the IMS2.0 waveform request fields
        msg = transport.messages[0]
        assert "BEGIN IMS2.0" in msg and "MSG_TYPE REQUEST" in msg
        assert "STA_LIST H03S1" in msg and "CHAN_LIST EDH" in msg
        assert "TIME 2014/01/01 00:00:00 TO 2014/01/02 00:00:00" in msg
        assert "WAVEFORM" in msg and msg.rstrip().endswith("STOP")
        assert client.vdms.last_request[1] == "COMPLETED"
        # archived: the next call is served by the SDS tier (no new
        # message submitted)
        st = client._get_waveforms_for_date("IM.H03S1..EDH", day)
        assert len(st) == 1 and len(transport.messages) == 1

    def test_transport_failure_and_partial(self, tmp_path):
        day = pd.Timestamp("2014-01-01")
        # terminal failure -> empty stream
        bad = FakeVdmsTransport(None, polls=1, final="ERROR")
        client = Client(sds_root=str(tmp_path / "a"), vdms_transport=bad)
        client.vdms._poll_interval = 0.0
        st = client._get_waveforms_for_date("IM.H03S1..EDH", day)
        assert len(st) == 0
        assert client.vdms.last_request[1] == "ERROR"
        # a gappy VDMS day is rejected by the max_gap gate like any
        # downloaded tier
        short = Trace(np.ones(100), Stats(network="IM", station="H03S1",
                                          location="", channel="EDH",
                                          starttime=day, sampling_rate=5.0))
        partial = FakeVdmsTransport(Stream([short]))
        client = Client(sds_root=str(tmp_path / "b"),
                        vdms_transport=partial)
        client.vdms._poll_interval = 0.0
        st = client._get_waveforms_for_date("IM.H03S1..EDH", day)
        assert len(st) == 0


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


class TestVdmsTimeout:
    def test_poll_timeout_returns_empty(self):
        """A request stuck in QUEUED past the deadline yields an empty
        stream with a timeout warning, not a hang."""
        import pytest as _pytest
        from xcorr_tpu.stream.vdms import VDMSClient

        class NeverDone:
            def submit(self, message):
                return "req-1"

            def status(self, rid):
                return "QUEUED"

            def fetch(self, rid):  # pragma: no cover
                raise AssertionError("fetch must not be called")

        client = VDMSClient(transport=NeverDone(), poll_interval=0.01,
                            timeout=0.05)
        with _pytest.warns(UserWarning, match="timed out"):
            st = client.get_waveforms("IM.H03S1..EDH", "2014-01-01")
        assert len(st) == 0
        assert client.last_request[1] == "QUEUED"


class TestStreamMerge:
    """Interval-based merge: dtype preservation, gap fills, and the
    documented NaN-payload passthrough (previous sentinel-based fill
    would have bridged in-data NaNs)."""

    @staticmethod
    def _tr(data, t0_s, fs=1.0, dtype=None):
        from xcorr_tpu.stream.trace import UTCDateTime
        data = np.asarray(data, dtype=dtype)
        return Trace(data, Stats(
            network="N", station="S", location="", channel="C",
            sampling_rate=fs,
            starttime=UTCDateTime("2014-01-01") + t0_s))

    def test_contiguous_preserves_dtype(self):
        st = Stream([self._tr(np.arange(5), 0, dtype=np.float32),
                     self._tr(np.arange(5), 5, dtype=np.float32)])
        st.merge(method=1)
        assert len(st) == 1
        assert st[0].data.dtype == np.float32
        np.testing.assert_array_equal(
            st[0].data, np.r_[np.arange(5), np.arange(5)])

    def test_gap_interpolate_matches_linear_bridge(self):
        # samples 0..4 then 8..9: gap indices 5,6,7 bridge 4.0 -> 80.0
        st = Stream([self._tr([0, 1, 2, 3, 4.0], 0),
                     self._tr([80, 90.0], 8)])
        st.merge(method=1, fill_value="interpolate")
        got = st[0].data
        exp = np.interp(np.arange(10), [0, 1, 2, 3, 4, 8, 9],
                        [0, 1, 2, 3, 4, 80, 90])
        np.testing.assert_allclose(got, exp, rtol=0, atol=0)

    def test_gap_zero_fill_default(self):
        st = Stream([self._tr([1.0, 1.0], 0), self._tr([2.0], 5)])
        st.merge(method=1)
        np.testing.assert_array_equal(st[0].data,
                                      [1, 1, 0, 0, 0, 2.0])

    def test_gap_method0_raises(self):
        st = Stream([self._tr([1.0], 0), self._tr([2.0], 5)])
        with pytest.raises(ValueError):
            st.merge(method=0)

    def test_int_traces_interpolate_promotes(self):
        # samples at indices 0,1 and 4 -> gap 2,3 bridges 4 -> 8
        st = Stream([self._tr([0, 4], 0, dtype=np.int32),
                     self._tr([8], 4, dtype=np.int32)])
        st.merge(method=1, fill_value="interpolate")
        assert np.issubdtype(st[0].data.dtype, np.floating)
        np.testing.assert_allclose(
            st[0].data, [0.0, 4.0, 4 + 4 / 3, 4 + 8 / 3, 8.0])

    def test_nan_payload_passes_through(self):
        data = np.array([1.0, np.nan, 3.0])
        st = Stream([self._tr(data, 0), self._tr([5.0, 6.0], 3)])
        st.merge(method=1, fill_value="interpolate")
        out = st[0].data
        assert np.isnan(out[1])  # payload NaN untouched (no gap here)
        np.testing.assert_array_equal(out[3:], [5.0, 6.0])

    def test_overlap_later_trace_wins(self):
        st = Stream([self._tr([1.0, 1.0, 1.0, 1.0], 0),
                     self._tr([9.0, 9.0], 2)])
        st.merge(method=1)
        np.testing.assert_array_equal(st[0].data, [1, 1, 9, 9.0])

    def test_numpy_float_fill_promotes_int_traces(self):
        # regression: isinstance(fill_value, float) missed np.floating
        # — np.float32 NaN crashed ("cannot convert float NaN to
        # integer") and np.float32(0.5) silently truncated to 0
        st = Stream([self._tr([1, 2], 0, dtype=np.int32),
                     self._tr([7], 4, dtype=np.int32)])
        st.merge(method=1, fill_value=np.float32(0.5))
        assert np.issubdtype(st[0].data.dtype, np.floating)
        np.testing.assert_allclose(st[0].data, [1, 2, 0.5, 0.5, 7.0])

        st = Stream([self._tr([1, 2], 0, dtype=np.int32),
                     self._tr([7], 4, dtype=np.int32)])
        st.merge(method=1, fill_value=np.float64(np.nan))
        out = st[0].data
        assert np.issubdtype(out.dtype, np.floating)
        assert np.isnan(out[2]) and np.isnan(out[3])
