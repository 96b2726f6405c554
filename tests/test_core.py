"""End-to-end core-engine tests: init -> process -> write -> read ->
postprocess, with the synthetic client and the lazy batch driver."""
import os

import numpy as np
import pandas as pd
import pytest

import xcorr_tpu
from xcorr_tpu import util
from xcorr_tpu.stream import Channel, Inventory, SyntheticClient

FS = 5.0  # low rate keeps tests fast; window 1h
WINDOW = 3600.0

PREPROCESS = {
    "EDH": [
        ("detrend", {"type": "demean"}),
        ("filter", {"type": "bandpass", "freqmin": 0.3, "freqmax": 2.0}),
        ("detrend", {"type": "demean"}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ],
    "BHZ": [
        ("detrend", {"type": "demean"}),
        ("filter", {"type": "bandpass", "freqmin": 0.3, "freqmax": 2.0}),
        ("detrend", {"type": "demean"}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ],
}

ATTRS = {"institution": "Test, dept", "author": "pytest - t@t",
         "source": "synthetic"}

PAIR = "IM.H03S1..EDH-IU.RAR.10.BHZ"
DELAY = 4.0  # seconds injected between the two receivers


def make_client(**kw):
    return SyntheticClient(
        sampling_rate=FS,
        delays={"IM.H03S1..EDH": 0.0, "IU.RAR.10.BHZ": DELAY},
        source_period=600.0, source_amplitude=20.0, **kw)


def make_inventory():
    return Inventory([
        Channel("IM", "H03S1", "", "EDH", latitude=-33.6, longitude=-78.8),
        Channel("IU", "RAR", "10", "BHZ", latitude=-21.2, longitude=-159.8),
    ])


def init_ds(**kw):
    args = dict(
        pair=PAIR,
        starttime=pd.Timestamp("2014-01-01"),
        endtime=pd.Timestamp("2014-01-02"),
        preprocess=PREPROCESS,
        attrs=ATTRS,
        sampling_rate=FS,
        window_length=WINDOW,
        window_overlap=0.5,
        clip_lag=(-100.0, 100.0),
        inventory=make_inventory(),
    )
    args.update(kw)
    return xcorr_tpu.init(**args)


class TestInit:
    def test_schema(self):
        ds = init_ds()
        assert set(ds.data_vars) == {"distance", "status", "pair_offset",
                                     "time_offset", "cc"}
        assert ds["cc"].dims == ("pair", "time", "lag")
        assert ds["cc"].dtype == np.float32
        # window stride: 1h windows, 50% overlap -> 30 min steps, closed left
        assert ds.dims["time"] == 48
        # lag clipped to +-100 s at 5 Hz -> ~1001 samples
        assert abs(ds.dims["lag"] - 1001) <= 2
        assert ds.coords["lag"].attrs["npts"] == int(WINDOW * FS)
        assert "sha256_hash_metadata" in ds.attrs
        assert "sha256_hash" in ds.coords["pair"].attrs["preprocess"]
        # geodesic pair distance present (km)
        assert 7000 < ds["distance"].values[0] < 9000

    def test_init_requires_attrs(self):
        with pytest.raises(KeyError):
            init_ds(attrs={"institution": "x", "author": "y"})

    def test_init_complevel(self):
        # default is the documented level-1 divergence; complevel=9
        # restores the reference's exact storage config for every var.
        assert init_ds().encoding["cc"]["complevel"] == 1
        ds = init_ds(complevel=9)
        for var in ("cc", "status", "distance"):
            assert ds.encoding[var]["complevel"] == 9
            assert ds.encoding[var]["zlib"] is True


class TestProcess:
    def test_process_recovers_injected_delay(self):
        ds = init_ds(endtime=pd.Timestamp("2014-01-01T04:00"))
        client = make_client()
        xcorr_tpu.process(ds, client=client, verb=0)
        status = ds["status"].values
        assert (status == 1).all()
        cc = ds["cc"].values
        lag = ds.coords["lag"].values
        # peak must land at the injected inter-receiver delay:
        # x=EDH (no delay), y=BHZ (delayed by +4 s);
        # r[k] = sum x[j+k] y[j] peaks at k = -DELAY
        for it in range(cc.shape[1]):
            peak_lag = lag[int(np.argmax(cc[0, it]))]
            assert abs(peak_lag - (-DELAY)) < 1.0, (it, peak_lag)
        # normalized CC bounded
        assert np.abs(cc).max() <= 1.0
        # offsets recorded as zero (synthetic traces start on the window)
        assert np.allclose(ds["pair_offset"].values, 0.0)

    def test_missing_data_flags(self):
        ds = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"))
        client = make_client(missing={"IU.RAR.10.BHZ"})
        xcorr_tpu.process(ds, client=client, verb=0)
        assert (ds["status"].values == -1).all()
        # retry_missing with data available again
        client2 = make_client()
        xcorr_tpu.process(ds, client=client2, retry_missing=True, verb=0)
        assert (ds["status"].values == 1).all()

    def test_skip_processed(self):
        ds = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"))
        client = make_client()
        xcorr_tpu.process(ds, client=client, verb=0)
        cc0 = ds["cc"].values.copy()
        # zero out data; re-process must skip (status==1)
        ds["cc"].values[:] = 0
        xcorr_tpu.process(ds, client=client, verb=0)
        assert (ds["cc"].values == 0).all()
        assert not (cc0 == 0).all()


class TestRoundtripAndPostprocess:
    def test_write_read_postprocess(self, tmp_path):
        ds = init_ds(endtime=pd.Timestamp("2014-01-01T04:00"))
        client = make_client()
        xcorr_tpu.process(ds, client=client, verb=0)
        nc = str(tmp_path / "shard.nc")
        xcorr_tpu.write(ds, nc, verb=0)
        back = xcorr_tpu.read(nc, verb=1)
        assert back is not None
        np.testing.assert_allclose(back["cc"].values, ds["cc"].values)
        # full postprocess chain on the read-back dataset
        # (clip to slow celerities so the lag window stays inside +-100s)
        post = xcorr_tpu.postprocess(
            back, clim=(90_000.0, 2_000_000.0),
            filter_kwargs={"frequency": 0.5, "btype": "highpass",
                           "order": 2})
        assert "postprocess" in post["cc"].attrs
        assert post["cc"].attrs["unbiased"] == 1
        assert post.dims["lag"] < back.dims["lag"]

    def test_lazy_process_resume(self, tmp_path):
        root = str(tmp_path / "cc")
        times = pd.date_range("2014-01-01", "2014-01-03", freq="1D",
                              inclusive="left")
        init_args = dict(
            preprocess=PREPROCESS, attrs=ATTRS, sampling_rate=FS,
            window_length=WINDOW, window_overlap=0.5,
            clip_lag=(-100.0, 100.0), inventory=make_inventory())
        client = make_client()
        results = xcorr_tpu.lazy_process(
            [PAIR], times, init_args, client, inventory=make_inventory(),
            root=root, nworkers=2, verb=0)
        assert all(results)
        # shards exist on the year/pair tree
        f = xcorr_tpu.ncfile(PAIR, times[0], root)
        assert os.path.exists(f)
        ds = xcorr_tpu.read(f)
        assert (ds["status"].values == 1).all()
        # resume: all complete -> every task early-exits True
        results2 = xcorr_tpu.lazy_process(
            [PAIR], times, init_args, client, inventory=make_inventory(),
            root=root, nworkers=1, verb=0)
        assert all(results2)

    def test_lazy_device_tail_chunk_campaign_and_resume(self, tmp_path):
        """A device campaign whose last chunk is ragged (3 days,
        days_per_launch=2) completes through the canonical tail padding
        AND resumes correctly: a partial TAIL shard (the phantom-pad
        guards must decline the shifted work subset) reprocesses only
        its pending windows and matches the original data."""
        import h5py

        root = str(tmp_path / "cc")
        times = pd.date_range("2014-01-01", periods=3, freq="1D")
        init_args = dict(
            preprocess=PREPROCESS, attrs=ATTRS, sampling_rate=FS,
            window_length=WINDOW, window_overlap=0.5,
            clip_lag=(-100.0, 100.0), inventory=make_inventory())
        client = make_client()
        results = xcorr_tpu.lazy_process(
            [PAIR], times, init_args, client, inventory=make_inventory(),
            root=root, engine="device", days_per_launch=2, verb=0)
        assert all(results), results
        f_tail = xcorr_tpu.ncfile(PAIR, times[2], root)
        before = xcorr_tpu.read(f_tail)
        assert (before["status"].values == 1).all()
        cc_before = before["cc"].values.copy()
        # knock two tail windows back to pending
        with h5py.File(f_tail, "r+") as h:
            st = h["status"][...]
            st[0, 5:7] = 0
            h["status"][...] = st
        results = xcorr_tpu.lazy_process(
            [PAIR], times, init_args, client, inventory=make_inventory(),
            root=root, engine="device", days_per_launch=2, verb=0)
        assert all(results), results
        after = xcorr_tpu.read(f_tail)
        assert (after["status"].values == 1).all()
        np.testing.assert_allclose(after["cc"].values, cc_before,
                                   rtol=2e-6, atol=1e-7)

    def test_lazy_resume_partial_shard_keeps_data(self, tmp_path,
                                                  monkeypatch):
        """Resume of a PARTIAL shard must re-read real payloads: the
        header-only fast-exit (zero-placeholder cc) only applies to
        complete shards, and the re-written file keeps the already-
        processed windows' data."""
        import h5py
        from xcorr_tpu.io import netcdf as ncmod
        monkeypatch.setattr(ncmod, "_HEADER_ONLY_MAX_ELEMS", 8)
        root = str(tmp_path / "cc")
        times = pd.date_range("2014-01-01", periods=1, freq="1D")
        init_args = dict(
            preprocess=PREPROCESS, attrs=ATTRS, sampling_rate=FS,
            window_length=WINDOW, window_overlap=0.5,
            clip_lag=(-100.0, 100.0), inventory=make_inventory())
        client = make_client()
        assert all(xcorr_tpu.lazy_process(
            [PAIR], times, init_args, client, inventory=make_inventory(),
            root=root, nworkers=1, verb=0))
        f = xcorr_tpu.ncfile(PAIR, times[0], root)
        before = xcorr_tpu.read(f)
        cc_before = before["cc"].values.copy()
        # knock two windows back to "not validated" in the file
        with h5py.File(f, "r+") as h:
            st = h["status"][...]
            st[0, :2] = 0
            h["status"][...] = st
        # resume: partial shard -> full re-read -> reprocess -> rewrite
        assert all(xcorr_tpu.lazy_process(
            [PAIR], times, init_args, client, inventory=make_inventory(),
            root=root, nworkers=1, verb=0))
        after = xcorr_tpu.read(f)
        assert (after["status"].values == 1).all()
        # untouched windows kept their REAL data (not zero placeholders)
        np.testing.assert_allclose(after["cc"].values[0, 2:],
                                   cc_before[0, 2:], rtol=2e-6, atol=1e-7)
        assert np.abs(after["cc"].values[0, 2:]).max() > 0

    def test_postprocess_single_celerity_bound_km(self):
        """cmax alone must still convert km distances to meters for the
        lag clip (regression: the unit heuristic required BOTH bounds,
        silently clipping 1000x too tight)."""
        ds = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"))
        client = make_client()
        xcorr_tpu.process(ds, client=client, verb=0)
        assert ds["distance"].attrs.get("units") == "km"
        dist_m = float(ds["distance"].values.ravel()[0]) * 1000.0
        cmax = 2_000_000.0  # keeps dist/cmax (~4 s) inside the +-100 s lag
        post = xcorr_tpu.postprocess(
            ds, cmax=cmax,
            filter_kwargs={"frequency": 0.5, "btype": "highpass",
                           "order": 2})
        lag = post.coords["lag"].values
        want_min = dist_m / cmax
        assert lag.min() >= want_min - 0.5
        # and the clip actually engaged (old bug: lag_min ~ dist_km/cmax)
        assert lag.min() > 1.0

    def test_lazy_process_rt_substituted_pair(self, tmp_path):
        """A pair with a rotated (R) channel must survive the preprocess
        gate: verification/gating run on the UNSUBSTITUTED receiver (the
        ops-dict key ..BHR) while availability scans the raw 1/2/Z
        components (regression: gating on substituted names warned 'No
        preprocess operations' and gated every R/T pair out)."""
        pair = "IM.H03S1..EDH-IU.RAR.10.BHR"
        pre = {
            "EDH": PREPROCESS["EDH"],
            "BHR": [
                ("detrend", {"type": "demean"}),
                ("rotate", {"method": "->ZNE"}),
                ("rotate", {"method": "NE->RT", "back_azimuth": 250.3}),
                ("select", {"channel": "BHR"}),
                ("filter", {"type": "bandpass", "freqmin": 0.3,
                            "freqmax": 2.0}),
                ("taper", {"type": "cosine", "max_percentage": 0.05,
                           "max_length": 30.0}),
            ],
        }
        inv = Inventory([
            Channel("IM", "H03S1", "", "EDH",
                    latitude=-33.6, longitude=-78.8),
            Channel("IU", "RAR", "10", "BHR",
                    latitude=-21.2, longitude=-159.8),
            Channel("IU", "RAR", "10", "BH1",
                    latitude=-21.2, longitude=-159.8),
            Channel("IU", "RAR", "10", "BH2",
                    latitude=-21.2, longitude=-159.8),
            Channel("IU", "RAR", "10", "BHZ",
                    latitude=-21.2, longitude=-159.8),
        ])
        client = SyntheticClient(
            sampling_rate=FS,
            delays={"IM.H03S1..EDH": 0.0, "RAR": DELAY},
            source_period=600.0, source_amplitude=20.0)
        init_args = dict(
            preprocess=pre, attrs=ATTRS, sampling_rate=FS,
            window_length=WINDOW, window_overlap=0.5,
            clip_lag=(-100.0, 100.0), inventory=inv)
        times = pd.date_range("2014-01-01", periods=1, freq="1D")
        results = xcorr_tpu.lazy_process(
            [pair], times, init_args, client, inventory=inv,
            root=str(tmp_path / "cc"), nworkers=1, verb=0)
        assert results and all(results)
        ds = xcorr_tpu.read(
            xcorr_tpu.ncfile(pair, times[0], str(tmp_path / "cc")))
        assert (ds["status"].values == 1).all()

    def test_lazy_process_inventory_feeds_init(self, tmp_path):
        """The inventory passed to lazy_process must reach core.init
        even when init_args omits it — otherwise every shard's pair
        distance is silently 0 (review finding)."""
        root = str(tmp_path / "cc")
        times = pd.date_range("2014-01-01", periods=1, freq="1D")
        init_args = dict(
            preprocess=PREPROCESS, attrs=ATTRS, sampling_rate=FS,
            window_length=WINDOW, window_overlap=0.5,
            clip_lag=(-100.0, 100.0))  # NO inventory in init_args
        results = xcorr_tpu.lazy_process(
            [PAIR], times, init_args, make_client(),
            inventory=make_inventory(), root=root, nworkers=1, verb=0)
        assert all(results)
        ds = xcorr_tpu.read(xcorr_tpu.ncfile(PAIR, times[0], root))
        assert float(ds["distance"].values[0]) > 1000.0  # km, not 0

    def test_lazy_process_fails_fast_without_available_day(self,
                                                           tmp_path):
        """No fully-available day -> RuntimeError up front (like the
        reference), not a silent unvalidated campaign; a fully gated-out
        work list raises too instead of reporting '0 of 0' success."""
        root = str(tmp_path / "cc")
        times = pd.date_range("2014-01-01", periods=2, freq="1D")
        init_args = dict(
            preprocess=PREPROCESS, attrs=ATTRS, sampling_rate=FS,
            window_length=WINDOW, window_overlap=0.5,
            clip_lag=(-100.0, 100.0), inventory=make_inventory())
        client = make_client(missing={"IU.RAR.10.BHZ"})
        with pytest.raises(RuntimeError, match="availability"):
            xcorr_tpu.lazy_process(
                [PAIR], times, init_args, client,
                inventory=make_inventory(), root=root, verb=0)

    def test_lazy_device_bulk_write_isolation(self, tmp_path,
                                              monkeypatch):
        """One failed shard write in the bulk device path fails only
        its own (pair, day); chunk-mates stay True and written."""
        from xcorr_tpu.core import lazy as lazy_mod
        root = str(tmp_path / "cc")
        times = pd.date_range("2014-01-01", periods=2, freq="1D")
        init_args = dict(
            preprocess=PREPROCESS, attrs=ATTRS, sampling_rate=FS,
            window_length=WINDOW, window_overlap=0.5,
            clip_lag=(-100.0, 100.0), inventory=make_inventory())
        bad = xcorr_tpu.ncfile(PAIR, times[0], root)
        real_write = lazy_mod.write

        def flaky_write(data, nc, **kw):
            if nc == bad:
                raise OSError("disk full")
            return real_write(data, nc, **kw)

        monkeypatch.setattr(lazy_mod, "write", flaky_write)
        with pytest.warns(UserWarning, match="disk full"):
            results = xcorr_tpu.lazy_process(
                [PAIR], times, init_args, make_client(),
                inventory=make_inventory(), root=root, verb=0,
                engine="device", days_per_launch=2)
        assert results == [False, True]
        assert not os.path.exists(bad)
        ds = xcorr_tpu.read(xcorr_tpu.ncfile(PAIR, times[1], root))
        assert (ds["status"].values == 1).all()

    def test_merge_shards(self, tmp_path):
        root = str(tmp_path / "cc")
        times = pd.date_range("2014-01-01", "2014-01-03", freq="1D",
                              inclusive="left")
        init_args = dict(
            preprocess=PREPROCESS, attrs=ATTRS, sampling_rate=FS,
            window_length=WINDOW, window_overlap=0.5,
            clip_lag=(-100.0, 100.0), inventory=make_inventory())
        client = make_client()
        xcorr_tpu.lazy_process([PAIR], times, init_args, client,
                               inventory=make_inventory(), root=root,
                               nworkers=2, verb=0)
        files = [xcorr_tpu.ncfile(PAIR, t, root) for t in times]
        merged = xcorr_tpu.merge(files)
        assert merged.dims["pair"] == 1
        assert merged.dims["time"] == 2 * 48


class TestAccessor:
    def test_ds_xcorr_accessor(self):
        ds = init_ds()
        assert ds.xcorr.version == xcorr_tpu.__version__
        h = ds.xcorr.hash_metadata()
        assert h == ds.attrs["sha256_hash_metadata"]


class TestShardedEngine:
    def test_sharded_correlate_multi_device(self):
        import jax
        from xcorr_tpu.parallel import make_mesh, sharded_correlate
        assert len(jax.devices()) == 8  # virtual CPU mesh
        mesh = make_mesh(8)
        rng = np.random.default_rng(0)
        n = 1024
        sig = rng.normal(size=(12, n)).astype(np.float32)
        shifted = np.stack([np.roll(s, 5) for s in sig])
        out = sharded_correlate(shifted, sig, mesh=mesh,
                                index_min=n - 1 - 50, index_max=n - 1 + 50)
        assert out.shape == (12, 100)
        peaks = out.argmax(axis=-1) - 50
        assert (peaks == 5).all()

    def test_sharded_correlate_host_oracle(self):
        from xcorr_tpu.parallel import sharded_correlate
        rng = np.random.default_rng(1)
        x = rng.normal(size=(5, 512))  # 5 % 8 != 0: exercises padding
        y = rng.normal(size=(5, 512))
        out = sharded_correlate(x, y, index_min=411, index_max=611)
        assert out.shape == (5, 200)
        from xcorr_tpu.util import cc as cc_host
        want = cc_host.cc(x[0], y[0], unbiased=False)[411:611]
        np.testing.assert_allclose(out[0], want.astype(np.float32),
                                   atol=2e-5)


class TestDeviceEngine:
    def test_device_process_matches_host_process(self):
        """The device-preprocessed engine must reproduce core.process
        (host per-trace path) on the same synthetic data."""
        from xcorr_tpu.parallel import device_process

        ds_host = init_ds(endtime=pd.Timestamp("2014-01-01T03:00"))
        ds_dev = init_ds(endtime=pd.Timestamp("2014-01-01T03:00"))
        client = make_client()
        xcorr_tpu.process(ds_host, client=client, verb=0)
        device_process(ds_dev, client=make_client(), verb=0)

        assert (ds_dev["status"].values == 1).all()
        np.testing.assert_array_equal(ds_dev["pair_offset"].values,
                                      ds_host["pair_offset"].values)
        np.testing.assert_array_equal(ds_dev["time_offset"].values,
                                      ds_host["time_offset"].values)
        # same windows, same ops -> same CCFs to f32 tolerance
        np.testing.assert_allclose(ds_dev["cc"].values,
                                   ds_host["cc"].values,
                                   atol=5e-6)

    def test_device_process_multi_pair(self):
        """Multi-pair datasets: pairs with a common chain/geometry batch
        into one device launch; results match the host path per pair."""
        from xcorr_tpu import ndlabel
        from xcorr_tpu.parallel import device_process

        delays = {"IM.H03S1..EDH": 0.0, "IM.H03S2..EDH": 4.0,
                  "IM.H03S3..EDH": 9.0}

        def client():
            return SyntheticClient(sampling_rate=FS, delays=delays,
                                   source_period=600.0,
                                   source_amplitude=20.0)

        inv = Inventory([
            Channel("IM", "H03S1", "", "EDH",
                    latitude=-33.6, longitude=-78.8),
            Channel("IM", "H03S2", "", "EDH",
                    latitude=-33.7, longitude=-78.9),
            Channel("IM", "H03S3", "", "EDH",
                    latitude=-33.8, longitude=-79.0),
        ])
        pairs = ["IM.H03S1..EDH-IM.H03S2..EDH",
                 "IM.H03S1..EDH-IM.H03S3..EDH"]

        def make(pair):
            return init_ds(pair=pair, inventory=inv,
                           endtime=pd.Timestamp("2014-01-01T03:00"))

        ds_host = ndlabel.concat([make(p) for p in pairs], "pair")
        ds_dev = ndlabel.concat([make(p) for p in pairs], "pair")
        assert ds_dev["status"].shape[0] == 2

        xcorr_tpu.process(ds_host, client=client(), verb=0)
        device_process(ds_dev, client=client(), verb=0)

        assert (ds_dev["status"].values == 1).all()
        np.testing.assert_array_equal(ds_dev["pair_offset"].values,
                                      ds_host["pair_offset"].values)
        np.testing.assert_array_equal(ds_dev["time_offset"].values,
                                      ds_host["time_offset"].values)
        np.testing.assert_allclose(ds_dev["cc"].values,
                                   ds_host["cc"].values, atol=5e-6)
        # injected delays recovered per pair
        lagv = ds_dev.coords["lag"].values
        for ipair, delay in [(0, -4.0), (1, -9.0)]:
            peak = lagv[int(np.argmax(ds_dev["cc"].values[ipair, 0]))]
            assert abs(peak - delay) < 1.0

    def test_device_process_shared_receiver_fetch_dedup(self):
        """Pairs sharing a receiver fetch each archive span ONCE per
        bulk call and pool it into a single device span row (the
        engine's per-bulk fetch/span caches)."""
        from xcorr_tpu import ndlabel
        from xcorr_tpu.parallel import device_process

        delays = {"IM.H03S1..EDH": 0.0, "IM.H03S2..EDH": 4.0,
                  "IM.H03S3..EDH": 9.0}
        counts = {}

        class CountingClient(SyntheticClient):
            def get_waveforms(self, receiver=None, **kw):
                counts[receiver] = counts.get(receiver, 0) + 1
                return super().get_waveforms(receiver=receiver, **kw)

        client = CountingClient(sampling_rate=FS, delays=delays,
                                source_period=600.0,
                                source_amplitude=20.0)
        inv = Inventory([
            Channel("IM", "H03S1", "", "EDH",
                    latitude=-33.6, longitude=-78.8),
            Channel("IM", "H03S2", "", "EDH",
                    latitude=-33.7, longitude=-78.9),
            Channel("IM", "H03S3", "", "EDH",
                    latitude=-33.8, longitude=-79.0),
        ])
        pairs = ["IM.H03S1..EDH-IM.H03S2..EDH",
                 "IM.H03S1..EDH-IM.H03S3..EDH"]
        ds = ndlabel.concat(
            [init_ds(pair=p, inventory=inv,
                     endtime=pd.Timestamp("2014-01-01T03:00"))
             for p in pairs], "pair")
        device_process(ds, client=client, verb=0)
        assert (ds["status"].values == 1).all()
        # H03S1 is in both pairs but its span is fetched exactly once
        assert counts == {"IM.H03S1..EDH": 1, "IM.H03S2..EDH": 1,
                          "IM.H03S3..EDH": 1}, counts

    def test_device_process_owner_fetch_failure_isolated(self):
        """A transient archive error on a SHARED receiver fails only the
        pair whose prepare owned the fetch: later pairs see the failed
        cache entry, refetch independently (the waiter-refetch path),
        and complete with correct CCFs. Regression cover for the span
        cache holding refetched traces alive (engine.canonicalize)."""
        from xcorr_tpu import ndlabel
        from xcorr_tpu.parallel import device_process

        delays = {"IM.H03S1..EDH": 0.0, "IM.H03S2..EDH": 4.0,
                  "IM.H03S3..EDH": 9.0}
        counts = {}

        class FlakyClient(SyntheticClient):
            def get_waveforms(self, receiver=None, **kw):
                counts[receiver] = counts.get(receiver, 0) + 1
                if receiver == "IM.H03S1..EDH" and counts[receiver] == 1:
                    raise OSError("transient archive error")
                return super().get_waveforms(receiver=receiver, **kw)

        client = FlakyClient(sampling_rate=FS, delays=delays,
                             source_period=600.0, source_amplitude=20.0)
        inv = Inventory([
            Channel("IM", "H03S1", "", "EDH",
                    latitude=-33.6, longitude=-78.8),
            Channel("IM", "H03S2", "", "EDH",
                    latitude=-33.7, longitude=-78.9),
            Channel("IM", "H03S3", "", "EDH",
                    latitude=-33.8, longitude=-79.0),
        ])
        pairs = ["IM.H03S1..EDH-IM.H03S2..EDH",
                 "IM.H03S1..EDH-IM.H03S3..EDH"]
        ds = ndlabel.concat(
            [init_ds(pair=p, inventory=inv,
                     endtime=pd.Timestamp("2014-01-01T03:00"))
             for p in pairs], "pair")
        with pytest.warns(UserWarning, match="transient archive error"):
            # serial prepare: pair 0 owns (and fails) the shared fetch
            device_process(ds, client=client, verb=0, fetch_workers=1)
        status = ds["status"].values
        assert (status[0] == -1).all(), status  # owner pair flagged
        assert (status[1] == 1).all(), status   # waiter pair completed
        # the shared receiver was refetched once by the waiter
        assert counts["IM.H03S1..EDH"] == 2, counts
        # and the waiter's CCF is the real data, not a stale alias
        lagv = ds.coords["lag"].values
        peak = lagv[int(np.argmax(ds["cc"].values[1, 0]))]
        assert abs(peak - (-9.0)) < 1.0, peak

    def test_device_bulk_union_span_fetch(self):
        """Multi-day bulk calls fetch ONE union span per receiver (the
        consecutive days' task spans overlap ~50%) and the results
        match the per-day host path."""
        from xcorr_tpu.parallel.engine import device_process_bulk

        counts = {}

        class CountingClient(SyntheticClient):
            def get_waveforms(self, receiver=None, **kw):
                counts[receiver] = counts.get(receiver, 0) + 1
                return super().get_waveforms(receiver=receiver, **kw)

        def client(cls=SyntheticClient):
            return cls(sampling_rate=FS,
                       delays={"IM.H03S1..EDH": 0.0,
                               "IU.RAR.10.BHZ": DELAY},
                       source_period=600.0, source_amplitude=20.0)

        # ADJACENT blocks: their task spans overlap, so the union guard
        # (union shorter than the per-task fetches it replaces) engages
        # — as it does for consecutive full days at production scale
        def make_days():
            return [init_ds(starttime=pd.Timestamp("2014-01-01"),
                            endtime=pd.Timestamp("2014-01-01T02:00")),
                    init_ds(starttime=pd.Timestamp("2014-01-01T02:00"),
                            endtime=pd.Timestamp("2014-01-01T04:00"))]

        dev = make_days()
        finalize, fb = device_process_bulk(dev, client(CountingClient),
                                           verb=0)
        assert not fb
        finalize()
        # one UNION fetch per receiver covering both days
        assert counts == {"IM.H03S1..EDH": 1, "IU.RAR.10.BHZ": 1}, counts

        host = make_days()
        for d in host:
            xcorr_tpu.process(d, client=client(), verb=0)
        for d_dev, d_host in zip(dev, host):
            assert (d_dev["status"].values == 1).all()
            np.testing.assert_allclose(d_dev["cc"].values,
                                       d_host["cc"].values, atol=5e-6)

    def test_device_bulk_archive_jitter_canonical_shapes(self):
        """A day whose archive data starts late must NOT change the
        compiled executable shapes (offsets/span lengths align to the
        REQUESTED fetch grid, not the returned trace), and windows
        overlapping the gap are flagged missing instead of correlating
        zero-fill."""
        from xcorr_tpu.parallel import device_process
        from xcorr_tpu.parallel.engine import _pipeline_cache

        JIT = 30.0  # seconds of jitter on receiver A's span head

        def jitter_client(mode):
            class JitterClient(SyntheticClient):
                def get_waveforms(self, receiver=None, **kw):
                    st = super().get_waveforms(receiver=receiver, **kw)
                    if receiver == "IM.H03S1..EDH":
                        for tr in st:
                            n = int(round(JIT * tr.stats.sampling_rate))
                            if mode == "extend":
                                # archive returned MORE than requested
                                tr.data = np.concatenate(
                                    [np.zeros(n, tr.data.dtype), tr.data])
                                tr.stats.starttime = \
                                    tr.stats.starttime - JIT
                            else:  # "trim": data starts late
                                tr.data = tr.data[n:]
                                tr.stats.starttime = \
                                    tr.stats.starttime + JIT
                            tr.stats.npts = tr.data.size
                    return st
            return JitterClient(
                sampling_rate=FS,
                delays={"IM.H03S1..EDH": 0.0, "IU.RAR.10.BHZ": DELAY},
                source_period=600.0, source_amplitude=20.0)

        ds_clean = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"))
        device_process(ds_clean, client=make_client(), verb=0)
        assert (ds_clean["status"].values == 1).all()
        keys_before = set(_pipeline_cache)

        # an over-long trace is pure jitter: every window stays valid,
        # NO new executable compiles, results identical to the clean run
        ds_ext = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"))
        device_process(ds_ext, client=jitter_client("extend"), verb=0)
        assert set(_pipeline_cache) == keys_before
        assert (ds_ext["status"].values == 1).all()
        np.testing.assert_allclose(ds_ext["cc"].values,
                                   ds_clean["cc"].values, atol=5e-6)

        # a late-starting trace flags the clipped window missing instead
        # of correlating zero-fill; later windows match the clean run
        ds_jit = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"))
        device_process(ds_jit, client=jitter_client("trim"), verb=0)
        stat = ds_jit["status"].values[0]
        assert stat[0] == -1 and (stat[1:] == 1).all(), stat
        np.testing.assert_allclose(ds_jit["cc"].values[0, 1:],
                                   ds_clean["cc"].values[0, 1:],
                                   atol=5e-6)

    def test_device_bulk_ragged_tail_reuses_executables(self):
        """A tail chunk with fewer day-tasks than the campaign's
        chunking policy must compile ZERO new executables: the union
        grid pads to the canonical full-chunk geometry (the archive
        fetch still covers only the real days) and phantom day-tasks
        complete the launch packing so the offset tuples — and the
        compiled pipelines — repeat (engine._phantom_pad)."""
        from xcorr_tpu.parallel.engine import (_pipeline_cache,
                                               device_process_bulk)

        STRIDE = 7200.0  # adjacent 2h blocks (union guard engages)
        # a clip_lag no other test uses: executable reuse must come
        # from THIS test's full-chunk run, not a cross-test alias
        CLIP = (-83.0, 83.0)

        def blocks(n):
            t0 = pd.Timestamp("2014-01-01")
            return [init_ds(
                starttime=t0 + pd.Timedelta(seconds=STRIDE * i),
                endtime=t0 + pd.Timedelta(seconds=STRIDE * (i + 1)),
                clip_lag=CLIP) for i in range(n)]

        full = blocks(2)
        fin, fb = device_process_bulk(
            full, make_client(), canonical_days=2,
            canonical_stride_s=STRIDE, verb=0)
        assert not fb
        fin()
        assert all((d["status"].values == 1).all() for d in full)
        keys = set(_pipeline_cache)

        # the tail chunk (1 of 2 canonical day-tasks) reuses the full
        # chunk's executables — and its fetch covers only the real day
        fetched = []

        class SpanRecorder(SyntheticClient):
            def get_waveforms(self, duration=None, **kw):
                fetched.append(duration)
                return super().get_waveforms(duration=duration, **kw)

        tail = blocks(1)
        client = SpanRecorder(
            sampling_rate=FS,
            delays={"IM.H03S1..EDH": 0.0, "IU.RAR.10.BHZ": DELAY},
            source_period=600.0, source_amplitude=20.0)
        fin, fb = device_process_bulk(
            tail, client, canonical_days=2, canonical_stride_s=STRIDE,
            verb=0)
        assert not fb
        fin()
        assert set(_pipeline_cache) == keys, \
            "tail chunk compiled new executables"
        assert (tail[0]["status"].values == 1).all()
        # archive requests stayed at the single-task span (the grid
        # padding is zero-fill, not a phantom-day fetch)
        assert fetched and max(fetched) < STRIDE + 2 * WINDOW, fetched
        # day-0 windows are computed by the same executable on the same
        # inputs in both runs
        np.testing.assert_allclose(tail[0]["cc"].values,
                                   full[0]["cc"].values,
                                   rtol=2e-6, atol=1e-7)

    def test_canonical_prefix_gate(self):
        """Union-grid extension engages only for canonical-chunk
        prefixes: uniform-stride, equal-length spans; sparse resumes
        and mixed cadences stay on the raw union grid (advisor r4)."""
        from xcorr_tpu.parallel.engine import _canonical_prefix
        H = int(3600e9)
        day = lambda i: (i * H, i * H + 2 * H)  # 2h spans, 1h stride
        # contiguous prefix (1..canonical_days spans) -> extend
        assert _canonical_prefix({day(0)}, 4, 3600.0)
        assert _canonical_prefix({day(0), day(1), day(2)}, 4, 3600.0)
        assert _canonical_prefix({day(0), day(1), day(2), day(3)},
                                 4, 3600.0)
        # sparse resume (gap of 2 strides) -> raw grid
        assert not _canonical_prefix({day(0), day(2)}, 4, 3600.0)
        # unequal span lengths -> raw grid
        assert not _canonical_prefix({day(0), (H, H + 3 * H)}, 4, 3600.0)
        # more spans than the canonical chunk -> raw grid
        assert not _canonical_prefix({day(i) for i in range(5)},
                                     4, 3600.0)

    def test_lazy_modal_stride_irregular_cadence(self):
        """lazy_process on a mostly-weekly + one-daily campaign infers
        the MODAL stride, not the minimum (advisor r4): the campaign
        still completes with correct status."""
        import xcorr_tpu
        times = pd.DatetimeIndex(
            [pd.Timestamp("2014-01-01"), pd.Timestamp("2014-01-08"),
             pd.Timestamp("2014-01-15"), pd.Timestamp("2014-01-16")])
        import tempfile
        with tempfile.TemporaryDirectory() as root:
            res = xcorr_tpu.lazy_process(
                [PAIR], times,
                dict(preprocess=PREPROCESS, attrs=ATTRS,
                     sampling_rate=FS, window_length=WINDOW,
                     window_overlap=0.5, clip_lag=(-100.0, 100.0),
                     inventory=make_inventory()),
                make_client(), inventory=make_inventory(), root=root,
                verb=0, engine="device", days_per_launch=3)
            assert len(res) == 4 and all(res)

    def test_phantom_pad_guards(self):
        """_phantom_pad is all-or-nothing and strictly guarded: only
        day-periodic groups on shared span arrays with room in the
        canonical grid get phantoms; anything else stays untouched."""
        from xcorr_tpu.parallel.engine import _phantom_pad

        fs, stride = 5.0, 7200.0
        sa = int(stride * fs)
        da = np.zeros(4 * sa, np.float32)
        db = np.zeros(4 * sa, np.float32)

        def task(day, data_a=da, data_b=db, need=4 * sa):
            offs = {k: day * sa + k * 100 for k in range(3)}
            return {"good": [0, 1, 2], "rel_a": dict(offs),
                    "rel_b": dict(offs), "fs_a": fs, "fs_b": fs,
                    "npts_raw_a": 500, "npts_raw_b": 500,
                    "need_a": need, "need_b": need,
                    "data_a": data_a, "data_b": data_b}

        # periodic 2-task group, canonical 4: pads 2 phantoms with
        # day-shifted offsets
        g = [task(0), task(1)]
        _phantom_pad(g, 4, stride)
        assert len(g) == 4
        assert all(t.get("phantom") for t in g[2:])
        assert sorted(g[2]["rel_a"].values()) == \
            [v + sa for v in sorted(g[1]["rel_a"].values())]

        # full group: no-op
        g = [task(0), task(1)]
        _phantom_pad(g, 2, stride)
        assert len(g) == 2

        # different span arrays (mixed pairs): untouched
        other = np.zeros(4 * sa, np.float32)
        g = [task(0), task(1, data_a=other)]
        _phantom_pad(g, 4, stride)
        assert len(g) == 2

        # non-periodic offsets (sparse resume): untouched
        g = [task(0), task(2)]
        _phantom_pad(g, 4, stride)
        assert len(g) == 2

        # no room in the grid (union not canonically extended):
        # all-or-nothing — zero phantoms, not a partial pad
        g = [task(0), task(1, need=2 * sa + 600)]
        # make BOTH tasks share the short grid so periodicity holds
        g[0]["need_a"] = g[0]["need_b"] = 2 * sa + 600
        _phantom_pad(g, 4, stride)
        assert len(g) == 2

    def test_device_process_wire_packed(self, monkeypatch):
        """With the int16 wire codec forced on, the engine's readback
        decodes into CCFs within the codec's quantization bound of the
        unpacked run (normalized |cc| <= 1 -> atol ~1.6e-5)."""
        from xcorr_tpu import util
        from xcorr_tpu.parallel import device_process

        ds_ref = init_ds(endtime=pd.Timestamp("2014-01-01T03:00"))
        device_process(ds_ref, client=make_client(), verb=0)

        monkeypatch.setenv("XCORR_WIRE_PACK", "1")
        monkeypatch.setattr(util.xfer, "_PACK_MIN_BYTES", 0)
        ds = init_ds(endtime=pd.Timestamp("2014-01-01T03:00"))
        device_process(ds, client=make_client(), verb=0)

        assert (ds["status"].values == 1).all()
        np.testing.assert_allclose(ds["cc"].values, ds_ref["cc"].values,
                                   atol=2e-5)

    def test_device_process_trim_position_parity(self):
        """Production-shaped chains carry an explicit mid-chain 'trim'
        followed by detrend+taper; the device path must trim at that
        position (so the trailing ops act on the FINAL window) and
        match the host path — regression for the review finding where
        the end-trim sliced the taper ramps off."""
        from xcorr_tpu import ndlabel
        from xcorr_tpu.parallel import device_process

        pre = {
            "EDH": [
                ("filter", {"type": "bandpass", "freqmin": 0.3,
                            "freqmax": 2.0}),
                ("trim", {}),
                ("detrend", {"type": "demean"}),
                ("taper", {"type": "cosine", "max_percentage": 0.05,
                           "max_length": 30.0}),
            ],
            "BHZ": [
                ("filter", {"type": "bandpass", "freqmin": 0.3,
                            "freqmax": 2.0}),
                ("trim", {}),
                ("detrend", {"type": "demean"}),
                ("taper", {"type": "cosine", "max_percentage": 0.05,
                           "max_length": 30.0}),
            ],
        }
        ds_host = init_ds(preprocess=pre,
                          endtime=pd.Timestamp("2014-01-01T03:00"))
        ds_dev = init_ds(preprocess=pre,
                         endtime=pd.Timestamp("2014-01-01T03:00"))
        xcorr_tpu.process(ds_host, client=make_client(), verb=0)
        device_process(ds_dev, client=make_client(), verb=0)
        assert (ds_dev["status"].values == 1).all()
        assert (ds_host["status"].values == 1).all()
        np.testing.assert_allclose(ds_dev["cc"].values,
                                   ds_host["cc"].values, atol=5e-6)

    def test_device_process_missing_data(self):
        from xcorr_tpu.parallel import device_process
        ds = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"))
        client = make_client(missing={"IU.RAR.10.BHZ"})
        device_process(ds, client=client, verb=0)
        assert (ds["status"].values == -1).all()

    def test_device_process_error_isolation(self):
        """A client that RAISES (not merely returns empty) for one pair
        must fail only that pair's windows: the other pair in the same
        bulk launch completes (per-(pair,day) error isolation, like the
        reference's per-task dask boundary)."""
        from xcorr_tpu.parallel.engine import device_process_bulk

        class RaisingClient(SyntheticClient):
            def get_waveforms(self, receiver=None, **kw):
                if receiver == "IM.H03S2..EDH":
                    raise OSError("corrupt archive day")
                return super().get_waveforms(receiver=receiver, **kw)

        client = RaisingClient(
            sampling_rate=FS,
            delays={"IM.H03S1..EDH": 0.0, "IU.RAR.10.BHZ": DELAY},
            source_period=600.0, source_amplitude=20.0)
        inv = Inventory(make_inventory().channels + [
            Channel("IM", "H03S2", "", "EDH",
                    latitude=-33.7, longitude=-78.9)])
        ds_ok = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"),
                        inventory=inv)
        ds_bad = init_ds(pair="IM.H03S1..EDH-IM.H03S2..EDH",
                         endtime=pd.Timestamp("2014-01-01T02:00"),
                         inventory=inv)
        with pytest.warns(UserWarning, match="prepare failed"):
            finalize, fallback = device_process_bulk(
                [ds_ok, ds_bad], client, verb=0)
            finalize()
        assert not fallback
        assert (ds_ok["status"].values == 1).all()
        assert (ds_bad["status"].values == -1).all()

    def test_device_process_on_mesh(self):
        """device_process shards the window stack over the CPU mesh."""
        import jax
        from xcorr_tpu.parallel import device_process, make_mesh
        assert len(jax.devices()) == 8
        # 1h windows at 50% overlap over 4h -> 8 windows = 8 devices
        ds = init_ds(endtime=pd.Timestamp("2014-01-01T04:00"))
        device_process(ds, client=make_client(), mesh=make_mesh(8),
                       verb=0)
        assert (ds["status"].values == 1).all()
        lagv = ds.coords["lag"].values
        peak = lagv[int(np.argmax(ds["cc"].values[0, 0]))]
        assert abs(peak - (-DELAY)) < 1.0

    def test_device_process_stage_timer(self, capsys):
        """timer= accumulates fetch/pipeline/device/bookkeeping stages;
        verb>=2 with no timer prints a local report."""
        from xcorr_tpu.parallel import device_process
        from xcorr_tpu.util.profiler import StageTimer

        timer = StageTimer()
        ds = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"))
        device_process(ds, client=make_client(), verb=0, timer=timer)
        stages = timer.stages
        for stage in ("fetch-archive", "pipeline-build",
                      "device-dispatch", "device-readback",
                      "bookkeeping"):
            assert stage in stages and stages[stage] >= 0.0
        d = timer.as_dict()
        assert d["device-dispatch"]["items"] > 0
        assert "GB" in d["device-dispatch"]  # span bytes were counted
        # thread-CPU seconds accompany wall (contention diagnostics):
        # cpu <= wall + epsilon for any single-threaded stage
        for stage in ("fetch-archive", "device-dispatch"):
            assert 0.0 <= d[stage]["cpu_s"] <= d[stage]["wall_s"] + 0.05
        # drain-tail support: last_end is a perf_counter stamp in the
        # past for every recorded stage
        import time as _time
        assert timer.last_end("device-readback") is not None
        assert timer.last_end("device-readback") <= _time.perf_counter()
        assert timer.last_end("never-ran") is None

        ds2 = init_ds(endtime=pd.Timestamp("2014-01-01T02:00"))
        device_process(ds2, client=make_client(), verb=2)
        out = capsys.readouterr().out
        assert "Stage timings" in out and "device" in out

    def test_device_process_response_epoch_split(self):
        """A mid-day instrument swap (two inventory epochs with
        different sensitivities) must deconvolve each window with ITS
        epoch's response — the span splits into per-epoch device tasks
        matching the host path (spec: xcorr/util/receiver.py:261-323
        epoch filtering)."""
        from xcorr_tpu.parallel import device_process
        from xcorr_tpu.stream import Channel, Inventory
        from xcorr_tpu.stream.inventory import PAZResponse

        swap = pd.Timestamp("2014-01-01T02:00")
        # shape-CHANGING responses (different poles), so a wrong epoch
        # visibly distorts the deconvolved waveform (a pure sensitivity
        # change would cancel in the normalized CC)
        resp1 = PAZResponse(poles=[-0.2 + 0.2j, -0.2 - 0.2j],
                            zeros=[0.0j, 0.0j], gain=1.0, sensitivity=2.0)
        resp2 = PAZResponse(poles=[-1.5 + 1.5j, -1.5 - 1.5j],
                            zeros=[0.0j, 0.0j], gain=1.0, sensitivity=8.0)

        def make_inv(swapped):
            ch = [Channel("IU", "RAR", "10", "BHZ", latitude=-21.2,
                          longitude=-159.8, response=resp1)]
            if swapped:
                ch += [Channel("IM", "H03S1", "", "EDH", latitude=-33.6,
                               longitude=-78.8, endtime=swap,
                               response=resp1),
                       Channel("IM", "H03S1", "", "EDH", latitude=-33.6,
                               longitude=-78.8, starttime=swap,
                               response=resp2)]
            else:
                ch += [Channel("IM", "H03S1", "", "EDH", latitude=-33.6,
                               longitude=-78.8, response=resp1)]
            return Inventory(ch)

        def single_epoch_inv(resp):
            return Inventory([
                Channel("IU", "RAR", "10", "BHZ", latitude=-21.2,
                        longitude=-159.8, response=resp1),
                Channel("IM", "H03S1", "", "EDH", latitude=-33.6,
                        longitude=-78.8, response=resp),
            ])

        pre = {cha: chain + [("remove_response", {"water_level": 60.0})]
               for cha, chain in PREPROCESS.items()}
        inv = make_inv(swapped=True)

        def run(inventory):
            ds = init_ds(preprocess=pre, inventory=inventory,
                         endtime=pd.Timestamp("2014-01-01T04:00"))
            device_process(ds, client=make_client(),
                           inventory=inventory, verb=0)
            assert (ds["status"].values == 1).all()
            return ds

        ds_dev = run(inv)
        # per-window truth: each epoch's windows must equal a run whose
        # inventory holds ONLY that epoch's response
        ds_r1 = run(single_epoch_inv(resp1))
        ds_r2 = run(single_epoch_inv(resp2))
        times = pd.DatetimeIndex(ds_dev.coords["time"].values)
        post = np.nonzero(times > swap)[0]
        pre_i = np.nonzero(times <= swap)[0]
        assert post.size and pre_i.size
        np.testing.assert_allclose(ds_dev["cc"].values[0, pre_i],
                                   ds_r1["cc"].values[0, pre_i],
                                   atol=1e-7)
        np.testing.assert_allclose(ds_dev["cc"].values[0, post],
                                   ds_r2["cc"].values[0, post],
                                   atol=1e-7)
        # discrimination: the two epochs' responses genuinely differ
        # (old behavior deconvolved post-swap windows with resp1)
        diff = np.abs(ds_r1["cc"].values[0, post]
                      - ds_r2["cc"].values[0, post]).max()
        assert diff > 1e-4, f"epoch swap had no effect (diff={diff})"

    def test_device_process_bulk_multi_day(self):
        """Several days batch into shared launches; results match the
        per-day path and finalize() scatters into every dataset."""
        from xcorr_tpu.parallel import device_process
        from xcorr_tpu.parallel.engine import device_process_bulk

        def make(day):
            t0 = pd.Timestamp(f"2014-01-0{day}")
            return init_ds(starttime=t0,
                           endtime=t0 + pd.Timedelta("2h"))

        bulk = [make(1), make(2)]
        finalize, fallback = device_process_bulk(
            bulk, make_client(), verb=0)
        assert fallback == []
        # launch is async: statuses scatter only at finalize()
        finalize()
        for ds in bulk:
            assert (ds["status"].values == 1).all()

        for day, ds in enumerate(bulk, start=1):
            ref = make(day)
            device_process(ref, client=make_client(), verb=0)
            np.testing.assert_allclose(ds["cc"].values, ref["cc"].values,
                                       rtol=0, atol=1e-7)
            np.testing.assert_array_equal(ds["time_offset"].values,
                                          ref["time_offset"].values)

    def test_device_process_bulk_threaded_prepare(self):
        """fetch_workers > 1 routes span prep through a thread pool:
        results must match the serial path and the prep CPU must land
        in the timer's "prepare-worker" stage (main-thread "prepare"
        only waits there, so without the worker-side stage the pcie
        host-CPU projection undercounts on multi-core hosts)."""
        from xcorr_tpu.parallel.engine import device_process_bulk
        from xcorr_tpu.util.profiler import StageTimer

        def make(day):
            t0 = pd.Timestamp(f"2014-01-0{day}")
            return init_ds(starttime=t0,
                           endtime=t0 + pd.Timedelta("2h"))

        timer = StageTimer()
        bulk = [make(1), make(2)]
        finalize, fallback = device_process_bulk(
            bulk, make_client(), verb=0, fetch_workers=2, timer=timer)
        assert fallback == []
        finalize()
        stages = timer.as_dict()
        assert stages["prepare-worker"]["calls"] == 2
        assert stages["prepare-worker"]["cpu_s"] >= 0.0

        serial = [make(1), make(2)]
        fin2, _ = device_process_bulk(serial, make_client(), verb=0,
                                      fetch_workers=1)
        fin2()
        for got, ref in zip(bulk, serial):
            np.testing.assert_allclose(got["cc"].values,
                                       ref["cc"].values, rtol=0, atol=0)

    def test_pipeline_executable_reused_across_days(self):
        """Different days (different window offsets) must reuse ONE
        compiled pipeline — offsets are traced arrays, not baked
        constants (the round-2 cross-process cache-miss fix)."""
        from xcorr_tpu.parallel import device_process
        from xcorr_tpu.parallel.engine import _pipeline_cache

        def run(day):
            t0 = pd.Timestamp(f"2014-02-0{day}T00:30")
            ds = init_ds(starttime=t0, endtime=t0 + pd.Timedelta("2h"))
            device_process(ds, client=make_client(), verb=0)
            assert (ds["status"].values == 1).all()

        run(1)
        before = set(_pipeline_cache)
        run(2)  # same geometry, different window offsets
        new = set(_pipeline_cache) - before
        assert not new, f"day 2 should reuse day 1's pipeline, got {new}"

    def test_lazy_device_bulk(self, tmp_path):
        """lazy_process(engine='device') multi-day chunked path: shards
        written via the writer thread, resume intact."""
        root = str(tmp_path / "cc")
        times = pd.date_range("2014-01-01", periods=3, freq="1D")
        init_args = dict(
            preprocess=PREPROCESS, attrs=ATTRS, sampling_rate=FS,
            window_length=WINDOW, window_overlap=0.5,
            clip_lag=(-100.0, 100.0), inventory=make_inventory())
        results = xcorr_tpu.lazy_process(
            [PAIR], times, init_args, make_client(),
            inventory=make_inventory(), root=root, verb=0,
            engine="device", days_per_launch=2)
        assert results == [True, True, True]
        for t in times:
            ds = xcorr_tpu.read(xcorr_tpu.ncfile(PAIR, t, root))
            assert (ds["status"].values == 1).all()
            lagv = ds.coords["lag"].values
            peak = lagv[int(np.argmax(ds["cc"].values[0, 0]))]
            assert abs(peak - (-DELAY)) < 1.0
        # resume: everything complete already
        results2 = xcorr_tpu.lazy_process(
            [PAIR], times, init_args, make_client(),
            inventory=make_inventory(), root=root, verb=0,
            engine="device", days_per_launch=2)
        assert results2 == [True, True, True]

    def test_persistent_cache_hits_across_processes(self, tmp_path):
        """Two separate processes, two different DAYS, one shared
        persistent compile cache: process 2 must add ZERO new cache
        entries — the canonical-offset spans make every day's pipeline
        HLO byte-identical, so the persistent cache key repeats across
        days and processes (round-2 VERDICT item 3)."""
        import json
        import subprocess
        import sys

        cache = str(tmp_path / "jax_cache")
        probe = os.path.join(os.path.dirname(__file__), "_cache_probe.py")

        def run(day):
            out = subprocess.run(
                [sys.executable, probe, cache, str(day)],
                capture_output=True, text=True, timeout=600)
            assert out.returncode == 0, out.stderr[-2000:]
            return json.loads(out.stdout.strip().splitlines()[-1])

        r1 = run(1)
        assert r1["ok"]
        assert r1["n_cache"] > 0, "process 1 populated no cache entries"
        r2 = run(2)  # different window offsets, same canonical geometry
        assert r2["ok"]
        assert r2["n_cache"] == r1["n_cache"], (
            f"process 2 added {r2['n_cache'] - r1['n_cache']} new cache "
            "entries; pipeline HLO is not process/day-stable")
