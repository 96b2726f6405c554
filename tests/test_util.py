"""Tests for util: hashing, history, time, geodesy, receivers, cc math."""
import numpy as np
import pandas as pd
import pytest

from xcorr_tpu import util
from xcorr_tpu.ndlabel import DataArray, Dataset
from xcorr_tpu.stream import Trace, Stream, Stats, UTCDateTime


class TestHasher:
    def test_hash_obj_stable(self):
        a = {"b": 1, "a": [1, 2], "sha256_hash": "ignored"}
        b = {"a": [1, 2], "b": 1}
        assert util.hash_obj(a) == util.hash_obj(b)
        assert len(util.hash_obj(a)) == 64

    def test_hash_dataarray_metadata_vs_data(self):
        da = DataArray(np.arange(4.0), dims=("lag",), name="cc",
                       attrs={"units": "-"})
        h_meta = util.hash_DataArray(da, metadata_only=True)
        da2 = da.copy()
        da2.data[0] = 99.0
        assert util.hash_DataArray(da2, metadata_only=True) == h_meta
        assert util.hash_DataArray(da2, metadata_only=False) != \
            util.hash_DataArray(da, metadata_only=False)
        # scale/offset attrs are excluded from hashing
        da3 = da.copy()
        da3.attrs["add_offset"] = 5.0
        assert util.hash_DataArray(da3, metadata_only=True) == h_meta

    def test_hash_dataset_order_independent(self):
        def mk(order):
            ds = Dataset()
            ds.coords["lag"] = np.arange(3.0)
            for name in order:
                ds[name] = (("lag",), np.zeros(3))
            return ds

        assert util.hash_Dataset(mk(["a", "b"])) == \
            util.hash_Dataset(mk(["b", "a"]))

    def test_hash_trace_and_stream(self):
        tr = Trace(np.arange(10, dtype=np.float32), Stats(
            network="IU", station="RAR", location="10", channel="BHZ",
            starttime="2014-01-01", sampling_rate=20.0))
        h1 = util.hash_Trace(tr)
        assert len(h1) == 64
        tr2 = tr.copy()
        tr2.data[3] = -1
        assert util.hash_Trace(tr2) != h1
        # single-trace stream hash == trace hash (same chained updates,
        # matching reference xcorr/util/hasher.py:184-215 semantics)
        assert util.hash_Stream(Stream([tr])) == h1
        assert util.hash_Stream(Stream([tr, tr2])) != h1


class TestHistory:
    def test_historicize_appends(self):
        da = DataArray(np.zeros(3), dims=("x",), name="v")
        util.historicize(da, "taper", {"wtype": "hann", "skipped": None})
        assert "taper" in da.attrs["history"]
        util.historicize(da, "filter", {"btype": "highpass"})
        assert da.attrs["history"].count("xcorr_tpu-") == 2


class TestTime:
    def test_to_seconds(self):
        td = np.array([1_500_000_000], dtype="timedelta64[ns]")
        out = util.to_seconds(pd.to_timedelta(td))
        assert float(out[0]) == 1.5
        assert util.to_seconds(3.0) == 3.0

    def test_get_dates(self):
        days = util.get_dates(pd.Timestamp("2014-01-01T06:00"),
                              pd.Timestamp("2014-01-03T00:00"))
        assert len(days) == 3

    def test_update_lag_indices(self):
        n, delta = 100, 0.02
        lag_full = util.cc.lag(n, delta)
        imin, imax = 50, 150
        da = DataArray(lag_full[imin:imax], dims=("lag",), name="lag", attrs={
            "sampling_rate": 1 / delta, "delta": delta, "npts": n,
            "index_min": 0, "index_max": 0, "units": "s"})
        util.update_lag_indices(da)
        assert da.attrs["index_min"] == imin
        assert da.attrs["index_max"] == imax


class TestGeo:
    def test_vincenty_known_distance(self):
        # classic Vincenty test vector: Flinders Peak -> Buninyong
        lat1 = -(37 + 57 / 60 + 3.72030 / 3600)
        lon1 = 144 + 25 / 60 + 29.52440 / 3600
        lat2 = -(37 + 39 / 60 + 10.15610 / 3600)
        lon2 = 143 + 55 / 60 + 35.38390 / 3600
        az12, az21, d = util.geo.inverse(lon1, lat1, lon2, lat2)
        assert abs(d - 54972.271) < 1e-3  # published value, mm accuracy
        assert abs(az12 - (-(360 - 306.868)) % 360 % 360) < 360  # sane
        # meridian degree on WGS84
        _, _, dm = util.geo.inverse(0, 0, 0, 1)
        assert abs(dm - 110574.389) < 0.01

    def test_equator_degree(self):
        _, _, d = util.geo.inverse(0.0, 0.0, 1.0, 0.0)
        assert abs(d - 111319.49) < 1.0  # 1 deg longitude at equator

    def test_coincident(self):
        _, _, d = util.geo.inverse(10.0, 10.0, 10.0, 10.0)
        assert d == 0.0

    def test_aeqd_roundtrip_scale(self):
        # a point 1 km north of center maps to (0, ~1000)
        lat0, lon0 = -20.0, 175.0
        dlat = 1000.0 / 111e3 * (111e3 / 110704.0)  # rough meridian degree
        x, y = util.geo.aeqd_xy(lon0, lat0 + 1000.0 / 110852.0, lon0, lat0)
        assert abs(float(x)) < 1.0
        assert abs(float(y) - 1000.0) < 2.0


class TestReceiver:
    def test_check_receiver(self):
        assert util.receiver.check_receiver("IU.RAR.10.BHZ")
        assert not util.receiver.check_receiver("IU.RAR.*.BHZ")
        assert util.receiver.check_receiver("IU.RAR.*.BHZ",
                                            allow_wildcards=True)
        with pytest.raises(ValueError):
            util.receiver.check_receiver("bad", raise_error=True)

    def test_split_pair_substitution(self):
        pair = "IM.H03S1..EDH-IU.RAR.10.BHR"
        plain = util.receiver.split_pair(pair)
        assert plain == ["IM.H03S1..EDH", "IU.RAR.10.BHR"]
        sub = util.receiver.split_pair(pair, substitute=True)
        assert sub == ["IM.H03S1..EDH", "IU.RAR.10.BH1", "IU.RAR.10.BH2",
                       "IU.RAR.10.BHZ"]
        nez = util.receiver.split_pair(pair, substitute=True,
                                       three_components="NEZ")
        assert "IU.RAR.10.BHN" in nez

    def test_receiver_dict_roundtrip(self):
        r = "IU.RAR.10.BHZ"
        d = util.receiver.receiver_to_dict(r)
        assert d["station"] == "RAR"
        assert util.receiver.receiver_to_str(d) == r

    def test_pair_distance(self):
        from xcorr_tpu.stream import Inventory, Channel
        inv = Inventory([
            Channel("IM", "H03S1", "", "EDH",
                    latitude=-33.6, longitude=-78.8),
            Channel("IU", "RAR", "10", "BHZ",
                    latitude=-21.2, longitude=-159.8),
        ])
        d = util.receiver.get_pair_distance(
            "IM.H03S1..EDH-IU.RAR.10.BHZ", inv, km=True)
        assert 7000 < d < 9000  # Juan Fernandez <-> Rarotonga ~ 8300 km
        # poi-relative mode returns |d1 - d2|
        poi = {"latitude": -25.0, "longitude": -120.0}
        dp = util.receiver.get_pair_distance(
            "IM.H03S1..EDH-IU.RAR.10.BHZ", inv, poi=poi, km=True)
        assert 0 < dp < d


class TestCCHelpers:
    def test_cc_matches_npcorrelate(self):
        rng = np.random.default_rng(42)
        x = rng.normal(size=64)
        y = rng.normal(size=64)
        r = util.cc.cc(x, y, normalize=False, unbiased=False)
        # reference formula: out[n-1+k] = sum_j x[j+k] y[j]
        # np.correlate(x, y, 'full')[k'] = sum_j x[k'+j-(N-1)] y[j]
        expected = np.correlate(x, y, "full")
        np.testing.assert_allclose(r, expected, rtol=1e-9, atol=1e-9)

    def test_cc_normalized_peak(self):
        x = np.sin(np.linspace(0, 20 * np.pi, 500))
        r = util.cc.cc(x, x, normalize=True, unbiased=False)
        assert abs(r[500 - 1] - 1.0) < 1e-9  # zero lag at index n-1

    def test_lag_vector(self):
        lv = util.cc.lag(5, 0.5)
        assert lv.size == 9
        np.testing.assert_allclose(lv, np.arange(-4, 5) * 0.5)

    def test_weight_full_length(self):
        w = util.cc.weight(5)
        assert w.size == 9
        np.testing.assert_allclose(w[4], 1.0)  # zero lag
        np.testing.assert_allclose(w[0], 5.0 / 1.0)  # lag -(n-1)
        wc = util.cc.weight(5, clip=2.0)
        assert wc.max() == 2.0

    def test_shift_extraction(self):
        rng = np.random.default_rng(0)
        sig = rng.normal(size=256)
        shift = 17
        x = np.roll(sig, shift)  # x[j] = sig[j - shift]: x delayed vs y
        y = sig
        s = util.cc.compute_shift(x, y, normalize=True, unbiased=False)
        # estimator convention r[k] = sum_j x[j+k] y[j]: delayed x peaks at +k
        assert s == shift


class TestConvert:
    def test_to_trace_roundtrip(self):
        lag = np.arange(100) * 0.05
        da = DataArray(np.sin(lag), dims=("lag",), name="cc",
                       coords={"lag": lag})
        tr = util.convert.to_trace(da, dim="lag")
        assert tr.stats.sampling_rate == pytest.approx(20.0)
        assert tr.stats.npts == 100

    def test_to_stream(self):
        lag = np.arange(50) * 0.1
        data = np.random.default_rng(1).normal(size=(3, 50))
        da = DataArray(data, dims=("pair", "lag"),
                       coords={"pair": np.array(["A-B", "C-D", "E-F"],
                                                dtype=object),
                               "lag": lag}, name="snr")
        st = util.convert.to_stream(da, dim="lag")
        assert len(st) == 3


class TestXfer:
    def test_device_fetch_chunked_matches_asarray(self, monkeypatch):
        import jax.numpy as jnp
        monkeypatch.setenv("XCORR_D2H_CHUNK_MB", "1")  # force chunking
        x = jnp.arange(5 * 300_000, dtype=jnp.float32).reshape(5, 300_000)
        h = util.xfer.device_fetch(x)
        assert isinstance(h, np.ndarray)
        np.testing.assert_array_equal(h, np.asarray(x))

    def test_device_fetch_into_out(self, monkeypatch):
        import jax.numpy as jnp
        monkeypatch.setenv("XCORR_D2H_CHUNK_MB", "1")
        x = jnp.ones((4, 300_000), jnp.float32) * 3.5
        out = np.empty((4, 300_000), np.float32)
        got = util.xfer.device_fetch(x, out=out)
        assert got is out
        assert float(out.min()) == float(out.max()) == 3.5

    def test_device_fetch_row_done_streams_in_order(self, monkeypatch):
        """row_done fires per landed chunk with strictly growing row
        counts; every reported prefix is already final (the engine's
        streamed scatter + the writer-tail overlap rely on this)."""
        import jax.numpy as jnp
        monkeypatch.setenv("XCORR_D2H_CHUNK_MB", "1")
        x = jnp.arange(8 * 150_000, dtype=jnp.float32).reshape(8, 150_000)
        ref = np.asarray(x)
        seen = []

        def row_done(out, n):
            np.testing.assert_array_equal(out[:n], ref[:n])
            seen.append(n)

        got = util.xfer.device_fetch(x, row_done=row_done)
        np.testing.assert_array_equal(got, ref)
        assert seen == sorted(seen) and seen[-1] == 8
        assert len(seen) > 1  # genuinely chunked, not one final call
        # non-chunked path: one final callback
        monkeypatch.setenv("XCORR_D2H_CHUNK_MB", "0")
        seen.clear()
        util.xfer.device_fetch(x, row_done=row_done)
        assert seen == [8]

    def test_device_fetch_row_done_packed_decodes_rows(self, monkeypatch):
        """PackedWire readbacks decode per landed chunk: row_done sees
        final float32 rows (incl. the all-NaN corrupt-row semantics)."""
        import jax.numpy as jnp
        monkeypatch.setenv("XCORR_WIRE_PACK", "1")
        monkeypatch.setenv("XCORR_D2H_CHUNK_MB", "1")
        monkeypatch.setattr(util.xfer, "_PACK_MIN_BYTES", 0)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(6, 200_000)).astype(np.float32)
        x[2, 5] = np.nan  # corrupt row decodes all-NaN
        packed = util.xfer.pack_for_wire(jnp.asarray(x))
        assert isinstance(packed, util.xfer.PackedWire)
        seen = []

        def row_done(out, n):
            assert out.dtype == np.float32
            if n >= 2:
                assert np.abs(out[0] - x[0]).max() < 1e-4
            if n >= 3:
                assert np.isnan(out[2]).all()
            seen.append(n)

        got = util.xfer.device_fetch(packed, row_done=row_done)
        assert seen[-1] == 6 and seen == sorted(seen)
        assert np.isnan(got[2]).all()
        ok = [0, 1, 3, 4, 5]
        assert np.abs(got[ok] - x[ok]).max() < 1e-4

    def test_device_fetch_disabled_and_host_passthrough(self, monkeypatch):
        monkeypatch.setenv("XCORR_D2H_CHUNK_MB", "0")
        a = np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)
        np.testing.assert_array_equal(util.xfer.device_fetch(a), a)

    def test_chunking_gated_to_tunneled_platforms(self, monkeypatch):
        """Without the env override, a real backend (cpu here) keeps
        the single-copy path even above the size threshold; setting the
        env forces chunking on any platform."""
        import jax.numpy as jnp
        monkeypatch.delenv("XCORR_D2H_CHUNK_MB", raising=False)
        big = jnp.zeros((128, 300_000), jnp.float32)  # 154 MB on cpu
        assert not util.xfer._should_chunk(big)
        monkeypatch.setenv("XCORR_D2H_CHUNK_MB", "64")
        assert util.xfer._should_chunk(big)

    def test_tunnel_detected_from_platform_version(self, monkeypatch):
        """The axon plugin registers devices as plain 'tpu'; only
        client.platform_version carries the 'axon ...' banner. The
        detector must catch that (regression: matching device.platform
        alone silently disabled chunking in production and every large
        readback went monolithic)."""
        monkeypatch.delenv("XCORR_D2H_CHUNK_MB", raising=False)

        class _Client:
            platform_version = "PJRT C API\naxon 0.1.0; compat c49"
            platform = "tpu"

        class _Dev:
            platform = "tpu"
            client = _Client()

        class _Arr:
            nbytes = 415_000_000
            ndim = 2
            shape = (64, 1_620_000)

            def devices(self):
                return {_Dev()}

        assert util.xfer._platform_of(_Arr()) == "axon"
        assert util.xfer._should_chunk(_Arr())
        _Client.platform_version = "PJRT C API\nTFRT TPU v4"
        assert util.xfer._platform_of(_Arr()) == "tpu"
        assert not util.xfer._should_chunk(_Arr())

    def test_wire_pack_round_trip_error_bound(self, monkeypatch):
        """int16 block-float codec: decoded values within half an LSB
        of each ROW's scale (row_max / 32767 / 2), rows with very
        different peaks each keeping their own resolution."""
        import jax.numpy as jnp
        monkeypatch.setenv("XCORR_WIRE_PACK", "1")  # force on cpu
        monkeypatch.setattr(util.xfer, "_PACK_MIN_BYTES", 0)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 50_000)).astype(np.float32)
        x[1] *= 1e-4   # quiet row keeps relative resolution
        x[2] *= 1e3
        x[3] = 0.0     # all-zero row must not divide by zero
        packed = util.xfer.pack_for_wire(jnp.asarray(x))
        assert isinstance(packed, util.xfer.PackedWire)
        assert packed.q.dtype == jnp.int16
        got = util.xfer.device_fetch(packed)
        assert got.dtype == np.float32
        row_max = np.abs(x).max(axis=-1, keepdims=True)
        lsb = np.where(row_max > 0, row_max, 1.0) / 32767.0
        # 0.5 LSB quantization + ~1e-3 LSB of f32 divide/multiply
        # rounding in the encode/decode pair (measured 0.5006 max)
        assert (np.abs(got - x) <= 0.505 * lsb).all()
        assert (got[3] == 0).all()
        # out= path decodes in place
        out = np.empty_like(x)
        got2 = util.xfer.device_fetch(util.xfer.pack_for_wire(
            jnp.asarray(x)), out=out)
        assert got2 is out
        np.testing.assert_array_equal(out, got)
        # prefetch accepts the wrapper
        util.xfer.prefetch(util.xfer.pack_for_wire(jnp.asarray(x)))

    def test_wire_pack_policy_gates(self, monkeypatch):
        """Codec policy: off everywhere with XCORR_WIRE_PACK=0; on a
        real backend (cpu) it stays off unless forced; small or
        non-f32 arrays always pass through."""
        import jax.numpy as jnp
        monkeypatch.setattr(util.xfer, "_PACK_MIN_BYTES", 0)
        x = jnp.ones((4, 1000), jnp.float32)
        monkeypatch.delenv("XCORR_WIRE_PACK", raising=False)
        assert util.xfer.pack_for_wire(x) is x  # cpu is not tunneled
        monkeypatch.setenv("XCORR_WIRE_PACK", "0")
        assert util.xfer.pack_for_wire(x) is x
        assert not util.xfer.wire_pack_enabled()
        monkeypatch.setenv("XCORR_WIRE_PACK", "1")
        assert isinstance(util.xfer.pack_for_wire(x), util.xfer.PackedWire)
        # int arrays and host arrays pass through even when forced
        xi = jnp.ones((4, 1000), jnp.int32)
        assert util.xfer.pack_for_wire(xi) is xi
        xh = np.ones((4, 1000), np.float32)
        assert util.xfer.pack_for_wire(xh) is xh
        # below the size gate
        monkeypatch.setattr(util.xfer, "_PACK_MIN_BYTES", 10**9)
        assert util.xfer.pack_for_wire(x) is x

    def test_ship_packed_round_trip(self, monkeypatch):
        """h2d codec: the decoded device array is within half an LSB
        (of the MEAN-CENTERED row peak) of the host input; policy
        gates mirror the d2h side."""
        monkeypatch.setattr(util.xfer, "_PACK_MIN_BYTES", 0)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(3, 20_000)).astype(np.float32)
        x[1] *= 1e-3
        x[2] = 0.0
        monkeypatch.setenv("XCORR_WIRE_PACK", "1")
        dev = util.xfer.ship_packed(x)
        got = np.asarray(dev)
        assert got.dtype == np.float32
        row_max = np.abs(x).max(axis=-1, keepdims=True)
        lsb = np.where(row_max > 0, row_max, 1.0) / 32767.0
        assert (np.abs(got - x) <= 0.505 * lsb).all()
        assert (got[2] == 0).all()
        # disabled -> bit-identical plain ship
        monkeypatch.setenv("XCORR_WIRE_PACK", "0")
        np.testing.assert_array_equal(np.asarray(util.xfer.ship_packed(x)),
                                      x)
        # cpu backend without the env forced -> plain ship
        monkeypatch.delenv("XCORR_WIRE_PACK", raising=False)
        np.testing.assert_array_equal(np.asarray(util.xfer.ship_packed(x)),
                                      x)

    def test_ship_packed_dc_offset_mean_centered(self, monkeypatch):
        """A raw-count DC offset must NOT set the quantization scale:
        rows are mean-centered before packing (the offset rides a f32
        side array), so the ambient signal keeps its resolution.
        Regression for the review finding that packing raw spans on
        the raw peak crushes offset-ridden data."""
        monkeypatch.setattr(util.xfer, "_PACK_MIN_BYTES", 0)
        monkeypatch.setenv("XCORR_WIRE_PACK", "1")
        rng = np.random.default_rng(3)
        ac = rng.normal(scale=10.0, size=(2, 20_000)).astype(np.float32)
        x = ac + np.float32(1e5)  # offset 1e4x the signal amplitude
        got = np.asarray(util.xfer.ship_packed(x))
        # error bound from the CENTERED peak (~45), not the raw 1e5
        lsb = np.abs(ac - ac.mean(-1, keepdims=True)).max() / 32767.0
        err = np.abs(got - x)
        assert err.max() <= 0.6 * lsb + 1e-2  # f32 mean add-back noise
        # the naive raw-peak scale would round to ~3-count steps
        assert err.max() < 1e5 / 32767.0 / 4

    def test_ship_packed_crest_and_nonfinite_fallback(self, monkeypatch):
        """Rows with a transient (crest factor > 64) or NaN/Inf make
        the whole stack ship UNPACKED — bit-identical float32."""
        monkeypatch.setattr(util.xfer, "_PACK_MIN_BYTES", 0)
        monkeypatch.setenv("XCORR_WIRE_PACK", "1")
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 20_000)).astype(np.float32)
        x[1, 500] = 5e4  # spike: crest ~5e4 >> 64
        np.testing.assert_array_equal(np.asarray(util.xfer.ship_packed(x)),
                                      x)
        y = rng.normal(size=(2, 20_000)).astype(np.float32)
        y[0, 3] = np.nan
        np.testing.assert_array_equal(np.asarray(util.xfer.ship_packed(y)),
                                      y)

    def test_wire_pack_nonfinite_rows_decode_nan(self, monkeypatch):
        """d2h codec: a row containing NaN/Inf decodes to ALL-NaN
        (int16 cannot carry a NaN; finite garbage would be worse),
        while clean rows decode normally."""
        import jax.numpy as jnp
        monkeypatch.setenv("XCORR_WIRE_PACK", "1")
        monkeypatch.setattr(util.xfer, "_PACK_MIN_BYTES", 0)
        rng = np.random.default_rng(5)
        x = rng.normal(size=(3, 10_000)).astype(np.float32)
        x[1, 7] = np.nan
        got = util.xfer.device_fetch(util.xfer.pack_for_wire(
            jnp.asarray(x)))
        assert np.isnan(got[1]).all()
        lsb = np.abs(x[[0, 2]]).max(axis=-1, keepdims=True) / 32767.0
        assert (np.abs(got[[0, 2]] - x[[0, 2]]) <= 0.505 * lsb).all()

    def test_tunneled_runtime_registered_probe(self, monkeypatch):
        """The registration probe reads the backend factory table (no
        client init) and keys on the tunneled-platform names."""
        import jax._src.xla_bridge as xb
        real = util.xfer.tunneled_runtime_registered()
        assert real == any(
            t in str(n).lower() for n in xb._backend_factories
            for t in util.xfer._TUNNELED_PLATFORMS)
        monkeypatch.setattr(xb, "_backend_factories",
                            {"cpu": None, "axon": None})
        assert util.xfer.tunneled_runtime_registered()
        monkeypatch.setattr(xb, "_backend_factories", {"cpu": None})
        assert not util.xfer.tunneled_runtime_registered()

    def test_device_ship_roundtrip_and_serialize_gate(self, monkeypatch):
        """device_ship matches device_put semantics either way; the
        serialized branch (opt-in; measured a loss on the production
        campaign, kept for duplex-contended links) blocks until the
        transfer is done and still returns the same values."""
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        monkeypatch.delenv("XCORR_WIRE_SERIALIZE", raising=False)
        assert not util.xfer._serialize_wire()
        dev = util.xfer.device_ship(a)
        np.testing.assert_array_equal(np.asarray(dev), a)
        monkeypatch.setenv("XCORR_WIRE_SERIALIZE", "1")
        assert util.xfer._serialize_wire()
        dev = util.xfer.device_ship(a)
        np.testing.assert_array_equal(np.asarray(dev), a)
        monkeypatch.setenv("XCORR_WIRE_SERIALIZE", "0")
        assert not util.xfer._serialize_wire()

    def test_device_ship_with_sharding(self):
        import jax
        from jax.sharding import (Mesh, NamedSharding,
                                  PartitionSpec as P)
        devs = np.asarray(jax.devices("cpu")[:1])
        mesh = Mesh(devs, ("batch",))
        a = np.ones((4, 8), np.float32)
        dev = util.xfer.device_ship(a, NamedSharding(mesh, P()))
        np.testing.assert_array_equal(np.asarray(dev), a)

    def test_prefetch_declines_when_chunked(self, monkeypatch):
        """prefetch must NOT start a monolithic copy that the chunked
        fetch cannot reuse; it should start one when the fetch will be
        a single read."""
        import jax.numpy as jnp
        x = jnp.ones((4, 300_000), jnp.float32)
        monkeypatch.setenv("XCORR_D2H_CHUNK_MB", "1")  # would chunk
        assert not util.xfer.prefetch(x)
        monkeypatch.setenv("XCORR_D2H_CHUNK_MB", "1000")  # single copy
        assert util.xfer.prefetch(x) is True
        assert not util.xfer.prefetch(np.zeros(4))  # host passthrough
