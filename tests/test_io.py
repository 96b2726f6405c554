"""Tests for netCDF round-trip, validation, atomic writes, path scheme."""
import os

import numpy as np
import pandas as pd
import pytest

from xcorr_tpu import io as xio
from xcorr_tpu import util
from xcorr_tpu.ndlabel import DataArray, Dataset
from xcorr_tpu.stream.process import example_process_dict, hash_operations


def make_ccf_dataset(nt=4, nlag=64):
    """A miniature CCF dataset with the reference schema."""
    ds = Dataset(attrs={
        "title": "Cross-correlations - 2014.001",
        "institution": "Test, dept",
        "author": "tester - t@t",
        "source": "synthetic",
        "history": "Created @ now",
        "references": "n/a",
        "comment": "n/a",
        "Conventions": "CF-1.9",
        "xcorr_version": "0.1.0",
        "dependencies_version": "x",
    })
    ds.coords["pair"] = np.array(["IM.H03S1..EDH-IU.RAR.10.BHZ"],
                                 dtype=object)
    ds.coords["pair"].attrs = {
        "long_name": "Cross-correlation receiver pair",
        "units": "-",
        "preprocess": hash_operations(example_process_dict()),
    }
    ds.coords["time"] = pd.date_range("2014-01-01", periods=nt,
                                      freq="3h").values
    ds.coords["time"].attrs = {"window_length": 86400.0,
                               "window_overlap": 0.875, "closed": "left"}
    lag = np.arange(nlag, dtype=np.float64) * 0.02
    ds.coords["lag"] = lag
    ds.coords["lag"].attrs = {
        "long_name": "Time lag", "units": "s", "sampling_rate": 50.0,
        "delta": 0.02, "npts": nlag, "index_min": 0, "index_max": nlag,
        "clip_lag": np.array([0.0, 1.26]),
    }
    ds["distance"] = (("pair",), np.array([8300.0]),
                      {"units": "km"}, {"zlib": True, "complevel": 4})
    ds["status"] = (("pair", "time"), np.zeros((1, nt), np.int8),
                    {"valid_range": np.array([-1, 1], np.int8)})
    ds["cc"] = (("pair", "time", "lag"),
                np.random.default_rng(0).normal(
                    size=(1, nt, nlag)).astype(np.float32),
                {"long_name": "Cross-correlation Estimate", "units": "-",
                 "add_offset": np.float32(0), "scale_factor": np.float32(1)},
                {"zlib": True, "complevel": 4, "shuffle": True})
    ds["status"].values[0, :] = 1
    ds.attrs["sha256_hash_metadata"] = util.hasher.hash_Dataset(
        ds, metadata_only=True)
    return ds


class TestNetcdfRoundtrip:
    def test_roundtrip_types(self, tmp_path):
        ds = make_ccf_dataset()
        path = tmp_path / "test.nc"
        xio.to_netcdf(ds, str(path))
        back = xio.from_netcdf(str(path))
        assert back.dims == ds.dims
        # dtypes restored exactly
        assert back["cc"].dtype == np.float32
        assert back["status"].dtype == np.int8
        assert np.issubdtype(back.coords["time"].dtype, np.datetime64)
        assert back.coords["pair"].dtype == object
        assert back.coords["pair"].values[0] == ds.coords["pair"].values[0]
        np.testing.assert_array_equal(back["cc"].values, ds["cc"].values)
        # numeric attrs preserved
        assert back.coords["lag"].attrs["sampling_rate"] == 50.0
        np.testing.assert_array_equal(
            back.coords["lag"].attrs["clip_lag"], [0.0, 1.26])

    def test_metadata_hash_survives_roundtrip(self, tmp_path):
        """THE invariant: hash computed before write == hash recomputed
        after read (with preprocess JSON->dict restore)."""
        ds = make_ccf_dataset()
        path = tmp_path / "h.nc"
        xio.write(ds, str(path), verb=0, hash_data=True)
        back = xio.from_netcdf(str(path))
        from xcorr_tpu.io.utils import preprocess_operations_to_dict
        preprocess_operations_to_dict(back.coords["pair"])
        recomputed = util.hasher.hash_Dataset(back, metadata_only=True)
        assert recomputed == back.attrs["sha256_hash_metadata"]
        full = util.hasher.hash_Dataset(back, metadata_only=False)
        assert full == back.attrs["sha256_hash"]


class TestWriteRead:
    def test_write_read_validate(self, tmp_path):
        ds = make_ccf_dataset()
        path = str(tmp_path / "v.nc")
        out = xio.write(ds, path, verb=0)
        assert out == os.path.abspath(path)
        back = xio.read(path, verb=1)
        assert back is not None
        # preprocess attr restored to dict
        assert isinstance(back.coords["pair"].attrs["preprocess"], dict)
        np.testing.assert_allclose(back["cc"].values, ds["cc"].values)

    def test_refuses_empty_status(self, tmp_path):
        ds = make_ccf_dataset()
        ds["status"].values[:] = 0
        ds.attrs["sha256_hash_metadata"] = util.hasher.hash_Dataset(
            ds, metadata_only=True)
        path = str(tmp_path / "e.nc")
        assert xio.write(ds, path, verb=0) is None
        assert not os.path.exists(path)
        assert xio.write(ds, path, verb=0, force_write=True) is not None

    def test_validate_rejects_tamper(self, tmp_path):
        ds = make_ccf_dataset()
        path = str(tmp_path / "t.nc")
        xio.write(ds, path, verb=0)
        back = xio.from_netcdf(path)
        back.coords["lag"].attrs["sampling_rate"] = 999.0  # tamper
        assert xio.validate(back) is None

    def test_read_extract_masks(self, tmp_path):
        ds = make_ccf_dataset()
        ds["status"].values[0, 2] = -1
        ds.attrs["sha256_hash_metadata"] = util.hasher.hash_Dataset(
            ds, metadata_only=True)
        path = str(tmp_path / "m.nc")
        xio.write(ds, path, verb=0)
        back = xio.read(path, extract=True)
        assert np.isnan(back["cc"].values[0, 2]).all()
        assert not np.isnan(back["cc"].values[0, 0]).any()

    def test_mfread_combines(self, tmp_path):
        paths = []
        for day in (1, 2):
            ds = make_ccf_dataset()
            t = pd.date_range(f"2014-01-0{day}", periods=4, freq="3h").values
            ds.coords["time"].data = t
            ds.attrs["sha256_hash_metadata"] = util.hasher.hash_Dataset(
                ds, metadata_only=True)
            p = str(tmp_path / f"d{day}.nc")
            xio.write(ds, p, verb=0)
            paths.append(p)
        merged = xio.mfread(paths)
        assert merged.dims["time"] == 8

    def test_validate_list_glob_and_template(self, tmp_path):
        for day in (1, 2, 3):
            ds = make_ccf_dataset()
            t = pd.date_range(f"2014-01-0{day}", periods=4, freq="3h").values
            ds.coords["time"].data = t
            ds.attrs["sha256_hash_metadata"] = util.hasher.hash_Dataset(
                ds, metadata_only=True)
            xio.write(ds, str(tmp_path / f"g{day}.nc"), verb=0)
        got = xio.validate_list(str(tmp_path / "g*.nc"), paths_only=True,
                                parallel=True)
        assert len(got) == 3

    def test_validate_list_skips_corrupt_leading_shard(self, tmp_path):
        """A corrupt alphabetically-first file is skipped with a warning
        (reference scans forward to the first VALID dataset); the rest
        still validate and merge."""
        (tmp_path / "a0.nc").write_bytes(b"not a netcdf file")
        for day in (1, 2):
            ds = make_ccf_dataset()
            t = pd.date_range(f"2014-01-0{day}", periods=4,
                              freq="3h").values
            ds.coords["time"].data = t
            ds.attrs["sha256_hash_metadata"] = util.hasher.hash_Dataset(
                ds, metadata_only=True)
            xio.write(ds, str(tmp_path / f"b{day}.nc"), verb=0)
        with pytest.warns(UserWarning, match="skipped"):
            got = xio.validate_list(str(tmp_path / "*.nc"),
                                    paths_only=True)
        assert len(got) == 2

    def test_write_failure_cleans_tmp_and_restores_attrs(self, tmp_path):
        """A failed write leaves no tmp file and restores the pair
        'preprocess' attr to dict form so a retry hashes correctly."""
        ds = make_ccf_dataset()
        ds.attrs["bad"] = object()  # unstorable -> to_netcdf raises
        with pytest.raises(Exception):
            xio.write(ds, str(tmp_path / "fail.nc"), verb=0)
        assert not [p for p in os.listdir(tmp_path)
                    if p.startswith("fail.nc.")]
        assert isinstance(ds.coords["pair"].attrs["preprocess"], dict)

    def test_datetime64_attrs_roundtrip_as_strings(self, tmp_path):
        from xcorr_tpu.io.netcdf import to_netcdf, from_netcdf
        ds = make_ccf_dataset()
        ds.attrs["window_start"] = np.datetime64("2021-01-01T06:00:00")
        ds.attrs["spans"] = np.array(["2021-01-01", "2021-01-02"],
                                     dtype="datetime64[D]")
        p = str(tmp_path / "dt.nc")
        to_netcdf(ds, p, mode="w")
        back = from_netcdf(p)
        assert back.attrs["window_start"] == "2021-01-01T06:00:00"
        assert list(back.attrs["spans"]) == ["2021-01-01", "2021-01-02"]


class TestHeaderOnlyRead:
    """Header-only shard reads (from_netcdf(header_only=True)): large
    data payloads stay undecoded (zero placeholders) while status,
    coords, attrs, and the metadata digest are identical to a full
    read — the resume fast path's substrate."""

    def test_status_and_validation_intact(self, tmp_path, monkeypatch):
        from xcorr_tpu.io import netcdf as ncmod
        monkeypatch.setattr(ncmod, "_HEADER_ONLY_MAX_ELEMS", 100)
        ds = make_ccf_dataset()
        ds["status"].values[0, 2] = -1
        ds.attrs["sha256_hash_metadata"] = util.hasher.hash_Dataset(
            ds, metadata_only=True)
        path = str(tmp_path / "h.nc")
        xio.write(ds, path, verb=0)
        back = xio.read(path, header_only=True)
        assert back is not None  # metadata digest verified
        np.testing.assert_array_equal(back["status"].values,
                                      ds["status"].values)
        assert (back["cc"].values == 0).all()  # placeholder, not data
        assert back.encoding.get("header_only") is True
        # small vars and coords still decode
        np.testing.assert_array_equal(back["distance"].values,
                                      ds["distance"].values)
        np.testing.assert_allclose(back.coords["lag"].values,
                                   ds.coords["lag"].values)

    def test_header_only_matches_full_metadata_hash(self, tmp_path,
                                                    monkeypatch):
        from xcorr_tpu.io import netcdf as ncmod
        monkeypatch.setattr(ncmod, "_HEADER_ONLY_MAX_ELEMS", 100)
        ds = make_ccf_dataset()
        path = str(tmp_path / "m.nc")
        xio.write(ds, path, verb=0)
        full = xio.from_netcdf(path)
        head = xio.from_netcdf(path, header_only=True)
        assert util.hasher.hash_Dataset(head, metadata_only=True) == \
            util.hasher.hash_Dataset(full, metadata_only=True)

    def test_write_back_refused(self, tmp_path, monkeypatch):
        from xcorr_tpu.io import netcdf as ncmod
        monkeypatch.setattr(ncmod, "_HEADER_ONLY_MAX_ELEMS", 100)
        ds = make_ccf_dataset()
        path = str(tmp_path / "w.nc")
        xio.write(ds, path, verb=0)
        back = xio.from_netcdf(path, header_only=True)
        with pytest.raises(ValueError, match="header-only"):
            xio.to_netcdf(back, str(tmp_path / "w2.nc"))

    def test_packed_cc_placeholder(self, tmp_path, monkeypatch):
        """CF int16 packed shards decode their placeholder through the
        same unpack branch (float32 zeros, encoding recovered)."""
        from xcorr_tpu.io import netcdf as ncmod
        monkeypatch.setattr(ncmod, "_HEADER_ONLY_MAX_ELEMS", 100)
        ds = make_ccf_dataset()
        ds.encoding["cc"] = {"zlib": True, "complevel": 1,
                             "shuffle": True, "dtype": "int16"}
        path = str(tmp_path / "p.nc")
        xio.to_netcdf(ds, path)
        back = xio.from_netcdf(path, header_only=True)
        assert back["cc"].dtype == np.float32
        assert back.encoding["cc"]["dtype"] == "int16"


class TestPackedCC:
    """CF int16 packed-data storage (io/netcdf.py _pack_floats):
    realizes the schema's reserved scale_factor/add_offset attrs
    (reference xcorr/core/init.py:126-127)."""

    def _packed(self, tmp_path, name="p.nc"):
        ds = make_ccf_dataset()
        ds.encoding["cc"] = {"zlib": True, "complevel": 1,
                             "shuffle": True, "dtype": "int16"}
        ds["cc"].values[0, 1, 3] = np.nan
        path = str(tmp_path / name)
        xio.to_netcdf(ds, path)
        return ds, path

    def test_pack_roundtrip(self, tmp_path):
        import h5py
        ds, path = self._packed(tmp_path)
        with h5py.File(path, "r") as f:
            assert f["cc"].dtype == np.int16
            assert f["cc"].attrs["_FillValue"] == -32768
            scale = float(f["cc"].attrs["scale_factor"])
        cc = ds["cc"].values
        assert scale == pytest.approx(
            np.nanmax(np.abs(cc)) / 32765, rel=1e-12)
        back = xio.from_netcdf(path)
        assert back["cc"].dtype == np.float32
        assert np.isnan(back["cc"].values[0, 1, 3])
        good = ~np.isnan(cc)
        np.testing.assert_allclose(back["cc"].values[good], cc[good],
                                   atol=scale * 0.505)
        # round trip re-packs: dtype carried in the recovered encoding,
        # zlib settings recovered too (resume writes stay compressed)
        assert back.encoding["cc"]["dtype"] == "int16"
        assert back.encoding["cc"]["zlib"] is True
        assert back.encoding["cc"]["complevel"] == 1

    def test_pack_resume_rescale(self, tmp_path):
        # a resume adding larger-amplitude windows must re-derive the
        # scale from the updated data, not clip against the old max
        _, path = self._packed(tmp_path)
        back = xio.from_netcdf(path)
        back["cc"].values[0, 2] *= 10.0
        cc = back["cc"].values.copy()
        import h5py
        path2 = str(tmp_path / "p2.nc")
        xio.to_netcdf(back, path2)
        with h5py.File(path2, "r") as f:
            scale = float(f["cc"].attrs["scale_factor"])
        assert scale == pytest.approx(
            np.nanmax(np.abs(cc)) / 32765, rel=1e-12)
        again = xio.from_netcdf(path2)
        good = ~np.isnan(cc)
        np.testing.assert_allclose(again["cc"].values[good], cc[good],
                                   atol=scale * 0.505)

    def test_packed_validates_and_shrinks(self, tmp_path):
        # the metadata hash ignores scale_factor/add_offset (reference
        # hasher contract), so packed shards validate unchanged
        ds = make_ccf_dataset(nlag=32768)  # noise f32 barely deflates
        ds.encoding["cc"] = {"zlib": True, "complevel": 1,
                             "shuffle": True, "dtype": "int16"}
        ds["cc"].values[0, 1, 3] = np.nan
        pp = str(tmp_path / "w_packed.nc")
        pu = str(tmp_path / "w_plain.nc")
        assert xio.write(ds, pp, verb=0) is not None
        del ds.encoding["cc"]["dtype"]
        assert xio.write(ds, pu, verb=0) is not None
        back = xio.read(pp, verb=0)
        assert back is not None  # validate passed
        assert back["cc"].dtype == np.float32
        import h5py

        def cc_bytes(path):
            with h5py.File(path, "r") as f:
                return f["cc"].id.get_storage_size()

        # noise-like f32 barely deflates; int16+shuffle roughly halves
        assert cc_bytes(pp) < 0.6 * cc_bytes(pu)

    def test_init_pack_cc(self, tmp_path):
        from xcorr_tpu import init
        ds = init(
            pair="IM.H03S1..EDH-IU.RAR.10.BHZ",
            starttime="2014-01-01", endtime="2014-01-02",
            preprocess=example_process_dict(),
            attrs={"institution": "i", "author": "a", "source": "s"},
            sampling_rate=10.0, window_length=60.0, window_overlap=0.5,
            pack_cc=True)
        assert ds.encoding["cc"]["dtype"] == "int16"
        rng = np.random.default_rng(1)
        ds["cc"].values[:] = rng.normal(
            size=ds["cc"].shape).astype(np.float32) * 0.5
        ds["status"].values[:] = 1
        path = str(tmp_path / "i.nc")
        xio.write(ds, path, verb=0)
        back = xio.read(path, verb=0)
        assert back is not None
        np.testing.assert_allclose(
            back["cc"].values, ds["cc"].values,
            atol=np.abs(ds["cc"].values).max() / 32765 * 0.505)


class TestNcfile:
    def test_path_scheme(self):
        p = xio.ncfile("IM.H03S1..EDH-IU.RAR.10.BHZ",
                       pd.Timestamp("2014-02-03"), root="/data/cc")
        assert p == ("/data/cc/2014/IM.H03S1..EDH-IU.RAR.10.BHZ/"
                     "IM.H03S1..EDH-IU.RAR.10.BHZ.2014.034.nc")

    def test_rejects_bad_receiver(self):
        with pytest.raises(ValueError):
            xio.ncfile("bad-pair", pd.Timestamp("2014-01-01"), root="/x")


class TestNetcdfFuzz:
    """Property-style netCDF round-trip over random schemas."""

    @pytest.mark.parametrize("seed", range(5))
    def test_random_dataset_roundtrip(self, tmp_path, seed):
        from xcorr_tpu.ndlabel import Dataset
        rng = np.random.default_rng(seed)
        ds = Dataset(attrs={"title": f"fuzz {seed}", "idx": int(seed),
                            "arr": rng.normal(size=3),
                            "nested": {"a": 1, "b": [1, 2, "x"]}})
        nd = int(rng.integers(2, 5))
        dims = []
        for i in range(nd):
            name = f"d{i}"
            size = int(rng.integers(1, 7))
            kind = rng.integers(0, 4)
            if kind == 0:
                ds.coords[name] = np.arange(size, dtype=np.int64)
            elif kind == 1:
                ds.coords[name] = np.linspace(0, 1, size)
            elif kind == 2:
                ds.coords[name] = pd.date_range("2020-01-01",
                                                periods=size).values
            else:
                ds.coords[name] = np.array([f"s{j}" for j in range(size)],
                                           dtype=object)
            dims.append((name, size))
        for v in range(int(rng.integers(1, 4))):
            take = [d for d, _ in dims[: int(rng.integers(1, nd + 1))]]
            shape = tuple(s for d, s in dims if d in take)
            dtype = rng.choice([np.float32, np.float64, np.int8,
                                np.int32])
            ds[f"v{v}"] = (tuple(take),
                           rng.normal(size=shape).astype(dtype),
                           {"units": "-", "flag": np.int8(v)})
        path = str(tmp_path / f"fuzz{seed}.nc")
        xio.to_netcdf(ds, path)
        back = xio.from_netcdf(path)
        assert back.dims == ds.dims
        for name in ds.data_vars:
            np.testing.assert_array_equal(back[name].values,
                                          ds[name].values)
            assert back[name].dtype == ds[name].dtype
        for name in ds.coords:
            a, b = ds.coords[name].values, back.coords[name].values
            if a.dtype == object:
                assert list(a) == list(b)
            else:
                np.testing.assert_array_equal(a, b)
        assert back.attrs["nested"] == {"a": 1, "b": [1, 2, "x"]}
