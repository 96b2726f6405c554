"""Tests for the labelled-array substrate (ndlabel)."""
import numpy as np
import pytest

from xcorr_tpu.ndlabel import DataArray, Dataset, concat, combine_by_coords, merge


def make_da():
    lag = np.linspace(-2.0, 2.0, 5)
    return DataArray(
        np.arange(10, dtype=np.float64).reshape(2, 5),
        coords={"pair": np.array(["A-B", "C-D"], dtype=object), "lag": lag},
        dims=("pair", "lag"),
        name="cc",
        attrs={"units": "-"},
    )


class TestDataArray:
    def test_basic(self):
        da = make_da()
        assert da.dims == ("pair", "lag")
        assert da.sizes == {"pair": 2, "lag": 5}
        assert da.name == "cc"
        assert da.attrs["units"] == "-"
        assert da.units == "-"  # attr access through __getattr__

    def test_isel_scalar_drops_dim(self):
        da = make_da()
        sub = da.isel(pair=0)
        assert sub.dims == ("lag",)
        np.testing.assert_array_equal(sub.values, np.arange(5.0))
        # coord of dropped dim becomes scalar
        assert sub.coords["pair"].ndim == 0

    def test_isel_array_keeps_dim(self):
        da = make_da()
        sub = da.isel(lag=np.array([0, 2, 4]))
        assert sub.sizes == {"pair": 2, "lag": 3}
        np.testing.assert_array_equal(sub.coords["lag"].values, [-2.0, 0.0, 2.0])

    def test_sel_label_and_slice(self):
        da = make_da()
        sub = da.sel(pair="C-D")
        np.testing.assert_array_equal(sub.values, np.arange(5, 10.0))
        sub = da.sel(lag=slice(-1.0, 1.0))
        assert sub.sizes["lag"] == 3  # inclusive both ends
        np.testing.assert_array_equal(sub.coords["lag"].values, [-1.0, 0.0, 1.0])

    def test_arithmetic_broadcast(self):
        da = make_da()
        w = DataArray(np.array([1.0, 2.0, 3.0, 2.0, 1.0]), dims=("lag",))
        prod = da * w
        assert prod.dims == ("pair", "lag")
        np.testing.assert_array_equal(prod.values[0], np.arange(5.0) * w.values)
        # scalar ops
        np.testing.assert_array_equal((da + 1).values, da.values + 1)
        np.testing.assert_array_equal((2 * da).values, 2 * da.values)

    def test_broadcast_disjoint_dims(self):
        a = DataArray(np.ones((2,)), dims=("x",))
        b = DataArray(np.arange(3.0), dims=("y",))
        c = a * b
        assert c.dims == ("x", "y")
        assert c.shape == (2, 3)

    def test_reductions(self):
        da = make_da()
        assert da.max().item() == 9.0
        m = da.mean("lag")
        assert m.dims == ("pair",)
        np.testing.assert_allclose(m.values, [2.0, 7.0])

    def test_argmax_idxmax(self):
        da = make_da()
        am = da.argmax("lag")
        np.testing.assert_array_equal(am.values, [4, 4])
        ix = da.idxmax("lag")
        np.testing.assert_array_equal(ix.values, [2.0, 2.0])

    def test_where_mask(self):
        da = make_da()
        cond = da.coords["lag"] >= 0
        masked = da.where(cond)
        assert np.isnan(masked.values[0, 0])
        assert masked.values[0, 3] == 3.0

    def test_where_drop(self):
        da = make_da()
        cond = da.coords["lag"] >= 0
        sub = da.where(cond, drop=True)
        assert sub.sizes["lag"] == 3
        np.testing.assert_array_equal(sub.coords["lag"].values, [0.0, 1.0, 2.0])

    def test_transpose_squeeze_expand(self):
        da = make_da()
        t = da.transpose("lag", "pair")
        assert t.shape == (5, 2)
        e = da.isel(pair=[0]).squeeze("pair")
        assert e.dims == ("lag",)
        x = e.expand_dims("pair")
        assert x.dims == ("pair", "lag")

    def test_comparison_produces_bool(self):
        da = make_da()
        m = da > 4.0
        assert m.dtype == bool
        assert m.values.sum() == 5


class TestDataset:
    def make_ds(self):
        ds = Dataset(attrs={"title": "t"})
        ds.coords["pair"] = np.array(["A-B"], dtype=object)
        ds.coords["time"] = np.arange(3)
        ds.coords["lag"] = np.linspace(-1, 1, 5)
        ds["cc"] = (("pair", "time", "lag"), np.zeros((1, 3, 5), np.float32))
        ds["status"] = (
            ("pair", "time"),
            np.zeros((1, 3), np.int8),
            {"long_name": "processing status"},
        )
        return ds

    def test_roundtrip_access(self):
        ds = self.make_ds()
        assert "cc" in ds and "pair" in ds
        assert ds.dims == {"pair": 1, "time": 3, "lag": 5}
        cc = ds["cc"]
        assert cc.dims == ("pair", "time", "lag")
        assert "lag" in cc.coords
        assert ds["status"].attrs["long_name"] == "processing status"

    def test_setitem_shape_check(self):
        ds = self.make_ds()
        with pytest.raises(ValueError):
            ds["bad"] = (("pair", "time"), np.zeros((2, 3)))

    def test_isel_sel(self):
        ds = self.make_ds()
        sub = ds.isel(time=slice(0, 2))
        assert sub.dims["time"] == 2
        sub = ds.sel(lag=slice(0.0, 1.0))
        assert sub.dims["lag"] == 3

    def test_where_drop(self):
        ds = self.make_ds()
        ds["status"].values[0, 1] = 1
        m = ds["status"] == 1
        sub = ds.where(m, drop=True)
        assert sub.dims["time"] == 1

    def test_iteration_sorted(self):
        ds = self.make_ds()
        assert sorted(ds) == ["cc", "status"]
        assert sorted(ds.coords) == ["lag", "pair", "time"]


class TestCombine:
    def test_concat_new_dim(self):
        a = DataArray(np.arange(3.0), dims=("lag",), name="cc")
        b = DataArray(np.arange(3.0) + 10, dims=("lag",), name="cc")
        c = concat([a, b], "pair")
        assert c.dims == ("pair", "lag")
        assert c.shape == (2, 3)

    def test_concat_existing_dim_dataset(self):
        def mk(t0):
            ds = Dataset()
            ds.coords["time"] = np.arange(t0, t0 + 2)
            ds["v"] = (("time",), np.arange(t0, t0 + 2, dtype=float))
            return ds

        out = concat([mk(0), mk(2)], "time")
        assert out.dims["time"] == 4
        np.testing.assert_array_equal(out["v"].values, np.arange(4.0))

    def test_combine_by_coords_union(self):
        def mk(pair, days):
            ds = Dataset()
            ds.coords["pair"] = np.array([pair], dtype=object)
            ds.coords["time"] = np.asarray(days)
            ds.coords["lag"] = np.arange(4.0)
            ds["cc"] = (
                ("pair", "time", "lag"),
                np.full((1, len(days), 4), float(hash(pair) % 7)),
            )
            return ds

        merged = combine_by_coords([mk("A-B", [0, 1]), mk("C-D", [1, 2])])
        assert merged.dims == {"pair": 2, "time": 3, "lag": 4}
        # cells not covered by either input are NaN
        ab = merged.sel(pair="A-B")["cc"]  # dims (time, lag)
        assert not np.isnan(ab.values[0]).any()  # time 0 covered
        assert np.isnan(ab.values[2]).all()  # time 2 uncovered -> NaN

    def test_merge_union_vars(self):
        ds1 = Dataset()
        ds1.coords["x"] = np.arange(2)
        ds1["a"] = (("x",), np.zeros(2))
        ds2 = Dataset()
        ds2.coords["x"] = np.arange(2)
        ds2["b"] = (("x",), np.ones(2))
        out = merge([ds1, ds2])
        assert set(out.keys()) == {"a", "b"}


class TestLoc:
    def test_loc_get_set(self):
        da = make_da()
        sub = da.loc[{"pair": "C-D"}]
        np.testing.assert_array_equal(sub.values, np.arange(5, 10.0))
        da.loc[{"pair": "A-B", "lag": 0.0}] = 99.0
        assert da.values[0, 2] == 99.0
        da.loc[{"pair": "A-B"}] = np.zeros(5)
        np.testing.assert_array_equal(da.values[0], 0.0)

    def test_loc_setitem_block_semantics(self):
        """Multiple array indexers assign the outer-product BLOCK (the
        xarray read semantics), not numpy's broadcast diagonal."""
        da = make_da()
        da.loc[{"pair": ["A-B", "C-D"], "lag": [-2.0, 0.0]}] = \
            np.array([[11.0, 12.0], [13.0, 14.0]])
        assert da.values[0, 0] == 11.0 and da.values[0, 2] == 12.0
        assert da.values[1, 0] == 13.0 and da.values[1, 2] == 14.0


class TestUnsortedCoords:
    def test_sel_list_on_unsorted_strings(self):
        """Array labels must resolve on coordinates in user (unsorted)
        order — searchsorted silently required sorted input."""
        da = DataArray(np.arange(6.0).reshape(3, 2),
                       coords={"pair": np.array(["XC.C-XC.D", "XC.A-XC.B",
                                                 "XC.B-XC.C"], dtype=object),
                               "lag": np.array([0.0, 1.0])},
                       dims=("pair", "lag"), name="cc")
        sub = da.sel(pair=["XC.A-XC.B"])
        np.testing.assert_array_equal(sub.values, [[2.0, 3.0]])
        sub2 = da.sel(pair=["XC.B-XC.C", "XC.C-XC.D"])
        np.testing.assert_array_equal(sub2.values[:, 0], [4.0, 0.0])

    def test_slice_on_unsorted_raises(self):
        da = DataArray(np.arange(3.0),
                       coords={"x": np.array([3.0, 1.0, 2.0])},
                       dims=("x",), name="v")
        with pytest.raises(KeyError, match="non-monotonic"):
            da.sel(x=slice(1.0, 2.0))


class TestDatasetConcatNewDim:
    def test_concat_datasets_new_dim_stacks(self):
        """Dataset concat along a NEW dim must stack every variable
        (previously returned the first object's data silently)."""
        parts = []
        for v in (1.0, 2.0, 3.0):
            ds = Dataset()
            ds.coords["x"] = np.arange(2)
            ds["a"] = (("x",), np.full(2, v))
            parts.append(ds)
        out = concat(parts, "day")
        assert out["a"].dims == ("day", "x")
        np.testing.assert_array_equal(out["a"].values[:, 0],
                                      [1.0, 2.0, 3.0])


class TestCoordValidation:
    def test_wrong_length_coord_raises(self):
        ds = Dataset()
        ds.coords["time"] = np.arange(5)
        ds["v"] = (("time",), np.zeros(5))
        with pytest.raises(ValueError, match="dimension has 5"):
            ds.coords["time"] = np.arange(3)


class TestCombineIdenticalCoordFastPath:
    def test_identical_lag_unioned_by_slice(self):
        lag = np.linspace(-1, 1, 101)
        parts = []
        for i, t in enumerate([0.0, 1.0]):
            ds = Dataset()
            ds.coords["time"] = np.array([t])
            ds.coords["lag"] = lag
            ds["cc"] = (("time", "lag"),
                        np.full((1, lag.size), float(i)))
            parts.append(ds)
        out = combine_by_coords(parts)
        assert out["cc"].shape == (2, 101)
        np.testing.assert_array_equal(out["cc"].values[0], 0.0)
        np.testing.assert_array_equal(out["cc"].values[1], 1.0)
        np.testing.assert_array_equal(out.coords["lag"].values, lag)
