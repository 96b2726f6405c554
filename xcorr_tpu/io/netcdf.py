r"""
:mod:`io.netcdf` -- h5py-backed netCDF-4 storage
================================================

Self-describing dataset persistence on plain HDF5 (netCDF4/h5netcdf are not
part of this build). Files follow netCDF-4 conventions — dimension-scale
coordinate datasets, gzip+shuffle encoding, CF attributes — so external
netCDF tooling can open the shards, and carry a small set of ``_xcorr_*``
attributes that make the round trip through :mod:`xcorr_tpu.ndlabel`
type-exact (datetime64/bool/str restoration).

Reference behavior being reproduced: ``xcorr/io/read.py`` /
``xcorr/io/write.py`` persistence of the CCF Dataset with zlib-9+shuffle
encoding (``xcorr/core/init.py:121``).
"""

from __future__ import annotations

import itertools
import json
import os
import zlib
from concurrent.futures import ThreadPoolExecutor

import h5py
import numpy as np

from ..ndlabel import DataArray, Dataset

__all__ = ["to_netcdf", "from_netcdf"]

_STR_DTYPE = h5py.string_dtype(encoding="utf-8")

# arrays at least this large go through the threaded chunk compressor
# (zlib releases the GIL, so compression parallelizes across chunks;
# h5py's normal write path compresses serially inside the HDF5 filter
# pipeline — measured 1.14 s for a production CCF shard vs ~0.35 s
# threaded). The file stays a standard shuffle+deflate HDF5/netCDF-4.
_PARALLEL_WRITE_MIN = 4 << 20
_PARALLEL_WRITE_THREADS = 8


def _shuffle_bytes(block):
    """The HDF5 shuffle filter (byte-plane transpose) in numpy."""
    s = block.dtype.itemsize
    if s == 1:
        return block.tobytes()
    a = np.ascontiguousarray(block).reshape(-1).view(np.uint8)
    return np.ascontiguousarray(a.reshape(-1, s).T).tobytes()


def _default_chunks(shape, dtype):
    """Chunk layout for the threaded writer: one chunk per trailing row
    for nd arrays (the CCF layout (pair, time, lag) -> (1, 1, lag)),
    ~8-way splits for 1-D arrays."""
    if len(shape) >= 2:
        return (1,) * (len(shape) - 1) + (shape[-1],)
    n = int(shape[0])
    target = max(1 << 18, -(-n // _PARALLEL_WRITE_THREADS))
    return (min(n, target),)


def _direct_chunk_write(dset, data, chunks, complevel, shuffle):
    """Compress chunks in a thread pool and store them verbatim via
    ``write_direct_chunk`` (bit-identical to the serial HDF5 shuffle +
    deflate pipeline; edge chunks zero-padded to full chunk size, as
    HDF5 itself stores them)."""
    shape = data.shape
    coords = list(itertools.product(
        *[range(0, shape[i], chunks[i]) for i in range(len(shape))]))

    def prep(off):
        sl = tuple(slice(o, min(o + c, s))
                   for o, c, s in zip(off, chunks, shape))
        block = np.ascontiguousarray(data[sl])
        if block.shape != tuple(chunks):
            full = np.zeros(chunks, dtype=data.dtype)
            full[tuple(slice(0, b) for b in block.shape)] = block
            block = full
        buf = _shuffle_bytes(block) if shuffle else block.tobytes()
        return off, zlib.compress(buf, complevel)

    nthreads = min(_PARALLEL_WRITE_THREADS, len(coords))
    with ThreadPoolExecutor(max_workers=nthreads) as ex:
        for off, payload in ex.map(prep, coords):
            dset.id.write_direct_chunk(off, payload)


def _encode_data(data):
    """Convert numpy data to an HDF5-storable array + restoration attrs."""
    extra = {}
    if np.issubdtype(data.dtype, np.datetime64):
        extra["_xcorr_dtype"] = str(data.dtype)
        extra["units"] = "nanoseconds since 1970-01-01"
        extra["calendar"] = "proleptic_gregorian"
        data = data.astype("datetime64[ns]").astype(np.int64)
    elif np.issubdtype(data.dtype, np.timedelta64):
        extra["_xcorr_dtype"] = str(data.dtype)
        extra["units"] = "nanoseconds"
        data = data.astype("timedelta64[ns]").astype(np.int64)
    elif data.dtype == bool:
        extra["_xcorr_dtype"] = "bool"
        data = data.astype(np.int8)
    elif data.dtype == object or data.dtype.kind in "US":
        extra["_xcorr_dtype"] = "str"
        data = np.asarray(data, dtype=object)
    return data, extra


def _decode_data(data, attrs):
    """Invert :func:`_encode_data` using the restoration attrs."""
    want = attrs.get("_xcorr_dtype")
    if want is None:
        return data
    if want.startswith("datetime64"):
        return data.astype(np.int64).astype("datetime64[ns]").astype(want)
    if want.startswith("timedelta64"):
        return data.astype(np.int64).astype("timedelta64[ns]").astype(want)
    if want == "bool":
        return data.astype(bool)
    if want == "str":
        out = np.empty(data.shape, dtype=object)
        flat_in = data.reshape(-1)
        flat_out = out.reshape(-1)
        for i, v in enumerate(flat_in):
            flat_out[i] = v.decode("utf-8") if isinstance(v, bytes) else str(v)
        return out
    return data


def _encode_attr(value):
    """Convert one attribute value to an HDF5-storable form.

    Returns (storable, was_json): dicts/lists-of-mixed go through JSON.
    """
    if isinstance(value, dict):
        return json.dumps(value), True
    if value is None:
        return "n/a", False
    # datetime64/timedelta64 have no native HDF5 equivalent (h5py
    # raises); store ISO-8601 / str form like CF attribute conventions.
    # np.datetime64 is an np.generic, so check before that branch.
    if isinstance(value, (np.datetime64, np.timedelta64)):
        return str(value), False
    if isinstance(value, (str, bytes, int, float, np.generic)):
        return value, False
    arr = np.asarray(value)
    if arr.dtype == object or arr.dtype.kind in "USmM":
        return json.dumps([str(v) for v in arr.tolist()]), True
    return arr, False


def _write_attrs(h5obj, attrs):
    json_keys = []
    for k, v in attrs.items():
        sv, was_json = _encode_attr(v)
        if was_json:
            json_keys.append(k)
        h5obj.attrs[k] = sv
    if json_keys:
        h5obj.attrs["_xcorr_json_attrs"] = json.dumps(json_keys)


# HDF5/netCDF-4 internal attributes hidden from user attrs (the same set
# h5netcdf masks)
_HIDDEN_ATTRS = {"CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
                 "_Netcdf4Dimid", "_Netcdf4Coordinates", "_NCProperties"}


def _read_attrs(h5obj):
    raw = {k: v for k, v in h5obj.attrs.items() if k not in _HIDDEN_ATTRS}
    json_keys = set()
    if "_xcorr_json_attrs" in raw:
        json_keys = set(json.loads(raw.pop("_xcorr_json_attrs")))
    out = {}
    for k, v in raw.items():
        if isinstance(v, bytes):
            v = v.decode("utf-8")
        if k in json_keys:
            v = json.loads(v)
        elif isinstance(v, np.ndarray) and v.dtype.kind in "OS":
            v = np.asarray([x.decode("utf-8") if isinstance(x, bytes)
                            else str(x) for x in v.reshape(-1)]
                           ).reshape(v.shape)
        out[k] = v
    return out


def _encoding_kwargs(encoding):
    kw = {}
    if not encoding:
        return kw
    if encoding.get("zlib"):
        kw["compression"] = "gzip"
        kw["compression_opts"] = int(encoding.get("complevel", 4))
    if encoding.get("shuffle"):
        kw["shuffle"] = True
    if encoding.get("chunksizes"):
        kw["chunks"] = tuple(encoding["chunksizes"])
    return kw


def to_netcdf(ds: Dataset, path, mode: str = "w", engine=None, **kw):
    """Persist a Dataset as a netCDF-4 flavored HDF5 file."""
    with h5py.File(path, mode) as f:
        _write_attrs(f, ds.attrs)
        dims = ds.dims
        # coordinate (dimension-scale) datasets first
        for name, coord in ds._coords.items():
            _write_var(f, name, coord, ds.encoding.get(name))
            if coord.dims == (name,):
                f[name].make_scale(name)
        # phony dims (no coordinate variable): store sizes for the reader
        phony = {d: s for d, s in dims.items() if d not in ds._coords}
        if phony:
            f.attrs["_xcorr_phony_dims"] = json.dumps(phony)
        for name, var in ds._vars.items():
            _write_var(f, name, var, ds.encoding.get(name))
            for i, d in enumerate(var.dims):
                if d in ds._coords and ds._coords[d].dims == (d,):
                    f[name].dims[i].attach_scale(f[d])
        coord_names = list(ds._coords)
        f.attrs["_xcorr_coordinates"] = json.dumps(coord_names)


def _write_var(f, name, var, encoding):
    data, extra = _encode_data(np.asarray(var.data))
    kw = _encoding_kwargs(encoding)
    if data.dtype == object:
        dset = f.create_dataset(name, shape=data.shape, dtype=_STR_DTYPE,
                                **kw)
        if data.size:
            dset[...] = data
    elif kw.get("compression") == "gzip" and data.size and \
            data.nbytes >= _PARALLEL_WRITE_MIN and \
            (os.cpu_count() or 1) > 1:
        chunks = kw.get("chunks") or _default_chunks(data.shape,
                                                     data.dtype)
        dset = f.create_dataset(
            name, shape=data.shape, dtype=data.dtype, chunks=chunks,
            compression="gzip",
            compression_opts=kw.get("compression_opts", 4),
            shuffle=kw.get("shuffle", False))
        _direct_chunk_write(dset, data, chunks,
                            kw.get("compression_opts", 4),
                            kw.get("shuffle", False))
    else:
        dset = f.create_dataset(name, data=data, **kw)
    _write_attrs(dset, {**var.attrs, **extra,
                        "_xcorr_dims": json.dumps(list(var.dims))})


def from_netcdf(path, **kw) -> Dataset:
    """Load a Dataset written by :func:`to_netcdf` (or a compatible
    netCDF-4 file using dimension scales)."""
    ds = Dataset()
    with h5py.File(path, "r") as f:
        ds.attrs = _read_attrs(f)
        coord_names = json.loads(ds.attrs.pop("_xcorr_coordinates", "[]"))
        ds.attrs.pop("_xcorr_phony_dims", None)
        for name in f.keys():
            dset = f[name]
            attrs = _read_attrs(dset)
            dims_json = attrs.pop("_xcorr_dims", None)
            if dims_json is not None:
                var_dims = tuple(json.loads(dims_json))
            else:  # foreign netCDF: use dimension scales / fallback names
                var_dims = tuple(
                    (dset.dims[i].keys()[0] if len(dset.dims[i]) else
                     f"phony_dim_{i}") for i in range(dset.ndim))
            data = _decode_data(dset[...], attrs)
            attrs.pop("_xcorr_dtype", None)
            if attrs.get("units") == "nanoseconds since 1970-01-01":
                attrs.pop("units")
                attrs.pop("calendar", None)
            elif attrs.get("units") == "nanoseconds" and \
                    np.issubdtype(data.dtype, np.timedelta64):
                attrs.pop("units")
            da = DataArray(data, dims=var_dims, name=name, attrs=attrs)
            if name in coord_names or (dims_json is None and
                                       var_dims == (name,)):
                ds._coords[name] = da
            else:
                ds._vars[name] = da
    ds.encoding["source"] = str(path)
    return ds
