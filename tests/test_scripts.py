"""Integration tests: the CLI pipelines end-to-end over synthetic shards."""
import glob
import os

import numpy as np
import pandas as pd
import pytest

import xcorr_tpu
from xcorr_tpu.stream import Channel, Inventory, SyntheticClient

FS = 5.0
WINDOW = 3600.0

PREPROCESS = {
    "EDH": [
        ("detrend", {"type": "demean"}),
        ("filter", {"type": "bandpass", "freqmin": 0.3, "freqmax": 2.0}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ],
    "BHZ": [
        ("detrend", {"type": "demean"}),
        ("filter", {"type": "bandpass", "freqmin": 0.3, "freqmax": 2.0}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ],
}
ATTRS = {"institution": "t", "author": "t", "source": "t"}

PAIRS = ["IM.H03S1..EDH-IU.RAR.10.BHZ", "IM.H03S2..EDH-IU.RAR.10.BHZ",
         "IM.H03S3..EDH-IU.RAR.10.BHZ"]


def _inventory():
    return Inventory([
        Channel("IM", "H03S1", "", "EDH", latitude=-33.60,
                longitude=-78.80),
        Channel("IM", "H03S2", "", "EDH", latitude=-33.62,
                longitude=-78.82),
        Channel("IM", "H03S3", "", "EDH", latitude=-33.61,
                longitude=-78.78),
        Channel("IU", "RAR", "10", "BHZ", latitude=-21.2,
                longitude=-159.8),
    ])


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    """Produce 2 days of CCF shards for 3 pairs once per module."""
    root = str(tmp_path_factory.mktemp("cc"))
    client = SyntheticClient(
        sampling_rate=FS,
        delays={"IM.H03S1..EDH": 0.0, "IM.H03S2..EDH": 0.3,
                "IM.H03S3..EDH": 0.6, "IU.RAR.10.BHZ": 4.0},
        source_period=600.0, source_amplitude=20.0)
    times = pd.date_range("2014-01-01", "2014-01-03", freq="1D",
                          inclusive="left")
    init_args = dict(preprocess=PREPROCESS, attrs=ATTRS, sampling_rate=FS,
                     window_length=WINDOW, window_overlap=0.5,
                     clip_lag=(-100.0, 100.0), inventory=_inventory())
    results = xcorr_tpu.lazy_process(PAIRS, times, init_args, client,
                                     inventory=_inventory(), root=root,
                                     nworkers=4, verb=0)
    assert all(results)
    return root


class TestSnrCtPipeline:
    def test_snr_then_ct(self, archive, tmp_path):
        from xcorr_tpu.scripts import snr as snr_script, ct as ct_script
        out_snr = str(tmp_path / "snr.nc")
        rc = snr_script.main([
            "2014-01-01", "2014-01-02", "--root", archive,
            "--celerity", "1400", "90000000", "--filter-freq", "0.5",
            "--out", out_snr, "--institution", "t", "--author", "t",
            "--source", "t", "-n", "2"])
        assert rc == 0 and os.path.exists(out_snr)
        ds = xcorr_tpu.io.from_netcdf(out_snr)
        assert "snr" in ds
        assert ds.dims["pair"] == 3

        out_ct = str(tmp_path / "ct.nc")
        csv = str(tmp_path / "ct.csv")
        rc = ct_script.main([out_snr, "--threshold", "0.01",
                             "--out", out_ct, "--csv", csv])
        assert rc == 0 and os.path.exists(out_ct)
        ct_ds = xcorr_tpu.io.from_netcdf(out_ct)
        assert "ct" in ct_ds

    def test_psd_pipeline(self, archive, tmp_path):
        from xcorr_tpu.scripts import psd as psd_script
        ds = psd_script.psd_of_period(
            PAIRS[:1], pd.Timestamp("2014-01-01"),
            pd.Timestamp("2014-01-01T12:00"), archive,
            clim=(1400.0, 90_000_000.0), duration=10.0, padding_factor=2,
            filter_kwargs={"frequency": 0.5, "btype": "highpass",
                           "order": 2})
        assert ds is not None
        assert "psd" in ds
        assert "freq" in ds["psd"].dims

    def test_psd_period_files_with_snr(self, archive, tmp_path):
        """Reference layout + content parity (xcorr/scripts/psd.py:66-100):
        one file per (pair, period) at root/psd/pair/pair.yyyy.doy.hhh
        .psd.nc carrying BOTH the trimmed psd and the period's snr."""
        from xcorr_tpu.scripts import (snr as snr_script,
                                       ct as ct_script,
                                       psd as psd_script)
        out_snr = str(tmp_path / "snr.nc")
        rc = snr_script.main([
            "2014-01-01", "2014-01-02", "--root", archive,
            "--celerity", "1400", "90000000", "--filter-freq", "0.5",
            "--out", out_snr, "--institution", "t", "--author", "t",
            "--source", "t", "-n", "2"])
        assert rc == 0
        out_ct = str(tmp_path / "ct.nc")
        rc = ct_script.main([out_snr, "--threshold", "0.0001",
                             "--out", out_ct])
        assert rc == 0
        outdir = str(tmp_path / "out")
        rc = psd_script.main([
            out_ct, "--root", archive, "--outdir", outdir,
            "--celerity", "1400", "90000000", "--filter-freq", "0.5",
            "--duration", "10.0", "--padding-factor", "2",
            "--fmax", "2.0", "--pair", PAIRS[0], "-n", "1"])
        assert rc == 0
        files = glob.glob(os.path.join(outdir, "psd", PAIRS[0],
                                       PAIRS[0] + ".*.psd.nc"))
        assert files, "no per-(pair,period) psd files written"
        ds = xcorr_tpu.io.from_netcdf(files[0])
        assert "psd" in ds and "snr" in ds
        assert float(ds.coords["freq"].values.max()) <= 2.0


class TestTimelapse:
    def test_timelapse_small(self, archive):
        from xcorr_tpu.scripts.timelapse import timelapse
        times = pd.DatetimeIndex([pd.Timestamp("2014-01-01"),
                                  pd.Timestamp("2014-01-02")])
        ds = timelapse(PAIRS[:1], times, archive,
                       freq_bands=((0.4, 1.0), (1.0, 2.0)),
                       clim=(1400.0, 90_000_000.0), duration=10.0,
                       filter_kwargs={"frequency": 0.5,
                                      "btype": "highpass", "order": 2},
                       verb=0)
        assert ds["cc2"].dims == ("pair", "freq", "time1", "time2")
        st = ds["status"].values
        assert st.sum() > 0
        # symmetric mirror applied
        v = ds["cc2"].values[0, 0]
        assert np.isfinite(v).any()
        np.testing.assert_allclose(v, v.T, equal_nan=True)
        # diagonal cells are self-correlations: peak 1 at zero offset
        d = np.diagonal(ds["cc2"].values[0, 0])
        np.testing.assert_allclose(d[np.isfinite(d)], 1.0, atol=1e-4)


class TestBeamformScript:
    def test_beamform_day(self, archive):
        from xcorr_tpu.scripts.beamform import beamform_day
        ds = beamform_day(PAIRS, pd.Timestamp("2014-01-01"), archive,
                          _inventory(), clim=(1400.0, 90_000_000.0),
                          attrs=ATTRS,
                          filter_kwargs={"frequency": 0.5,
                                         "btype": "highpass", "order": 2})
        assert ds is not None
        for var in ("s_x", "s_y", "doa", "vel", "err"):
            assert var in ds
        assert np.isfinite(ds["doa"].values).all()


class TestSwresp:
    def test_swresp_spectrum(self, archive):
        # use two of the pair shards as stand-ins for Z/R components
        from xcorr_tpu.scripts.swresp import swresp_day
        ds = swresp_day(PAIRS[0], PAIRS[1], pd.Timestamp("2014-01-01"),
                        archive, clim=(1400.0, 90_000_000.0), attrs=ATTRS,
                        filter_kwargs={"frequency": 0.5,
                                       "btype": "highpass", "order": 2})
        assert ds is not None
        assert "ratio" in ds and "phase" in ds
        assert ds["ratio"].dims == ("time", "freq")
        assert np.isfinite(ds["ratio"].values).all()


class TestPlmaxScript:
    def test_plmax_day(self, archive):
        from xcorr_tpu.scripts.plmax import plmax_day
        df = plmax_day(PAIRS[0], pd.Timestamp("2014-01-01"), archive,
                       clim=(1400.0, 90_000_000.0), min_distance=5,
                       duration=10.0,
                       filter_kwargs={"frequency": 0.5,
                                      "btype": "highpass", "order": 2})
        assert df is not None
        assert "value" in df.columns and len(df) > 0


class TestPlatformPolicy:
    def test_analysis_pins_cpu_on_tunneled_runtime(self, monkeypatch):
        """Analysis CLIs pin the cpu backend when the only device path
        is a tunneled runtime and no platform was given; an explicit
        --platform always wins; correlate workloads are untouched."""
        import argparse
        import jax._src.xla_bridge as xb
        from xcorr_tpu.scripts import utils as sutils

        pinned = []
        import jax
        monkeypatch.setattr(
            jax.config, "update",
            lambda k, v: pinned.append((k, v)) if k == "jax_platforms"
            else None)
        monkeypatch.setattr(xb, "_backend_factories",
                            {"cpu": None, "axon": None})
        ns = argparse.Namespace(platform=None, nworkers=1, debug=False)
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        sutils.init_compute(ns, workload="analysis")
        assert pinned == [("jax_platforms", "cpu")]

        pinned.clear()
        sutils.init_compute(ns, workload="correlate")
        assert pinned == []

        pinned.clear()
        ns.platform = "tpu"
        sutils.init_compute(ns, workload="analysis")
        assert pinned == [("jax_platforms", "tpu")]

        # no tunneled runtime registered -> analysis stays on default
        pinned.clear()
        ns.platform = None
        monkeypatch.setattr(xb, "_backend_factories", {"cpu": None,
                                                       "tpu": None})
        sutils.init_compute(ns, workload="analysis")
        assert pinned == []


class TestCliMains:
    """End-to-end main() coverage for the remaining console scripts."""

    def test_beamform_main(self, archive, tmp_path):
        from xcorr_tpu.scripts import beamform
        inv_json = str(tmp_path / "inv.json")
        _inventory().to_json(inv_json)
        out = str(tmp_path / "bf.nc")
        rc = beamform.main([
            "2014-01-01", "2014-01-02", "--root", archive,
            "--pair", PAIRS[0], "--pair", PAIRS[1], "--pair", PAIRS[2],
            "--inventory", inv_json, "--filter-freq", "0.5",
            "--celerity", "1400", "90000000", "--out", out,
            "--institution", "t", "--author", "t", "--source", "t"])
        assert rc == 0 and os.path.exists(out)
        bf = xcorr_tpu.io.from_netcdf(out)
        assert "doa" in bf

    def test_timelapse_main(self, archive, tmp_path):
        from xcorr_tpu.scripts import timelapse
        out = str(tmp_path / "tl.nc")
        rc = timelapse.main([
            "all", "--start", "2014-01-01", "--end", "2014-01-02",
            "--root", archive, "--pair", PAIRS[0],
            "--freq", "0.4", "1.0", "--filter-freq", "0.5",
            "--duration", "10.0",
            "--celerity", "1400", "90000000", "--out", out,
            "--institution", "t", "--author", "t", "--source", "t"])
        assert rc == 0 and os.path.exists(out)
        tl = xcorr_tpu.io.from_netcdf(out)
        assert "cc2" in tl

    def test_plmax_main(self, archive, tmp_path):
        from xcorr_tpu.scripts import plmax
        out = str(tmp_path / "plmax.csv")
        rc = plmax.main([
            "2014-01-01", "2014-01-02", "--root", archive,
            "--pair", PAIRS[0], "--celerity", "1400", "90000000",
            "--min-distance", "5", "--filter-freq", "0.5", "--out", out])
        assert rc == 0 and os.path.exists(out)


class TestTimelapseMesh:
    def test_cells_shard_over_mesh(self, archive):
        """P2: timelapse cell batches shard over the 8-device CPU mesh."""
        import jax
        from xcorr_tpu.parallel import make_mesh
        from xcorr_tpu.scripts.timelapse import timelapse
        assert len(jax.devices()) == 8
        times = pd.DatetimeIndex([pd.Timestamp("2014-01-01"),
                                  pd.Timestamp("2014-01-02")])
        ds = timelapse(PAIRS[:1], times, archive,
                       freq_bands=((0.4, 1.0),),
                       clim=(1400.0, 90_000_000.0), duration=10.0,
                       filter_kwargs={"frequency": 0.5,
                                      "btype": "highpass", "order": 2},
                       mesh=make_mesh(8), verb=0)
        assert (ds["status"].values > 0).sum() > 0


class TestTimelapseInitUpdate:
    def test_init_then_update(self, archive, tmp_path):
        from xcorr_tpu.scripts import timelapse as tl
        out = str(tmp_path / "tl_init.nc")
        # --init writes the empty (time1, time2) scaffold
        rc = tl.main(["all", "--start", "2014-01-01", "--end", "2014-01-02",
                      "--root", archive, "--pair", PAIRS[0],
                      "--freq", "0.4", "1.0", "--init", "--out", out,
                      "--institution", "t", "--author", "t",
                      "--source", "t"])
        assert rc == 0 and os.path.exists(out)
        scaffold = xcorr_tpu.io.from_netcdf(out)
        assert (scaffold["status"].values == 0).all()
        # full run with --update merges into the existing file
        out2 = str(tmp_path / "tl_full.nc")
        rc = tl.main(["all", "--start", "2014-01-01", "--end", "2014-01-02",
                      "--root", archive, "--pair", PAIRS[0],
                      "--freq", "0.4", "1.0", "--filter-freq", "0.5",
                      "--duration", "10.0",
                      "--celerity", "1400", "90000000",
                      "--update", out, "--out", out2,
                      "--institution", "t", "--author", "t",
                      "--source", "t"])
        assert rc == 0 and os.path.exists(out2)
        merged = xcorr_tpu.io.from_netcdf(out2)
        assert (merged["status"].values > 0).any()
