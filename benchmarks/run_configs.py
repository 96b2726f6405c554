#!/usr/bin/env python
"""Per-config benchmarks mirroring BASELINE.json's five workloads.

Prints one JSON line per config. ``--small`` (default on CPU) shrinks the
shapes so the suite runs anywhere; ``--full`` uses production scale.

Configs (BASELINE.json):
  1. cc        single-pair daily CCF (batched rfft->conj·mul->irfft)
  2. pipeline  multi-pair batch with the full SEED preprocessing chain
  3. snr_ct    SNR estimation + coincidence triggering over a month
  4. beamform  plane-wave beamforming across a receiver array
  5. timelapse 2-D CC of spectrograms on the (time1, time2) plane
"""
import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def _sync(x):
    np.asarray(x)
    return x


def bench_cc(small):
    import jax.numpy as jnp
    from xcorr_tpu import ops

    n = 432_000 if small else 4_320_000
    B = 8 if small else 16
    imin, imax = n - 1, n - 1 + (162_000 if small else 1_620_000)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    fn = lambda: ops.cc.correlate(x, y, index_min=imin, index_max=imax)  # noqa
    _sync(fn())
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    _sync(r)
    dt = (time.time() - t0) / iters
    pair_days = (B * n) / (8 * 4_320_000)
    return {"config": "cc", "value": round(pair_days / dt, 3),
            "unit": "pair-days/s"}


def bench_pipeline(small):
    from xcorr_tpu.parallel import FusedPipeline

    fs_raw = 250.0
    dur = 1800.0 if small else 86400.0
    npts_raw = int(dur * fs_raw)
    npts = int(dur * 50.0) - 100
    ops_list = [
        ("detrend", {"type": "demean"}),
        ("remove_sensitivity", {"sensitivity": 1e9}),
        ("filter", {"type": "bandpass", "freqmin": 3.0, "freqmax": 20.0}),
        ("decimate", {"factor": 5}),
        ("detrend", {"type": "demean"}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ]
    B = 4 if small else 8
    pipe = FusedPipeline(ops_list, ops_list, npts_raw, fs_raw, npts_raw,
                         fs_raw, npts, index_min=npts - 1,
                         index_max=npts - 1 + npts // 4)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, npts_raw)).astype(np.float32)
    y = rng.normal(size=(B, npts_raw)).astype(np.float32)
    pipe(x, y)
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        pipe(x, y)
    dt = (time.time() - t0) / iters
    windows_per_s = B / dt
    return {"config": "pipeline", "value": round(windows_per_s, 3),
            "unit": "preprocessed+correlated windows/s"}


def _make_archive(tmp, ndays, fs=5.0):
    import pandas as pd
    import xcorr_tpu
    from xcorr_tpu.stream import Channel, Inventory, SyntheticClient

    pre = {c: [("detrend", {"type": "demean"}),
               ("filter", {"type": "bandpass", "freqmin": 0.3,
                           "freqmax": 2.0})] for c in ("EDH", "BHZ")}
    inv = Inventory([
        Channel("IM", "H03S1", "", "EDH", latitude=-33.6, longitude=-78.8),
        Channel("IM", "H03S2", "", "EDH", latitude=-33.62,
                longitude=-78.82),
        Channel("IM", "H03S3", "", "EDH", latitude=-33.61,
                longitude=-78.78),
        Channel("IU", "RAR", "10", "BHZ", latitude=-21.2,
                longitude=-159.8),
    ])
    client = SyntheticClient(
        sampling_rate=fs,
        delays={"IM.H03S2..EDH": 0.3, "IM.H03S3..EDH": 0.6,
                "IU.RAR.10.BHZ": 4.0},
        source_period=600.0, source_amplitude=20.0)
    pairs = ["IM.H03S1..EDH-IU.RAR.10.BHZ", "IM.H03S2..EDH-IU.RAR.10.BHZ",
             "IM.H03S3..EDH-IU.RAR.10.BHZ"]
    times = pd.date_range("2014-01-01", periods=ndays, freq="1D")
    init_args = dict(preprocess=pre,
                     attrs={"institution": "bench", "author": "bench",
                            "source": "synthetic"},
                     sampling_rate=fs, window_length=3600.0,
                     window_overlap=0.5, clip_lag=(-100.0, 100.0),
                     inventory=inv)
    xcorr_tpu.lazy_process(pairs, times, init_args, client, inventory=inv,
                           root=tmp, nworkers=8, verb=0)
    return pairs, times, inv


def bench_snr_ct(small):
    import tempfile
    import pandas as pd
    from xcorr_tpu.scripts.snr import estimate_snr_for_day
    from xcorr_tpu.signal.trigger import coincidence_trigger
    from xcorr_tpu import ndlabel

    ndays = 3 if small else 30
    tmp = tempfile.mkdtemp()
    pairs, times, _ = _make_archive(tmp, ndays)
    fk = {"frequency": 0.5, "btype": "highpass", "order": 2}
    t0 = time.time()
    out = [estimate_snr_for_day(
        pairs, d, tmp, celerity=(1400.0, 9e7), filter_kwargs=fk,
        attrs={"institution": "b", "author": "b", "source": "b"})
        for d in times]
    out = [o for o in out if o is not None]
    merged = ndlabel.combine_by_coords(out)
    ct = coincidence_trigger(merged["snr"], thr_on=0.01, dim="time")
    dt = time.time() - t0
    assert "nperiods" in ct.attrs
    return {"config": "snr_ct",
            "value": round(len(pairs) * ndays / dt, 3),
            "unit": "pair-days/s (incl. IO)"}


def bench_beamform(small):
    import tempfile
    from xcorr_tpu.scripts.beamform import beamform_day

    ndays = 2 if small else 10
    tmp = tempfile.mkdtemp()
    pairs, times, inv = _make_archive(tmp, ndays)
    fk = {"frequency": 0.5, "btype": "highpass", "order": 2}
    t0 = time.time()
    done = 0
    for d in times:
        ds = beamform_day(pairs, d, tmp, inv, clim=(1400.0, 9e7),
                          filter_kwargs=fk)
        done += ds is not None
    dt = time.time() - t0
    return {"config": "beamform", "value": round(done / dt, 3),
            "unit": "array-days/s (incl. IO)"}


def bench_timelapse(small):
    import tempfile
    import pandas as pd
    from xcorr_tpu.scripts.timelapse import timelapse

    ndays = 3 if small else 20
    tmp = tempfile.mkdtemp()
    pairs, times, _ = _make_archive(tmp, ndays)
    fk = {"frequency": 0.5, "btype": "highpass", "order": 2}
    t0 = time.time()
    ds = timelapse(pairs[:1], pd.DatetimeIndex(times), tmp,
                   freq_bands=((0.4, 1.0), (1.0, 2.0)),
                   clim=(1400.0, 9e7), duration=10.0, filter_kwargs=fk,
                   verb=0)
    dt = time.time() - t0
    cells = int((ds["status"].values > 0).sum())
    return {"config": "timelapse", "value": round(cells / dt, 3),
            "unit": "2D-CC cells/s (incl. IO)"}


BENCHES = {
    "cc": bench_cc,
    "pipeline": bench_pipeline,
    "snr_ct": bench_snr_ct,
    "beamform": bench_beamform,
    "timelapse": bench_timelapse,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=list(BENCHES) + ["all"],
                    default="all")
    ap.add_argument("--small", action="store_true", default=None)
    ap.add_argument("--full", dest="small", action="store_false")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--save", action="store_true",
                    help="also record results into results_latest.json "
                         "next to this script (bench.py inlines it into "
                         "the driver artifact)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    small = args.small
    if small is None:
        small = jax.devices()[0].platform == "cpu"

    names = list(BENCHES) if args.config == "all" else [args.config]
    results = []
    for name in names:
        res = BENCHES[name](small)
        res["small"] = small
        results.append(res)
        print(json.dumps(res), flush=True)

    if args.save:
        import datetime
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_latest.json")
        with open(path, "w") as f:
            json.dump({
                "platform": jax.devices()[0].platform,
                "recorded": datetime.datetime.now(
                    datetime.timezone.utc).isoformat(timespec="seconds"),
                "results": results,
            }, f, indent=1)
        print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()
