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
import contextlib
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def _sync(x):
    np.asarray(x)
    return x


@contextlib.contextmanager
def _evidence(holder: dict):
    """When XCORR_BENCH_EVIDENCE=1, run the wrapped measured region
    under a jax.profiler trace and record device-busy seconds, launch
    count and host process-CPU into ``holder`` (VERDICT r4 ask #4:
    device evidence for the analysis configs, replacing the stale
    round-2 wall-through-the-tunnel numbers)."""
    if os.environ.get("XCORR_BENCH_EVIDENCE") != "1":
        yield
        return
    import shutil
    import tempfile
    from xcorr_tpu.util.profiler import parse_device_trace, trace
    logdir = tempfile.mkdtemp(prefix="xc_evidence_")
    try:
        c0 = time.process_time()
        with trace(logdir):
            yield
        holder["host_cpu_s"] = round(time.process_time() - c0, 3)
        holder.update(parse_device_trace(logdir) or {})
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def _project(res, evidence, items, unit):
    """Real-TPU-host projection from the measured parts: the tunnel's
    per-launch RTT + wire stalls vanish on PCIe, leaving
    max(host CPU, device busy + launches x ~100us dispatch)."""
    if not evidence or "device_busy_s" not in evidence:
        if evidence:
            res["device_evidence"] = evidence
        return
    proj_s = max(evidence.get("host_cpu_s", 0.0),
                 evidence["device_busy_s"]
                 + evidence["launches"] * 1e-4)
    evidence["projected_real_host_s"] = round(proj_s, 3)
    if proj_s > 0:
        evidence["projected_real_host_value"] = round(items / proj_s, 3)
        evidence["projected_unit"] = unit
    res["device_evidence"] = evidence


def bench_cc(small):
    import jax
    import jax.numpy as jnp
    from xcorr_tpu import ops

    n = 432_000 if small else 4_320_000
    B = 8 if small else 16
    imin, imax = n - 1, n - 1 + (162_000 if small else 1_620_000)
    # generate ON device (host-side day-scale buffers pay GB-scale
    # first-touch faults + a ~70 s tunnel h2d; timing is
    # value-independent) and hand the kernel stage-A-geometry buffers
    # (pre-padded dispatch) exactly like bench.measure_device
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.jit(lambda k: jax.random.normal(k, (B, n), jnp.float32))(kx)
    y = jax.jit(lambda k: jax.random.normal(k, (B, n), jnp.float32))(ky)
    kw = {}
    plen = ops.cc.preferred_padded_len(n)
    if plen is not None:
        padf = jax.jit(lambda a: jnp.pad(a, ((0, 0), (0, plen - n))))
        x, y = padf(x), padf(y)
        kw = {"pre_padded_n": n}
    _sync(x), _sync(y)
    iters = 5

    # dependency-chained fori inside ONE dispatch: per-call tunnel
    # latency and d2h of the 100 MB result would otherwise dominate
    # (measured 0.8 vs 110 pair-days/s!)
    @jax.jit
    def loop(x, y):
        def body(_, carry):
            xi, acc = carry
            r = ops.cc.correlate(xi, y, index_min=imin, index_max=imax,
                                 **kw)
            return xi + r[0, 0] * 1e-30, acc + r[0, 0]
        _, acc = jax.lax.fori_loop(0, iters, body, (x, 0.0))
        return acc

    np.asarray(loop(x, y))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(x, y))
        best = min(best, (time.time() - t0) / iters)
    pair_days = (B * n) / (8 * 4_320_000)
    return {"config": "cc", "value": round(pair_days / best, 3),
            "unit": "pair-days/s"}


def bench_pipeline(small):
    """Multi-pair batch with the full SEED preprocessing chain through
    the PRODUCTION engine (device_process): each receiver's raw span
    ships to the device once, the overlapping windows slice on device,
    and the three pairs' windows stack into one correlate launch.
    (The window-stack FusedPipeline API measures the tunnel instead —
    every raw sample crosses host->device 8x at production overlap.)"""
    import pandas as pd
    import xcorr_tpu
    from xcorr_tpu import ndlabel
    from xcorr_tpu.parallel import device_process
    from xcorr_tpu.stream import Channel, Inventory, SyntheticClient

    fs = 10.0 if small else 50.0
    window = 1800.0 if small else 86400.0
    overlap = 0.5 if small else 21.0 / 24.0
    pre = {"EDH": [
        ("detrend", {"type": "demean"}),
        ("remove_sensitivity", {"sensitivity": 1e9}),
        ("filter", {"type": "bandpass", "freqmin": 0.05,
                    "freqmax": 0.4 * fs}),
        ("detrend", {"type": "demean"}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ]}
    stations = ["H03S1", "H03S2", "H03S3", "H03S4"]
    inv = Inventory([
        Channel("IM", s, "", "EDH", latitude=-33.6 - 0.01 * i,
                longitude=-78.8 - 0.01 * i)
        for i, s in enumerate(stations)])
    client = SyntheticClient(
        sampling_rate=fs,
        delays={f"IM.{s}..EDH": 0.4 * i for i, s in enumerate(stations)},
        source_period=600.0, source_amplitude=20.0)
    pairs = [f"IM.H03S1..EDH-IM.{s}..EDH" for s in stations[1:]]

    def make(day):
        parts = [xcorr_tpu.init(
            pair=p, starttime=day, endtime=day + pd.Timedelta("1D"),
            preprocess=pre,
            attrs={"institution": "b", "author": "b", "source": "s"},
            sampling_rate=fs, window_length=window,
            window_overlap=overlap,
            clip_lag=(0.0, window * 0.375), inventory=inv,
            unbiased_cc=False) for p in pairs]
        return ndlabel.concat(parts, "pair")

    ds = make(pd.Timestamp("2014-01-01"))
    device_process(ds, client=client, inventory=inv, verb=0)  # compile
    assert (ds["status"].values == 1).all()
    ds = make(pd.Timestamp("2014-01-02"))
    t0 = time.time()
    device_process(ds, client=client, inventory=inv, verb=0)
    dt = time.time() - t0
    assert (ds["status"].values == 1).all()
    pair_days = len(pairs) * window / 86400.0
    return {"config": "pipeline", "value": round(pair_days / dt, 3),
            "unit": "pair-days/s (multi-pair engine, incl. IO)"}


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
    ev = {}
    t0 = time.time()
    with _evidence(ev):
        out = [estimate_snr_for_day(
            pairs, d, tmp, celerity=(1400.0, 9e7), filter_kwargs=fk,
            attrs={"institution": "b", "author": "b", "source": "b"})
            for d in times]
        out = [o for o in out if o is not None]
        merged = ndlabel.combine_by_coords(out)
        ct = coincidence_trigger(merged["snr"], thr_on=0.01, dim="time")
    dt = time.time() - t0
    assert "nperiods" in ct.attrs
    res = {"config": "snr_ct",
           "value": round(len(pairs) * ndays / dt, 3),
           "unit": "pair-days/s (incl. IO)"}
    _project(res, ev, len(pairs) * ndays, "pair-days/s")
    return res


def bench_beamform(small):
    import tempfile
    from xcorr_tpu.scripts.beamform import beamform_day

    ndays = 2 if small else 10
    tmp = tempfile.mkdtemp()
    pairs, times, inv = _make_archive(tmp, ndays)
    fk = {"frequency": 0.5, "btype": "highpass", "order": 2}
    ev = {}
    t0 = time.time()
    with _evidence(ev):
        done = 0
        for d in times:
            ds = beamform_day(pairs, d, tmp, inv, clim=(1400.0, 9e7),
                              filter_kwargs=fk)
            done += ds is not None
    dt = time.time() - t0
    res = {"config": "beamform", "value": round(done / dt, 3),
           "unit": "array-days/s (incl. IO)"}
    _project(res, ev, done, "array-days/s")
    return res


def bench_timelapse(small):
    import tempfile
    import pandas as pd
    from xcorr_tpu.scripts.timelapse import timelapse

    ndays = 3 if small else 20
    tmp = tempfile.mkdtemp()
    pairs, times, _ = _make_archive(tmp, ndays)
    fk = {"frequency": 0.5, "btype": "highpass", "order": 2}
    ev = {}
    t0 = time.time()
    with _evidence(ev):
        ds = timelapse(pairs[:1], pd.DatetimeIndex(times), tmp,
                       freq_bands=((0.4, 1.0), (1.0, 2.0)),
                       clim=(1400.0, 9e7), duration=10.0,
                       filter_kwargs=fk, verb=0)
    dt = time.time() - t0
    cells = int((ds["status"].values > 0).sum())
    res = {"config": "timelapse", "value": round(cells / dt, 3),
           "unit": "2D-CC cells/s (incl. IO)"}
    _project(res, ev, cells, "cells/s")
    return res


BENCHES = {
    "cc": bench_cc,
    "pipeline": bench_pipeline,
    "snr_ct": bench_snr_ct,
    "beamform": bench_beamform,
    "timelapse": bench_timelapse,
}

#: per-config workload class, mirroring the CLIs' init_compute policy:
#: derived-analysis workloads are per-op dispatch/transfer bound through
#: a TUNNELED device runtime (same-session: snr_ct 11.1 cpu vs 0.76
#: tunneled-tpu pair-days/s, timelapse 78 vs ~8 cells/s, beamform 1.07
#: vs 0.31) while the correlation engine's day-scale batches win on the
#: device (pipeline 0.25-0.37 tpu vs 0.05 cpu)
WORKLOADS = {
    "cc": "correlate",
    "pipeline": "correlate",
    "snr_ct": "analysis",
    "beamform": "analysis",
    "timelapse": "analysis",
}

#: one-line provenance for the artifact: round 2 recorded the analysis
#: configs THROUGH the tunneled device runtime; round 3+ pins them to
#: the cpu backend (the CLIs' init_compute policy). Cross-round jumps
#: on these configs (e.g. snr_ct 0.64 -> 33) are the PLATFORM POLICY
#: change, not kernel optimization — the per-config
#: ``tunneled_tpu_measured`` field keeps the other platform's
#: same-session number for honest comparison.
POLICY_NOTE = ("analysis configs run on the cpu backend when a tunneled "
               "device runtime is registered (workload-aware policy, "
               "round 3); round-2 records for snr_ct/beamform/timelapse "
               "were measured through the tunneled tpu — see each "
               "result's tunneled_tpu_measured")

#: same-session A/B numbers through the tunneled v5e-1 (the platform
#: the policy moved these configs OFF; units match each config's
#: headline metric)
TUNNELED_TPU_MEASURED = {
    "snr_ct": {"value": 0.76, "unit": "pair-days/s"},
    "beamform": {"value": 0.31, "unit": "pair-days/s"},
    "timelapse": {"value": 8.0, "unit": "cells/s"},
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

    from xcorr_tpu.util.sysmem import (enable_persistent_compile_cache,
                                       malloc_heap_reuse)
    malloc_heap_reuse()
    enable_persistent_compile_cache()

    names = list(BENCHES) if args.config == "all" else [args.config]

    def resolve_platform(name):
        """Explicit --platform wins; otherwise analysis configs pin the
        cpu backend when a tunneled device runtime is registered
        (the CLIs' init_compute policy — see WORKLOADS)."""
        if args.platform:
            return args.platform
        from xcorr_tpu.util.xfer import tunneled_runtime_registered
        if WORKLOADS[name] == "analysis" and tunneled_runtime_registered():
            return "cpu"
        return None

    plats = {n: resolve_platform(n) for n in names}
    if len(set(plats.values())) > 1:
        # mixed per-config platforms: the backend can only be pinned
        # before first use, so run one subprocess per config and merge
        import subprocess
        import sys
        small = args.small
        if small is None:
            # full scale whenever a real device runtime is registered
            import jax._src.xla_bridge as xb
            small = not any(n != "cpu" for n in xb._backend_factories)
        results = []
        for name in names:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--config", name, "--small" if small else "--full"]
            if plats[name]:
                cmd += ["--platform", plats[name]]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            lines = [ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")]
            if not lines:
                print(f"config {name} failed: {proc.stderr[-400:]}",
                      flush=True)
                continue
            res = json.loads(lines[-1])
            results.append(res)
            print(json.dumps(res), flush=True)
    else:
        import jax
        plat = plats[names[0]]
        if plat:
            jax.config.update("jax_platforms", plat)
        small = args.small
        if small is None:
            small = jax.devices()[0].platform == "cpu"
        results = []
        for name in names:
            res = BENCHES[name](small)
            res["small"] = small
            res["platform"] = jax.devices()[0].platform
            results.append(res)
            print(json.dumps(res), flush=True)

    if args.save:
        import datetime
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_latest.json")
        merged = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    for r in json.load(f).get("results", []):
                        merged[r["config"]] = r
            except Exception:
                pass
        for r in results:
            prev = merged.get(r["config"])
            if (prev is not None and r.get("device_evidence")
                    and r.get("platform") not in (None, "cpu")
                    and prev.get("platform") == "cpu"):
                # a tpu evidence run measured THROUGH the tunnel: keep
                # the cpu-policy headline, attach the device evidence
                # (busy seconds, launches, real-host projection) plus
                # the tunneled wall value to the existing record
                prev["tpu_evidence"] = {
                    "tunneled_value": r["value"], "unit": r["unit"],
                    **r["device_evidence"]}
                prev.pop("tunneled_tpu_measured", None)
            else:
                if (prev is not None and "tpu_evidence" in prev
                        and "tpu_evidence" not in r):
                    # a refreshed cpu headline must not drop the
                    # previously captured device evidence
                    r["tpu_evidence"] = prev["tpu_evidence"]
                if (prev is None and r.get("device_evidence")
                        and r.get("platform") not in (None, "cpu")):
                    # evidence run with no cpu headline to attach to
                    # (fresh/corrupt results file): never present the
                    # tunneled wall as a policy headline
                    r["note"] = ("tunneled-wall evidence run; the "
                                 "policy headline (cpu backend) has "
                                 "not been recorded yet")
                merged[r["config"]] = r
        for name, r in merged.items():
            # analysis configs measured on cpu carry the other
            # platform's same-session number so cross-round readers see
            # the policy discontinuity, not a phantom 50x optimization
            if (r.get("platform") == "cpu"
                    and name in TUNNELED_TPU_MEASURED
                    and "tpu_evidence" not in r):
                r.setdefault("tunneled_tpu_measured",
                             TUNNELED_TPU_MEASURED[name])
        plat_set = {r.get("platform") for r in merged.values()
                    if r.get("platform")}
        with open(path, "w") as f:
            json.dump({
                # per-result "platform" is authoritative; the header
                # summarizes (mixed = workload-aware backend policy)
                "platform": (plat_set.pop() if len(plat_set) == 1
                             else "mixed"),
                "policy": POLICY_NOTE,
                "recorded": datetime.datetime.now(
                    datetime.timezone.utc).isoformat(timespec="seconds"),
                "results": [merged[k] for k in BENCHES if k in merged],
            }, f, indent=1)
        print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()
