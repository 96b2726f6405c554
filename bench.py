#!/usr/bin/env python
"""xcorr-tpu headline benchmark: CCF pair-days/sec/chip at 50 Hz.

The canonical production workload (BASELINE.md): 24 h @ 50 Hz windows
(npts = 4,320,000), 8 windows per pair-day (3 h shift), lag clipped to
0..9 h (1,620,000 samples stored), normalized frequency-domain
cross-correlation. One "unit" = one pair-day = one batch of 8 windows
through the fused four-step Pallas correlation kernel.

vs_baseline compares against the reference's compute path: numpy fft
(the reference's backend when pyFFTW is absent, xcorr/util/cc.py:12-15)
running one window on one host core, scaled to a pair-day. The
reference constant is measured once and cached in
``benchmarks/ref_cpu.json`` (it is a property of this host, not of the
framework under test), re-measured only when the cache is absent.

Architecture (round 4): the benchmark is an ORCHESTRATOR. Every
section that touches the device runs in a budgeted SUBPROCESS; the
parent is pure Python (no device RPCs), so it can always respond to
signals and deadlines. Results merge into one artifact dict that is

* written to ``benchmarks/bench_partial.json`` after EVERY completed
  section, and
* printed as the single stdout JSON line at exit — on normal
  completion, on the overall deadline (``XCORR_BENCH_DEADLINE``,
  default 2400 s), on SIGTERM/SIGINT (the driver's ``timeout`` sends
  SIGTERM), or from the atexit hook.

A tunnel stall therefore costs only the section it hit: everything
measured before it still lands in the artifact (round 3 lost the
entire run to one stall — BENCH_r03.json rc=124, parsed null).
Children stream ``@@BENCH@@ {json}`` marker lines so that even a
section killed MID-measurement contributes its partial numbers
(subprocess timeout delivers the captured partial stdout).

Artifact fields:
  ms_per_batch {min, median, runs}  tunnel timing variance is large
                                    (38-60 ms same binary measured), so
                                    min AND median are recorded
  roofline_pct      achieved bytes/s (four-step traffic model) as % of
                    the MEASURED practical HBM streaming ceiling on this
                    chip (417 GB/s, pure-copy Pallas kernel through the
                    axon tunnel)
  roofline_pct_peak same, against the v5e-1 nominal HBM peak (819 GB/s)
  e2e               lazy_process(engine='device') pair-days/s INCLUDING
                    all IO (synthetic archive -> device chains -> zlib
                    netCDF shard), a v5e-8 projection against the
                    <60 s/pair-year north star, the measured
                    writer-drain tail, the measured end-to-end CCF
                    quantization error (wire codec + storage), and the
                    8-device-mesh host cost per pair-day
  sections          per-section status (ok / timeout / error / skipped)
                    with wall seconds — the run's own flight recorder
"""
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

# persistent compilation cache: repeated bench runs (and the budgeted
# section subprocesses) skip the multi-minute AOT compile of the
# day-scale kernels
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

HBM_STREAM_GBPS = 417.0   # measured pure-copy ceiling, v5e-1 via tunnel
HBM_PEAK_GBPS = 819.0     # v5e-1 nominal

_REPO = os.path.dirname(os.path.abspath(__file__))
_REF_CACHE = os.path.join(_REPO, "benchmarks", "ref_cpu.json")
_PARTIAL = os.path.join(_REPO, "benchmarks", "bench_partial.json")
_MARK = "@@BENCH@@ "


def _mark(d: dict):
    """Child-side: stream a partial-result marker the orchestrator
    merges even if this section is killed before finishing."""
    print(_MARK + json.dumps(d), flush=True)


def _enable_compile_cache():
    # util.sysmem scopes the dir by the jaxlib build: AOT entries from
    # a different build crash on load (SIGILL-class; see sysmem
    # docstring) — never share them. Default the dir when the caller
    # didn't: without it the persistent cache silently disables and
    # every section pays cold compiles (minutes through the tunnel)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        from xcorr_tpu.util.sysmem import enable_persistent_compile_cache
        enable_persistent_compile_cache()
    except Exception:
        pass


def _heap_reuse():
    # keep day-scale numpy buffers on the reusable heap — fresh
    # mmap-backed buffers fault in at ~16 MB/s on this microVM host
    try:
        from xcorr_tpu.util.sysmem import malloc_heap_reuse
        malloc_heap_reuse()
    except Exception:
        pass


# ---------------------------------------------------------------------
# measurement sections (each runs in a budgeted child via --section)
# ---------------------------------------------------------------------

def measure_device(n, B, imin, imax, iters=10, repeats=5, mark=False):
    """Steady-state seconds per batch on the active JAX backend.

    The iterations run inside ONE jitted lax.fori_loop with a data
    dependency between them (the first output element folds into the
    next input), so (a) an asynchronous runtime cannot overlap or elide
    executions and (b) per-dispatch host/tunnel latency is excluded —
    this measures the sustained on-chip rate (a Python dispatch loop
    reads ~10% slower through the axon tunnel). Returns every repeat's
    per-iteration time; tunnel variance makes single numbers unreliable.
    """
    import jax
    import jax.numpy as jnp
    from xcorr_tpu import ops

    # generate inputs ON DEVICE: host-side generation of the B=80 day
    # arrays (2 x 1.4 GB) pays GB-scale first-touch page faults on this
    # microVM (minutes, intermittent) plus a ~70 s tunnel transfer —
    # none of which belongs in a kernel benchmark (timing is
    # value-independent)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.jit(lambda k: jax.random.normal(k, (B, n), jnp.float32))(kx)
    y = jax.jit(lambda k: jax.random.normal(k, (B, n), jnp.float32))(ky)
    x.block_until_ready(), y.block_until_ready()

    # day-scale accelerator path: hand the kernel stage-A-geometry
    # buffers (zero tail), matching the production pipeline where the
    # window stack materializes at padded length inside the fused jit.
    # The zero-extension pass it skips is a full read+write of every
    # window that the four-step never needed (ops.fft4.padded_len).
    kw = {}
    plen = ops.cc.preferred_padded_len(n)
    if plen is not None:
        padf = jax.jit(lambda a: jnp.pad(a, ((0, 0), (0, plen - n))))
        x, y = padf(x), padf(y)
        x.block_until_ready(), y.block_until_ready()
        kw = {"pre_padded_n": n}

    @jax.jit
    def loop(x, y):
        def body(_, carry):
            xi, acc = carry
            r = ops.cc.correlate(xi, y, index_min=imin, index_max=imax,
                                 **kw)
            # the 1e-30 chaining perturbation also lands on the padded
            # tail; at f32 it is ~23 orders below the signal and does
            # not disturb the zero-tail premise
            return xi + r[0, 0] * 1e-30, acc + r[0, 0]
        _, acc = jax.lax.fori_loop(0, iters, body, (x, 0.0))
        return acc

    np.asarray(loop(x, y))  # compile + warmup
    if mark:
        _mark({"kernel_compiled": True})
    times = []
    for _ in range(repeats):
        t0 = time.time()
        np.asarray(loop(x, y))
        times.append((time.time() - t0) / iters)
        if mark:
            # stream every repeat: a mid-measurement kill still leaves
            # the repeats so far in the artifact
            _mark({"kernel_times_s": times})
    return times


def measure_fast_mode(n, B, imin, imax, iters=10, repeats=3):
    """The default-precision four-step plan (`plan_correlate4(...,
    precision='default')`) — the shipped speed knob for users who
    accept ~1e-5-class error (TPU-native bf16 MXU passes, no hi/lo
    expansion). Measures ms/batch the same fori-loop way plus the max
    abs deviation from the precision='high' plan on the same inputs."""
    import jax
    import jax.numpy as jnp
    from xcorr_tpu.ops.fft4 import padded_len, plan_correlate4

    kx, ky = jax.random.split(jax.random.PRNGKey(2))
    plen = padded_len(n, stageb="pallas")
    mk = jax.jit(lambda k: jax.random.normal(k, (B, n), jnp.float32))
    padf = jax.jit(lambda a: jnp.pad(a, ((0, 0), (0, plen - n))))
    x = padf(mk(kx))
    y = padf(mk(ky))
    x.block_until_ready(), y.block_until_ready()

    plans = {}
    for prec in ("default", "high"):
        plans[prec] = plan_correlate4(
            n, imin, imax, normalize=True, stageb="pallas",
            pre_padded=True, precision=prec)
    # accuracy A/B on one small batch (value-level, device-resident)
    xa, ya = x[:4], y[:4]
    d = jnp.max(jnp.abs(plans["default"](xa, ya)
                        - plans["high"](xa, ya)))
    max_diff = float(np.asarray(d))

    fast = plans["default"]

    @jax.jit
    def loop(x, y):
        def body(_, carry):
            xi, acc = carry
            r = fast(xi, y)
            return xi + r[0, 0] * 1e-30, acc + r[0, 0]
        _, acc = jax.lax.fori_loop(0, iters, body, (x, 0.0))
        return acc

    np.asarray(loop(x, y))
    times = []
    for _ in range(repeats):
        t0 = time.time()
        np.asarray(loop(x, y))
        times.append((time.time() - t0) / iters)
    return min(times), max_diff


def measure_reference(n, imin, imax):
    """One window through the reference numpy-fft formula on the host."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=n).astype(np.float32)
    y = rng.normal(size=n).astype(np.float32)
    nn = 2 * n - 1
    t0 = time.time()
    xx = np.zeros(nn, dtype=np.float32)
    xx[nn - n:] = x
    yy = np.zeros(nn, dtype=np.float32)
    yy[nn - n:] = y
    fg = np.fft.fft(xx) * np.conjugate(np.fft.fft(yy))
    fg /= np.linalg.norm(xx) * np.linalg.norm(yy)
    _ = np.fft.fftshift(np.real(np.fft.ifft(fg)))[imin:imax]
    return time.time() - t0


def _pcie_host_seconds_per_pair_day(wall, stages, tail, ndays,
                                    pair_day):
    """PCIe-host steady-state projection input: measured wall minus the
    tunnel-only wire wait, clamped from below by the contention-free
    host CPU. The streamed scatter nests 'bookkeeping' walls INSIDE
    'device-readback', so only the wire part of the readback is
    subtracted (a PCIe host still pays the scatter)."""
    readback = stages.get("device-readback", {}).get("wall_s", 0.0)
    bk = stages.get("bookkeeping", {}).get("wall_s", 0.0)
    wire = max(readback - bk, 0.0)
    return max(wall - wire - tail, _host_cpu(stages)) / (
        ndays * pair_day)


def _host_cpu(stages):
    """Contention-free host CPU of the serial campaign chain: thread
    CPU per stage, process CPU for the pooled preflight stages (which
    run before anything else is live), excluding the wire-bound
    readback, double-counted nested fetch, and the parallelizable
    writer-thread shard writes."""
    pooled = ("availability-scan", "preprocess-verify")
    total = 0.0
    for k, v in stages.items():
        if k in ("device-readback", "fetch-archive", "shard-write",
                 "wire-encode"):
            continue
        if k in pooled:
            total += v.get("process_cpu_s", v.get("cpu_s", 0.0))
        else:
            total += v.get("cpu_s", v["wall_s"])
    # the int16 h2d encode nests INSIDE device-dispatch and is a
    # tunnel-only cost (the codec disengages on PCIe hosts): subtract
    # it from the serial-host clamp
    total -= stages.get("wire-encode", {}).get("cpu_s", 0.0)
    return max(0.0, total)


def _e2e_setup(small, root, months=("2014-02-01", "2014-03-01"),
               ndays=None, fs=None):
    """Shared campaign config + pre-populated synthetic SDS archive."""
    import pandas as pd
    from xcorr_tpu.stream import Channel, Inventory, SyntheticClient

    if fs is None:
        fs = 5.0 if small else 50.0
    window = 3600.0 if small else 86400.0
    overlap = 0.5 if small else 21.0 / 24.0
    if ndays is None:
        ndays = 2 if small else 12
    days_per_launch = 2 if small else 8
    pairs = ["IM.H03S1..EDH-IM.H03S2..EDH"]
    client_kw = dict(
        sampling_rate=fs,
        delays={"IM.H03S1..EDH": 0.0, "IM.H03S2..EDH": 4.0},
        source_period=600.0, source_amplitude=20.0)
    inv = Inventory([
        Channel("IM", "H03S1", "", "EDH", latitude=-33.6,
                longitude=-78.8),
        Channel("IM", "H03S2", "", "EDH", latitude=-33.7,
                longitude=-78.9),
    ])
    init_args = dict(
        preprocess={"EDH": [
            ("detrend", {"type": "demean"}),
            ("filter", {"type": "highpass", "freq": 0.05}),
            ("detrend", {"type": "demean"}),
            ("taper", {"type": "cosine", "max_percentage": 0.05,
                       "max_length": 30.0}),
        ]},
        attrs={"institution": "bench", "author": "bench",
               "source": "syn"},
        sampling_rate=fs, window_length=window, window_overlap=overlap,
        clip_lag=(0.0, window * 0.375), inventory=inv,
        unbiased_cc=False,
    )
    # production flow reads day files from an SDS archive (the
    # reference workload runs on the author's archived data): the
    # synthetic client archives what it "downloads" and all campaign
    # fetches/availability scans take the real codec + header-scan
    # read path. Pre-populate the measured months as setup — archive
    # building is acquisition, not campaign wall. Boundary days too:
    # centered 47h task spans reach one day past each campaign end.
    client = SyntheticClient(sds_root=os.path.join(root, "sds"),
                             **client_kw)
    for month in months:
        first = pd.Timestamp(month) - pd.Timedelta(days=1)
        for t in pd.date_range(first, periods=ndays + 2, freq="1D"):
            for r in ("IM.H03S1..EDH", "IM.H03S2..EDH"):
                client._get_waveforms_for_date(r, t)
    return dict(fs=fs, window=window, overlap=overlap, ndays=ndays,
                days_per_launch=days_per_launch, pairs=pairs, inv=inv,
                init_args=init_args, client=client)


def _shard_cc(root, pair, day):
    """Read one shard's decoded cc values + status (host-side)."""
    import pandas as pd
    from xcorr_tpu.io.filesystem import ncfile
    from xcorr_tpu.io.read import read
    ds = read(ncfile(pair, pd.Timestamp(day), root), fast=True, verb=0)
    return ds["cc"].values, ds["status"].values


def _quantization_err(root_test, root_ref, pair, day):
    """Max end-to-end CCF error of a campaign shard vs the unpacked
    f32 reference shard for one pair-day (covers the int16 wire codec
    and, for pack_cc shards, the CF int16 storage packing)."""
    cc_t, st_t = _shard_cc(root_test, pair, day)
    cc_r, st_r = _shard_cc(root_ref, pair, day)
    ok = (st_t == 1) & (st_r == 1)
    if not ok.any():
        return None
    a, b = cc_t[ok], cc_r[ok]
    with np.errstate(all="ignore"):
        max_abs = float(np.nanmax(np.abs(a - b)))
        denom = float(np.nanmax(np.abs(b)))
    if not np.isfinite(max_abs):
        # all overlapping rows decoded non-finite (corrupt-row wire
        # semantics): never let NaN tokens into the JSON artifact
        return {"error": "all compared values non-finite"}
    return {"max_abs": round(max_abs, 9),
            "max_rel_vs_peak": round(max_abs / denom, 9)
            if denom and np.isfinite(denom) else None}


def measure_e2e(small):
    """lazy_process(engine='device') pair-days/s including ALL IO,
    MEASURED over a multi-day campaign with the production overlap
    machinery engaged (multi-day batched launches + writer-thread
    readback/write overlap), not extrapolated from one day.

    Synthetic SDS-free archive -> availability scan -> device window
    pipeline -> zlib netCDF shard write, the production flow of
    scripts/cc.py (reference workload spec xcorr/scripts/cc.py:136-165).

    Streams partial results via :func:`_mark` after every campaign so a
    mid-section kill still leaves the numbers measured so far.
    """
    import pandas as pd
    from xcorr_tpu import lazy_process
    from xcorr_tpu.util.profiler import StageTimer

    with tempfile.TemporaryDirectory() as root:
        cfg = _e2e_setup(small, root)
        fs, window, overlap = cfg["fs"], cfg["window"], cfg["overlap"]
        ndays, days_per_launch = cfg["ndays"], cfg["days_per_launch"]
        pairs, inv = cfg["pairs"], cfg["inv"]
        init_args, client = cfg["init_args"], cfg["client"]

        # the axon tunnel's d2h rate swings day-to-day AND the FIRST
        # large readback of a process is pathological (measured
        # 0.8 MB/s cold vs ~137 MB/s warm on the same day); at 52 MB of
        # CCF per pair-day the readback stage is hostage to it. Probe
        # both directions twice and record the warm rate (the
        # steady-state campaign only ever sees warm transfers), keeping
        # the cold one for context.
        import jax
        import jax.numpy as jnp
        from xcorr_tpu.util.xfer import (device_fetch,
                                         live_backend_tunneled,
                                         wire_pack_enabled)
        mk = jax.jit(lambda k: jax.random.normal(k, (8, 1_620_000),
                                                 jnp.float32))
        rates = []
        for i in range(2):
            # a FRESH device buffer each round: re-reading one buffer
            # hits the runtime's host-side copy cache (memcpy rates)
            probe = mk(jax.random.PRNGKey(i))
            probe.block_until_ready()
            t0 = time.time()
            host = device_fetch(probe)
            d2h = probe.nbytes / 1e6 / (time.time() - t0)
            t0 = time.time()
            dev = jax.device_put(host)
            dev.block_until_ready()
            h2d = host.nbytes / 1e6 / (time.time() - t0)
            rates.append((d2h, h2d))
        (d2h_cold, _), (d2h_MBps, h2d_MBps) = rates
        del probe, host, dev
        out = {"tunnel_d2h_MBps": round(d2h_MBps, 1),
               "tunnel_d2h_MBps_cold": round(d2h_cold, 1),
               "tunnel_h2d_MBps": round(h2d_MBps, 1)}
        _mark({"e2e": dict(out)})

        # warmup: compile (or persistent-cache load) the pipelines for
        # the SAME chunk pattern as the measured campaign (with the
        # canonical tail-chunk padding every chunk now shares one
        # executable set, but the warm run still pays/loads it here,
        # outside the measured walls), plus availability scan +
        # preprocess preflight
        warm_days = pd.date_range("2014-01-01", periods=ndays,
                                  freq="1D")
        t0 = time.time()
        lazy_process(pairs, warm_days, init_args, client, inventory=inv,
                     root=os.path.join(root, "warm"), engine="device",
                     days_per_launch=days_per_launch, verb=0)
        dt_first = time.time() - t0
        out["first_run_s"] = round(dt_first, 2)  # scans + compile/cache
        _mark({"e2e": dict(out)})

        # measured steady state: fresh multi-day campaigns with warm
        # executables — fetch/dispatch of chunk N+1 overlaps readback +
        # shard writes of chunk N (1 writer thread on this host). The
        # tunnel's rate swings 3-6x WITHIN a day, so run the campaign
        # twice and report the better one (same binary, same minute —
        # the slow run is link weather, not the framework)
        wall, timer, walls, tail = None, None, [], 0.0
        for rep, month in enumerate(("2014-02-01", "2014-03-01")):
            times = pd.date_range(month, periods=ndays, freq="1D")
            rep_timer = StageTimer()
            t0 = time.time()
            results = lazy_process(
                pairs, times, init_args, client, inventory=inv,
                root=os.path.join(root, f"run{rep}"), engine="device",
                days_per_launch=days_per_launch, verb=0,
                timer=rep_timer)
            rep_wall = time.time() - t0
            assert all(results), "e2e campaign did not complete"
            walls.append(round(rep_wall, 2))
            if wall is None or rep_wall < wall:
                wall, timer = rep_wall, rep_timer
                # writer-drain tail: how long the campaign outlives its
                # LAST device readback (final chunk's netCDF writes
                # draining on the writer thread). A per-campaign
                # CONSTANT (one chunk's writes), not a per-pair-day
                # cost — projections must not scale it by 366.
                last_rb = rep_timer.last_end("device-readback")
                tail = max(0.0, time.perf_counter() - last_rb) \
                    if last_rb else 0.0
            _mark({"e2e": {"campaign_walls_s": walls}})
        pair_day = window / 86400.0
        sec = wall / (ndays * pair_day)
        stages = timer.as_dict()
        readback = stages.get("device-readback", {}).get("wall_s", 0.0)

        # wire floor from MEASURED rates and the campaign's actual wire
        # bytes: the tunnel is ONE shared resource, so on this harness
        # it does NOT divide by 8 chips — the v5e-8 projection below is
        # clamped by it (the pcie_host projection models real hardware,
        # where the wire term vanishes). Bytes: spans upload once per
        # receiver per chunk (chunk-union engine), CCFs read back per
        # window; the codec halves both on tunneled links.
        packed = wire_pack_enabled() and (
            os.environ.get("XCORR_WIRE_PACK") or live_backend_tunneled())
        unit = 2 if packed else 4
        stride = window * (1.0 - overlap)
        win_per_day = max(1, round(86400.0 * pair_day / stride))
        nlag = int(window * 0.375 * fs)  # clip_lag=(0, 0.375*window)
        d2h_bytes = ndays * win_per_day * nlag * unit
        h2d_bytes = 0
        d = 0
        while d < ndays:
            chunk_days = min(days_per_launch, ndays - d)
            span_s = chunk_days * 86400.0 * pair_day + window
            h2d_bytes += 2 * int(span_s * fs) * unit  # 2 receivers
            d += chunk_days
        wire_floor_s = (d2h_bytes / (d2h_MBps * 1e6)
                        + h2d_bytes / (h2d_MBps * 1e6))
        wire_floor_pd = wire_floor_s / (ndays * pair_day)
        tunneled = live_backend_tunneled()
        proj_v5e8 = sec * 366 / 8
        if tunneled:
            proj_v5e8 = max(proj_v5e8, wire_floor_pd * 366)
        out.update({
            "pair_days_per_s": round(1.0 / sec, 4),
            "seconds_per_pair_day": round(sec, 2),
            "measured_days": ndays,
            "days_per_launch": days_per_launch,
            "campaign_walls_s": walls,  # all repeats (best reported)
            # (pair, day) grid is embarrassingly parallel (P1 batch
            # sharding) BUT on this harness all 8 chips would share ONE
            # tunnel: the projection is clamped from below by the
            # measured-rate wire floor (it divides by 8 only on real
            # hardware — see projected_pair_year_s_v5e8_pcie_host)
            "projected_pair_year_s_v5e8": round(proj_v5e8, 1),
            "wire_floor_s_per_pair_day": round(wire_floor_pd, 2),
            # int16 block-float readback codec state (tunnel-only;
            # docs/PARITY.md "Tunneled-link wire codec"): quantization
            # <=1.6e-5 absolute on normalized CCFs, f32 elsewhere
            "wire_pack": "i16" if packed else "off",
            # wall = as-run on this host (incl. contention + wire
            # waits); cpu = thread CPU seconds, the contention-free
            # cost a dedicated core pays for the stage
            "stage_breakdown_s": {k: {"wall": v["wall_s"],
                                      "cpu": v.get("cpu_s", 0.0),
                                      "process_cpu":
                                          v.get("process_cpu_s", 0.0)}
                                  for k, v in stages.items()},
            "writer_drain_tail_s": round(tail, 2),
        })
        if not small and readback:
            # this harness reaches the chip through a ~40 MB/s tunnel
            # AND runs every host stage on ONE core — a real TPU host
            # moves host<->device data over PCIe (GB/s) and has cores
            # to spare, so (a) the readback wait vanishes, (b) host
            # stage WALLS are inflated by mutual contention (writer
            # zlib steals the core from fetch/prepare), where thread
            # CPU seconds are the contention-free cost. Project from
            # measured components:
            #   steady/pd = max(wall - readback - drain tail,
            #                   host cpu excl. overlappable stages)
            #   pair-year = steady * 366/8 + drain tail (the tail is a
            #   per-campaign constant — one chunk's writes — NOT a
            #   per-pair-day cost).
            # 'fetch-archive' nests INSIDE 'prepare' (adding both
            # double-counts); 'shard-write' runs on the writer thread
            # and parallelizes on a multi-core host, so neither enters
            # the serial-host CPU clamp. The preflight stages fan out
            # to thread pools (their CPU lands on pool threads, not the
            # timed one) — they run serially BEFORE any device work, so
            # the whole-process CPU delta is their true cost.
            sec_pcie = _pcie_host_seconds_per_pair_day(
                wall, stages, tail, ndays, pair_day)
            out["host_cpu_s_per_pair_day"] = round(
                _host_cpu(stages) / (ndays * pair_day), 3)
            out["projected_pair_year_s_v5e8_pcie_host"] = round(
                sec_pcie * 366 / 8 + tail, 1)
        _mark({"e2e": dict(out)})

        # ------- measured CCF fidelity (wire codec + storage path) ---
        # one extra 1-day campaign with the wire codec OFF gives the
        # unpacked f32 ground truth for the first measured pair-day;
        # the decoded run0 shard vs it measures the error the e2e
        # products ACTUALLY carry (VERDICT r3 ask #5; bars: BASELINE.md
        # 1e-6 rtol on the compute path, docs/PARITY.md 1.6e-5 wire
        # codec bound)
        try:
            day0 = "2014-02-01"
            envpack = os.environ.get("XCORR_WIRE_PACK")
            os.environ["XCORR_WIRE_PACK"] = "0"
            try:
                lazy_process(pairs, pd.date_range(day0, periods=1,
                                                  freq="1D"),
                             init_args, client, inventory=inv,
                             root=os.path.join(root, "truth"),
                             engine="device",
                             days_per_launch=days_per_launch, verb=0)
            finally:
                if envpack is None:
                    os.environ.pop("XCORR_WIRE_PACK", None)
                else:
                    os.environ["XCORR_WIRE_PACK"] = envpack
            err = _quantization_err(os.path.join(root, "run0"),
                                    os.path.join(root, "truth"),
                                    pairs[0], day0)
            if err is not None:
                err["covers"] = ("wire codec (i16 block-float d2h+h2d)"
                                 if out["wire_pack"] == "i16"
                                 else "f32 path (codec off)")
            out["max_quantization_err"] = err
            _mark({"e2e": {"max_quantization_err": err}})
        except Exception as error:
            out["max_quantization_err"] = {"error": str(error)}

        # ------- codec-OFF e2e parity vs the HOST-path oracle --------
        # (VERDICT r4 ask #6) The codec-free campaign shard ("truth",
        # XCORR_WIRE_PACK=0 — the path a real PCIe host runs) compared
        # against a SUBPROCESS oracle on the cpu x64 backend: host
        # per-trace preprocess + monolithic f64-FFT correlate — a
        # genuinely independent recomputation with no device kernel,
        # no wire codec and no f32 FFT anywhere in its path
        # (BASELINE.md 1e-6 bar; ref accuracy model
        # xcorr/util/cc.py:75-79). An in-process oracle would run the
        # SAME device kernel through the re-engaged codec (review r5).
        try:
            if not small:
                oracle_out = os.path.join(root, "oracle_shard.nc")
                env = dict(os.environ)
                env["XCORR_E2E_ORACLE"] = json.dumps({
                    "root": root, "day": day0, "ndays": ndays,
                    "fs": fs, "out": oracle_out})
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--oracle-child"], env=env, capture_output=True,
                    text=True, timeout=900)
                marked = any(ln.startswith(_MARK) for ln in
                             (p.stdout or "").splitlines())
                if p.returncode != 0 or not marked \
                        or not os.path.exists(oracle_out):
                    raise RuntimeError(
                        f"oracle child rc={p.returncode}: "
                        f"{(p.stderr or '')[-300:]}")
                from xcorr_tpu.io.read import read as _read_nc
                ds_o = _read_nc(oracle_out, fast=True, verb=0)
                cc_t, st_t = _shard_cc(os.path.join(root, "truth"),
                                       pairs[0], day0)
                ok = (st_t == 1) & (ds_o["status"].values == 1)
                if ok.any():
                    a = cc_t[ok].astype(np.float64)
                    b = ds_o["cc"].values[ok].astype(np.float64)
                    max_abs = float(np.max(np.abs(a - b)))
                    peak = float(np.max(np.abs(b)))
                    cop = {
                        "max_abs": round(max_abs, 12),
                        "rel_vs_peak": round(max_abs / peak, 12)
                        if peak else None,
                        "windows_compared": int(ok.sum()),
                        "covers": "device engine, f32 wire (codec "
                                  "off) vs cpu-x64 host-engine "
                                  "f64-fft subprocess oracle",
                    }
                    out["codec_off_parity"] = cop
                    out["codec_off_parity_max_abs"] = cop["max_abs"]
                    _mark({"e2e": {
                        "codec_off_parity": cop,
                        "codec_off_parity_max_abs": cop["max_abs"]}})
        except Exception as error:
            out["codec_off_parity"] = {"error": str(error)}
            _mark({"e2e": {"codec_off_parity": out["codec_off_parity"]}})

        if not small:
          # fail-soft: the main campaign numbers above must survive a
          # fast-storage failure (the driver parses this artifact)
          try:
            # fast-storage production config (the xcorr-cc --pack-cc
            # --complevel 0 flags): CF int16-packed CCFs, uncompressed
            # shards — write 1.1 -> 0.37 s/shard measured, quantization
            # max|cc|/32765/2 (~1.5e-5 normalized). Same device
            # executables (storage is host-side), one measured campaign.
            fast_args = dict(init_args, pack_cc=True, complevel=0)
            times = pd.date_range("2014-02-01", periods=ndays,
                                  freq="1D")
            fast_timer = StageTimer()
            t0 = time.time()
            results = lazy_process(
                pairs, times, fast_args, client, inventory=inv,
                root=os.path.join(root, "fast"), engine="device",
                days_per_launch=days_per_launch, verb=0,
                timer=fast_timer)
            fast_wall = time.time() - t0
            last_rb = fast_timer.last_end("device-readback")
            fast_tail = max(0.0, time.perf_counter() - last_rb) \
                if last_rb else 0.0
            if all(results):
                fstages = fast_timer.as_dict()
                fsec = fast_wall / (ndays * pair_day)
                fpcie = _pcie_host_seconds_per_pair_day(
                    fast_wall, fstages, fast_tail, ndays, pair_day)
                out["fast_storage"] = {
                    "config": "pack_cc=True complevel=0 "
                              "(xcorr-cc --pack-cc --complevel 0)",
                    "seconds_per_pair_day": round(fsec, 2),
                    "pair_days_per_s": round(1.0 / fsec, 4),
                    "writer_drain_tail_s": round(fast_tail, 2),
                    "projected_pair_year_s_v5e8_pcie_host": round(
                        fpcie * 366 / 8 + fast_tail, 1),
                    # storage packing ADDS CF int16 quantization on top
                    # of the wire codec: same ground-truth shard
                    "max_quantization_err": _quantization_err(
                        os.path.join(root, "fast"),
                        os.path.join(root, "truth"), pairs[0],
                        "2014-02-01"),
                }
            else:
                # distinguish "config failed" from "never ran" in the
                # artifact (lazy_process returns False per failed task
                # instead of raising)
                out["fast_storage"] = {
                    "error": f"campaign incomplete: "
                             f"{sum(bool(r) for r in results)}"
                             f"/{len(results)} tasks succeeded"}
          except Exception as error:
            out["fast_storage"] = {"error": str(error)}
        return out


def measure_mesh8(ndays=2, fs=6.25):
    """Host-cost RATIO of feeding an 8-device mesh vs a single device
    (VERDICT r3 ask #4): the bench e2e campaign runs twice on the cpu
    platform — mesh=None and mesh=make_mesh(8) over the virtual 8-CPU
    devices (xla_force_host_platform_device_count=8) — with identical
    day structure (24 h windows, 3 h shift, production overlap) and the
    host thread-CPU per pair-day of each is recorded. The ratio scales
    the REAL e2e campaign's measured 50 Hz host cost into the v5e-8
    projection clamp (orchestrator derive()).

    Runs at a reduced sampling rate: XLA:CPU's cross-device collective
    rendezvous ABORTS the process (F-check SIGABRT) unless all 8
    participants arrive within 40 s, and ONE core runs the shard
    programs sequentially — so the per-shard segment before any
    collective must stay well under 40/8 s (fs=50 aborted always,
    fs=12.5 intermittently). Host cost structure (fetch / canonicalize
    / launch assembly per pair-day) is what's measured; the ratio is
    byte-scale-invariant. Runs as its own --section child on the cpu
    platform, so it lands even when the tunnel is down."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    _enable_compile_cache()
    import pandas as pd
    from xcorr_tpu import lazy_process
    from xcorr_tpu.parallel import make_mesh
    from xcorr_tpu.util.profiler import StageTimer

    assert len(jax.devices()) >= 8, "need 8 virtual CPU devices"
    with tempfile.TemporaryDirectory() as root:
        cfg = _e2e_setup(False, root, months=("2014-01-15",
                                              "2014-02-01",
                                              "2014-03-01"),
                         ndays=ndays, fs=fs)
        _mark({"e2e": {"mesh8": {"status": "archive ready"}}})
        warm_times = pd.date_range("2014-01-15", periods=ndays,
                                   freq="1D")
        times = pd.date_range("2014-02-01", periods=ndays, freq="1D")
        out = {"mesh8": {"ndays": ndays, "sampling_rate": fs,
                         "platform": "cpu x8 (virtual mesh)"}}
        host_pd = {}
        for name, mesh in (("single", None), ("mesh8", make_mesh(8))):
            # WARM campaign first (untimed): with one chunk per
            # campaign the first launch carries jaxpr tracing,
            # compile-cache loads and h5py first-file costs — one-time
            # process constants a production campaign amortizes over
            # hundreds of days (r5 profile: they were ~70% of the r4
            # 'host cost'). Grid-canonical offsets make the warm
            # month's executables the measured month's executables.
            lazy_process(
                cfg["pairs"], warm_times, cfg["init_args"],
                cfg["client"], inventory=cfg["inv"],
                root=os.path.join(root, name + "_warm"),
                engine="device",
                days_per_launch=cfg["days_per_launch"],
                verb=0, mesh=mesh)
            timer = StageTimer()
            t0 = time.time()
            results = lazy_process(
                cfg["pairs"], times, cfg["init_args"], cfg["client"],
                inventory=cfg["inv"], root=os.path.join(root, name),
                engine="device",
                days_per_launch=cfg["days_per_launch"],
                verb=0, timer=timer, mesh=mesh)
            wall = time.time() - t0
            stages = timer.as_dict()
            host_pd[name] = _host_cpu(stages) / ndays
            ok = sum(bool(r) for r in results)
            out["mesh8"][name] = {
                "wall_s": round(wall, 1),
                "completed": f"{ok}/{len(results)}",
                "host_cpu_s_per_pair_day": round(host_pd[name], 3),
                "host_stage_cpu_s": {
                    k: round(v.get("cpu_s", 0.0), 2)
                    for k, v in stages.items()}}
            _mark({"e2e": dict(out)})
        if host_pd.get("single"):
            ratio = host_pd["mesh8"] / host_pd["single"]
            out["mesh8"]["host_cost_ratio_vs_single"] = round(ratio, 3)
            out["mesh8_host_cost_ratio"] = round(ratio, 3)

        # ---- 2-process host-CPU split (VERDICT r4 ask #2) ----------
        # The v5e-8 projection divides host work by 8: on a real
        # multi-core TPU host each chip's feed runs in its own worker
        # process over its (pair, day) slice (the P5 host_slice
        # formation). Back that division with a measurement: two
        # warmed worker subprocesses each run a full-chunk-sized day
        # slice (different months, same archive) and their per-pair-day
        # host CPU — contention-free seconds — must match the serial
        # campaign's: the work splits across processes without growth.
        # (Equal slice sizes on purpose: a HALF-size slice would pay
        # the per-chunk half-window overhang over fewer days and read
        # as fake superlinearity — measured 1.56x at 1-day slices.)
        try:
            kids, child_errors = [], []
            times2 = pd.date_range("2014-03-01", periods=ndays,
                                   freq="1D")
            slices = [[str(t) for t in times],
                      [str(t) for t in times2]]
            for ci, days in enumerate(s for s in slices if s):
                env = dict(os.environ)
                env["XCORR_MESH8_CHILD"] = json.dumps({
                    "root": root, "days": days, "fs": fs,
                    "warm_start": "2014-01-15", "sub": f"c{ci}"})
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--mesh8-child"], env=env, capture_output=True,
                    text=True, timeout=420)
                got = False
                for line in (p.stdout or "").splitlines():
                    if line.startswith(_MARK):
                        kids.append(json.loads(line[len(_MARK):]))
                        got = True
                if p.returncode != 0 or not got:
                    # a silently failed worker must leave evidence —
                    # the scaler otherwise falls back to the noisier
                    # mesh8 ratio with nothing explaining why
                    child_errors.append(
                        f"c{ci}: rc={p.returncode} "
                        f"{(p.stderr or '')[-200:]}")
            if child_errors:
                out["mesh8"].setdefault("host_scale_2proc", {})[
                    "child_errors"] = child_errors
            vals = [k["host_cpu_s_per_pair_day"] for k in kids
                    if "host_cpu_s_per_pair_day" in k]
            if vals and host_pd.get("single"):
                out["mesh8"].setdefault("host_scale_2proc", {}).update({
                    "serial_s_per_pair_day": round(host_pd["single"],
                                                   3),
                    "workers_s_per_pair_day": [round(v, 3)
                                               for v in vals],
                    # per-worker cost over its slice vs the serial
                    # campaign's: ~1.0 means the host work is
                    # embarrassingly parallel across processes
                    "worker_over_serial": round(
                        max(vals) / host_pd["single"], 3)
                    if host_pd["single"] else None})
                _mark({"e2e": dict(out)})
        except Exception as error:
            out["mesh8"]["host_scale_2proc"] = {"error": str(error)}
        return out


def _e2e_oracle_child():
    """CPU x64 HOST-engine oracle for the codec-off parity comparison:
    pins the cpu backend via config update (the axon plugin ignores
    the env var — CLAUDE.md accuracy-check trap) and enables x64 so
    the synthetic day flows f64 through the host per-trace preprocess
    and the monolithic f64-FFT correlate (ops.cc dispatches monolithic
    on the cpu backend). Writes the day's shard for the parent to
    compare against the codec-off device campaign."""
    spec = json.loads(os.environ["XCORR_E2E_ORACLE"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import pandas as pd
    import xcorr_tpu

    cfg = _e2e_setup(False, spec["root"], months=(),
                     ndays=spec["ndays"], fs=spec["fs"])
    t0d = pd.Timestamp(spec["day"])
    ds = xcorr_tpu.init(pair=cfg["pairs"][0], starttime=t0d,
                        endtime=t0d + pd.Timedelta("1D"),
                        **cfg["init_args"])
    xcorr_tpu.process(ds, client=cfg["client"], inventory=cfg["inv"],
                      verb=0)
    xcorr_tpu.write(ds, spec["out"], verb=0)
    _mark({"oracle_windows": int((ds["status"].values == 1).sum())})


def _mesh8_host_child():
    """Child process for measure_mesh8's 2-process host-CPU split:
    warm on the warm month (one-time constants excluded), then measure
    this worker's day slice; prints the per-pair-day host CPU as an
    @@BENCH@@ marker."""
    spec = json.loads(os.environ["XCORR_MESH8_CHILD"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    _enable_compile_cache()
    import pandas as pd
    from xcorr_tpu import lazy_process
    from xcorr_tpu.util.profiler import StageTimer

    days = pd.DatetimeIndex([pd.Timestamp(t) for t in spec["days"]])
    cfg = _e2e_setup(False, spec["root"], months=(),
                     ndays=len(days), fs=spec["fs"])
    warm = pd.date_range(spec["warm_start"], periods=len(days),
                         freq="1D")
    lazy_process(cfg["pairs"], warm, cfg["init_args"], cfg["client"],
                 inventory=cfg["inv"],
                 root=os.path.join(spec["root"],
                                   spec["sub"] + "_warm"),
                 engine="device",
                 days_per_launch=cfg["days_per_launch"], verb=0)
    timer = StageTimer()
    lazy_process(cfg["pairs"], days, cfg["init_args"], cfg["client"],
                 inventory=cfg["inv"],
                 root=os.path.join(spec["root"], spec["sub"]),
                 engine="device",
                 days_per_launch=cfg["days_per_launch"], verb=0,
                 timer=timer)
    _mark({"host_cpu_s_per_pair_day": round(
        _host_cpu(timer.as_dict()) / len(days), 3),
        "ndays": len(days)})


def measure_mesh_day(ndevices=(2, 8)):
    """ONE production-geometry campaign day (fs=50, 24 h windows,
    21/24 overlap = 8 windows/pair-day) through multi-device CPU
    meshes (VERDICT r4 ask #3): proves the sharded buffer shapes and
    the collective path at the exact scale the v5e-8 north star
    quotes — the largest geometry round 4 ever sharded was 1/8 of
    this (mesh8 pinned to fs=6.25 after rendezvous SIGABRTs).

    The CPU collective rendezvous F-check (abort unless every
    participant arrives within 40 s) is a FALSE alarm on a 1-core host
    running 8 shard programs sequentially; the parent raises it via
    ``--xla_cpu_collective_call_terminate_timeout_seconds`` in this
    child's XLA_FLAGS. Spec: the P1 path core/lazy.py ->
    parallel/engine.py at scripts/cc.py-equivalent config
    (xcorr/scripts/cc.py:25-115)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    _enable_compile_cache()
    import pandas as pd
    from xcorr_tpu import lazy_process
    from xcorr_tpu.parallel import make_mesh

    ndev_avail = len(jax.devices())
    out = {"mesh_day": {
        "geometry": "fs=50 Hz, 24 h windows, 21/24 overlap, "
                    "8 windows/pair-day, 1 pair-day/pack",
        "devices_available": ndev_avail}}
    with tempfile.TemporaryDirectory() as root:
        cfg = _e2e_setup(False, root, months=("2014-02-01",), ndays=1,
                         fs=50.0)
        _mark({"e2e": dict(out)})
        times = pd.date_range("2014-02-01", periods=1, freq="1D")
        for n in ndevices:
            if n > ndev_avail:
                out["mesh_day"][f"mesh{n}"] = {
                    "status": "skipped", "reason": "too few devices"}
                continue
            t0 = time.time()
            try:
                results = lazy_process(
                    cfg["pairs"], times, cfg["init_args"],
                    cfg["client"], inventory=cfg["inv"],
                    root=os.path.join(root, f"m{n}"), engine="device",
                    days_per_launch=1, verb=0, mesh=make_mesh(n))
                ok = sum(bool(r) for r in results)
                out["mesh_day"][f"mesh{n}"] = {
                    "status": "ok" if ok == len(results) else "partial",
                    "completed": f"{ok}/{len(results)}",
                    "wall_s": round(time.time() - t0, 1)}
            except Exception as error:  # record, keep smaller meshes
                out["mesh_day"][f"mesh{n}"] = {
                    "status": "error",
                    "error": f"{type(error).__name__}: {error}"[:300],
                    "wall_s": round(time.time() - t0, 1)}
            _mark({"e2e": dict(out)})
        # cross-mesh VALUE parity: the same pair-day computed on the
        # 2- and 8-device meshes must agree (different collective
        # schedules reassociate f32 sums — record the actual diff,
        # don't assume it)
        try:
            done = [n for n in ndevices
                    if out["mesh_day"].get(f"mesh{n}", {}).get(
                        "status") == "ok"]
            if len(done) >= 2:
                day = str(times[0].date())
                a, sa = _shard_cc(os.path.join(root, f"m{done[0]}"),
                                  cfg["pairs"][0], day)
                b, sb = _shard_cc(os.path.join(root, f"m{done[-1]}"),
                                  cfg["pairs"][0], day)
                ok = (sa == 1) & (sb == 1)
                if ok.any():
                    diff = float(np.max(np.abs(
                        a[ok].astype(np.float64)
                        - b[ok].astype(np.float64))))
                    out["mesh_day"]["cross_mesh_max_abs_diff"] = {
                        f"mesh{done[0]}_vs_mesh{done[-1]}":
                            round(diff, 12),
                        "windows": int(ok.sum())}
                    _mark({"e2e": dict(out)})
        except Exception as error:
            out["mesh_day"]["cross_mesh_max_abs_diff"] = {
                "error": str(error)[:200]}
    return out


# ---------------------------------------------------------------------
# section children (--section <name>)
# ---------------------------------------------------------------------

def _geometry(small):
    if small:
        n, B = 432_000, 8           # 2.4 h @ 50 Hz per window
        imin, imax = n - 1, n - 1 + 162_000
        days_per_batch = n / 4_320_000  # pair-day fraction per batch
    else:
        # 24 h @ 50 Hz; 80 windows = 10 pair-days. B sweep on v5e-1
        # (round-2 kernel, ms/window): 8 -> 1.54, 16 -> 1.31,
        # 32 -> 1.15, 64 -> 1.064, 80 -> 0.994, 96 -> 0.994
        # (saturates at 80; ~12.5 GB peak HBM of 16 GB)
        n, B = 4_320_000, 80
        imin, imax = n - 1, n - 1 + 1_620_000
        days_per_batch = 10.0
    return n, B, imin, imax, days_per_batch


def _section_probe():
    import jax
    devs = jax.devices()
    import jax.numpy as jnp
    x = jnp.ones((128, 128), jnp.float32)
    (x @ x).block_until_ready()
    version = ""
    try:
        version = str(devs[0].client.platform_version)
    except Exception:
        pass
    _mark({"platform": devs[0].platform,
           "platform_version": version})


def _section_kernel(small):
    _enable_compile_cache()
    n, B, imin, imax, days_per_batch = _geometry(small)
    if not small:
        # stream the traffic model BEFORE measuring, so a repeat list
        # from a mid-measurement kill can still derive the roofline
        from xcorr_tpu.ops.fft4 import traffic_model
        _mark({"traffic_bytes": traffic_model(n, imin, imax, batch=B),
               "batch_windows": B})
    else:
        _mark({"batch_windows": B})
    times = measure_device(n, B, imin, imax,
                           iters=10 if not small else 5, mark=True)
    _mark({"kernel_times_s": times})
    if not small:
        # the shipped fast mode (precision='default'): record its rate
        # + measured deviation from the 'high' plan (fail-soft — the
        # headline above must survive a fast-mode failure)
        try:
            from xcorr_tpu.ops.fft4 import traffic_model
            best, diff = measure_fast_mode(n, B, imin, imax)
            traffic = traffic_model(n, imin, imax, batch=B)
            _mark({"kernel_fast_mode": {
                "precision": "default (bf16 MXU passes)",
                "ms_per_batch_min": round(best * 1e3, 2),
                "pair_days_per_s": round((B / 8.0) / best, 2),
                "apparent_roofline_pct": round(
                    traffic / best / (HBM_STREAM_GBPS * 1e9) * 100, 1),
                "note": ">100% apparent = the traffic model counts "
                        "plane reads the fused kernel serves from "
                        "VMEM; ceiling is the conservative pure-copy "
                        "measurement",
                "max_abs_diff_vs_high": float(f"{diff:.3e}")}})
        except Exception as error:
            _mark({"kernel_fast_mode": {"error": str(error)[:200]}})


def _section_sweep(small):
    _enable_compile_cache()
    n, _, imin, imax, _ = _geometry(small)
    sweep = {}
    for b in (8, 16, 32, 64):
        ts = measure_device(n, b, imin, imax, iters=5, repeats=3)
        sweep[str(b)] = round(min(ts) * 1e3 / b, 3)
        _mark({"b_sweep_ms_per_window": dict(sweep)})


def _host_id():
    """Coarse host fingerprint for the reference-constant cache: the
    constant is a property of this machine's single-core numpy speed,
    so a cache entry from another host must not be reused (it would
    silently skew vs_baseline)."""
    import platform
    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except Exception:
        pass
    return f"{platform.node()}/{os.cpu_count()}/{model}"


def _section_reference(small):
    n, _, imin, imax, _ = _geometry(small)
    t_ref = measure_reference(n, imin, imax)
    _mark({"t_ref_s": t_ref, "ref_n": n})
    if not small:
        try:
            os.makedirs(os.path.dirname(_REF_CACHE), exist_ok=True)
            with open(_REF_CACHE, "w") as f:
                json.dump({"t_ref_s": t_ref, "n": n, "host": _host_id(),
                           "note": "reference numpy-fft window cost, "
                                   "one host core (xcorr/util/cc.py "
                                   "formula); measured once per host"},
                          f)
        except Exception:
            pass


def _section_e2e(small):
    _enable_compile_cache()
    _mark({"e2e": measure_e2e(small)})


def _section_mesh_day(small):
    _mark({"e2e": measure_mesh_day()})


def _section_mesh8(small):
    # 2 days: the campaign's device compute runs on (slow) CPU shards,
    # so keep the measured grid small — the HOST cost per pair-day it
    # reports is per-unit and stable from 2 days on (first-chunk
    # compile CPU is excluded via cpu_s stage accounting)
    _mark({"e2e": measure_mesh8(ndays=2)})


# ---------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------

class _Orchestrator:
    """Pure-Python parent: budgeted subprocess sections, incremental
    artifact, guaranteed single-JSON-line emission on ANY exit path."""

    def __init__(self, deadline_s, argv):
        self.t0 = time.time()
        self.deadline = deadline_s
        self.argv = argv
        self.child = None
        self.emitted = False
        self.sections = {}
        self.artifact = {
            "metric": "CCF pair-days/sec/chip at 50 Hz",
            "value": None, "unit": "pair-days/s", "vs_baseline": None,
        }

    def remaining(self):
        return self.deadline - (time.time() - self.t0)

    # -- artifact assembly ------------------------------------------

    def merge(self, d: dict):
        for k, v in d.items():
            if (k in self.artifact and isinstance(v, dict)
                    and isinstance(self.artifact[k], dict)):
                self.artifact[k].update(v)
            else:
                self.artifact[k] = v
        self.derive()
        self.write_partial()

    def derive(self):
        """Headline numbers from the raw section fields."""
        a = self.artifact
        small = a.get("small_mode", False)
        n, B, imin, imax, days_per_batch = _geometry(small)
        times = a.pop("kernel_times_s", None)
        if times:
            best, med = min(times), float(np.median(times))
            a["value"] = round(days_per_batch / best, 3)
            a["ms_per_batch"] = {
                "min": round(best * 1e3, 2),
                "median": round(med * 1e3, 2),
                "runs": [round(t * 1e3, 2) for t in times]}
            nbytes = a.get("traffic_bytes")
            if nbytes:
                eff = nbytes / best
                a["roofline_pct"] = round(
                    eff / (HBM_STREAM_GBPS * 1e9) * 100, 1)
                a["roofline_pct_peak"] = round(
                    eff / (HBM_PEAK_GBPS * 1e9) * 100, 1)
                a["effective_GBps"] = round(eff / 1e9, 1)
        t_ref = a.get("t_ref_s")
        if t_ref and a.get("value"):
            # one window costs t_ref on one core; a pair-day is 8
            ref_pd = (n / 4_320_000) / (t_ref * 8)
            a["vs_baseline"] = round(a["value"] / ref_pd, 1)
        # the mesh8 measurement clamps the PCIe-host projection: the
        # measured host-cost RATIO of feeding 8 shards vs one scales
        # the real e2e campaign's 50 Hz host CPU per pair-day; with
        # >=8 worker cores (any real TPU host) that parallelizes 8-way
        # (VERDICT r3 ask #4 — measured input replaces the assumption)
        e2e = a.get("e2e")
        if isinstance(e2e, dict):
            ratio = e2e.get("mesh8_host_cost_ratio")
            # the production v5e-8 formation is 8 worker PROCESSES
            # (P5 host_slice), so the measured 2-process worker/serial
            # cost ratio is the right host scaler when present; the
            # one-process-feeds-8-shards mesh8 ratio (noisier at
            # steady-state magnitudes) is the fallback
            scale2 = ((e2e.get("mesh8") or {}).get("host_scale_2proc")
                      or {}).get("worker_over_serial")
            host = e2e.get("host_cpu_s_per_pair_day")
            proj = e2e.get("projected_pair_year_s_v5e8_pcie_host")
            use = scale2 or ratio
            if use and host and proj:
                # clamp from the e2e section's RAW projection, not the
                # previously clamped value: derive() runs on every
                # marker merge, and an early mesh8-ratio clamp must be
                # superseded — not floored — when the preferred
                # worker_over_serial scaler arrives later
                base = e2e.setdefault(
                    "projected_pair_year_s_v5e8_pcie_host_raw", proj)
                tail = e2e.get("writer_drain_tail_s", 0.0)
                m8 = host * use
                e2e["mesh8_host_s_per_pair_day_scaled"] = round(m8, 3)
                e2e["host_scale_source"] = (
                    "worker_over_serial" if scale2 else
                    "mesh8_host_cost_ratio")
                e2e["projected_pair_year_s_v5e8_pcie_host"] = round(
                    max(base, m8 * 366 / 8 + tail), 1)

    def write_partial(self):
        try:
            os.makedirs(os.path.dirname(_PARTIAL), exist_ok=True)
            with open(_PARTIAL, "w") as f:
                json.dump(self.artifact, f, indent=1)
        except Exception:
            pass

    def emit(self):
        if self.emitted:
            return
        self.emitted = True
        self.artifact["sections"] = self.sections
        self.artifact["elapsed_s"] = round(time.time() - self.t0, 1)
        self.write_partial()
        # full artifact first (humans / logs), COMPACT line LAST: the
        # driver records only a 2000-char stdout tail and parses the
        # final line — round 4's ~4 KB single line lost its head and
        # parsed as null (VERDICT r4 ask #1). Keep the last line <1 KB.
        print(json.dumps(self.artifact), flush=True)
        print(json.dumps(self.compact()), flush=True)

    def compact(self):
        """<1 KB summary carrying the driver schema + headline numbers;
        full detail lives in benchmarks/bench_partial.json."""
        a = self.artifact
        e2e = a.get("e2e") if isinstance(a.get("e2e"), dict) else {}
        fast = e2e.get("fast_storage") or {}
        ok = sum(1 for s in self.sections.values()
                 if s.get("status") in ("ok", "cached"))
        comp = {
            "metric": a.get("metric"), "value": a.get("value"),
            "unit": a.get("unit"), "vs_baseline": a.get("vs_baseline"),
            "roofline_pct": a.get("roofline_pct"),
            "ms_per_batch_min": (a.get("ms_per_batch") or {}).get("min"),
            "e2e_s_per_pair_day": e2e.get("seconds_per_pair_day"),
            "fast_storage_s_per_pair_day": fast.get(
                "seconds_per_pair_day"),
            "pcie_pair_year_s": e2e.get(
                "projected_pair_year_s_v5e8_pcie_host"),
            "mesh8_host_cost_ratio": e2e.get("mesh8_host_cost_ratio"),
            "worker_over_serial": ((e2e.get("mesh8") or {}).get(
                "host_scale_2proc") or {}).get("worker_over_serial"),
            "codec_off_parity_max_abs": e2e.get(
                "codec_off_parity_max_abs"),
            "sections_ok": f"{ok}/{len(self.sections)}",
            "elapsed_s": a.get("elapsed_s"),
            "detail": "benchmarks/bench_partial.json",
        }
        if a.get("error"):
            comp["error"] = str(a["error"])[:300]
        comp = {k: v for k, v in comp.items() if v is not None}
        # belt-and-braces: the <1 KB bound is the whole point (the
        # driver's 2000-char stdout tail) — drop optional fields until
        # it HOLDS, 'detail' (the pointer to the full artifact) last
        for k in ("codec_off_parity_max_abs", "worker_over_serial",
                  "mesh8_host_cost_ratio", "ms_per_batch_min",
                  "fast_storage_s_per_pair_day", "pcie_pair_year_s",
                  "elapsed_s", "detail"):
            if len(json.dumps(comp)) <= 1000:
                break
            comp.pop(k, None)
        if len(json.dumps(comp)) > 1000 and "error" in comp:
            # never DROP the failure signal; shorten it
            comp["error"] = comp["error"][:100]
        return comp

    # -- signals ----------------------------------------------------

    def install_handlers(self):
        def bail(signum, frame):
            if self.child is not None:
                try:
                    # recover the markers the in-flight child already
                    # streamed before discarding it — a deadline/TERM
                    # mid-section must still cost only the unfinished
                    # part of that section, not its whole output
                    self.child.kill()
                    out, _ = self.child.communicate(timeout=5)
                    for line in (out or "").splitlines():
                        if line.startswith(_MARK):
                            try:
                                self.merge(json.loads(
                                    line[len(_MARK):]))
                            except Exception:
                                pass
                except Exception:
                    pass
            self.artifact.setdefault(
                "error", f"terminated by signal {signum} "
                         f"at {time.time() - self.t0:.0f}s")
            self.emit()
            os._exit(0)
        for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
            try:
                signal.signal(sig, bail)
            except Exception:
                pass
        # backstop: even if budget accounting slips, the alarm emits
        # before an external killer does
        try:
            signal.alarm(max(1, int(self.deadline)))
        except Exception:
            pass

    # -- sections ---------------------------------------------------

    def run_section(self, name, budget, extra_env=None,
                    extra_args=()):
        """Run ``bench.py --section name`` as a child with a hard
        timeout; merge every @@BENCH@@ marker it printed (also the
        partial ones of a timed-out child). Records per-section status."""
        # never grant more than the overall deadline has left (section
        # floor budgets could otherwise overrun it, leaving the alarm
        # backstop to kill the child uncollected)
        budget = min(budget, self.remaining() - 15)
        if budget <= 5:
            self.sections[name] = {"status": "skipped",
                                   "reason": "no budget left"}
            return False
        t0 = time.time()
        env = dict(os.environ)
        if extra_env:
            env.update(extra_env)
        flags = list(self.argv)
        if self.artifact.get("small_mode") and "--small" not in flags:
            flags.append("--small")
        cmd = [sys.executable, os.path.abspath(__file__),
               "--section", name, *extra_args, *flags]
        status, out_text = "ok", ""
        try:
            self.child = subprocess.Popen(
                cmd, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True, env=env)
            try:
                out_text, _ = self.child.communicate(timeout=budget)
                if self.child.returncode != 0:
                    status = f"exit {self.child.returncode}"
            except subprocess.TimeoutExpired:
                self.child.kill()
                rest, _ = self.child.communicate()
                out_text = (out_text or "") + (rest or "")
                status = "timeout"
        except Exception as error:
            status = f"error: {error}"
        finally:
            self.child = None
        got = 0
        for line in (out_text or "").splitlines():
            if line.startswith(_MARK):
                try:
                    self.merge(json.loads(line[len(_MARK):]))
                    got += 1
                except Exception:
                    pass
        rec = {"status": status, "wall_s": round(time.time() - t0, 1)}
        if status != "ok":
            # the child's dying words: F/fatal lines carry the actual
            # abort reason (e.g. XLA collective rendezvous timeouts);
            # plus a bounded tail of everything else
            lines = [ln for ln in (out_text or "").splitlines()
                     if not ln.startswith(_MARK)]
            fatal = [ln for ln in lines
                     if ln[:1] == "F" or "Check failure" in ln
                     or "Error" in ln]
            if fatal:
                rec["fatal"] = " | ".join(fatal[-3:])[-600:]
            if lines:
                rec["tail"] = " | ".join(lines[-3:])[-400:]
        self.sections[name] = rec
        self.write_partial()
        return status == "ok" and got > 0

    def run(self):
        self.install_handlers()
        small = ("--small" in self.argv
                 or os.environ.get("XCORR_BENCH_SMALL") == "1")

        # 1. device probe: bounds backend init + first execute (the
        # tunnel can hang EITHER uninterruptibly — CLAUDE.md outage
        # modes; a probe child with a timeout is the only safe check).
        # A fast non-zero exit is also surfaced (round-3 advisory).
        probe_budget = min(
            float(os.environ.get("XCORR_BENCH_INIT_TIMEOUT", "900")),
            max(self.remaining() - 120, 60))
        device_ok = self.run_section("probe", probe_budget)
        if not device_ok:
            st = self.sections.get("probe", {}).get("status")
            self.artifact["error"] = (
                f"device init+execute probe failed ({st}); "
                f"device sections skipped")
        if self.artifact.get("platform") == "cpu" \
                and "--full" not in self.argv:
            small = True
        self.artifact["small_mode"] = small

        # 2. reference constant: cached per host (measuring it costs
        # ~2 min of day-scale single-core numpy — not worth re-paying
        # every run; VERDICT r3 ask 1c)
        ref = None
        if not small and os.path.exists(_REF_CACHE):
            try:
                with open(_REF_CACHE) as f:
                    ref = json.load(f)
            except Exception:
                ref = None
        if (ref and ref.get("n") == _geometry(small)[0]
                and ref.get("host") == _host_id()):
            self.merge({"t_ref_s": ref["t_ref_s"]})
            self.sections["reference"] = {"status": "cached"}
        else:
            self.run_section(
                "reference", min(300, self.remaining() - 60))

        if device_ok:
            # 3. kernel headline — the single most important number;
            # gets the lion's share of any tight budget
            self.run_section(
                "kernel",
                min(1500 if not small else 300,
                    max(self.remaining() - 500, 240)))

            if "--sweep" in self.argv:
                self.run_section("sweep",
                                 min(600, self.remaining() - 400))

            # 4. e2e campaign (unless suppressed)
            if "--e2e" in self.argv or (not small and
                                        "--no-e2e" not in self.argv):
                self.run_section(
                    "e2e", max(self.remaining() - 400, 120))

        # 5. mesh-8 host-cost measurement: cpu platform, lands even
        # with the tunnel down
        if not small and "--no-e2e" not in self.argv:
            self.run_section(
                "mesh8", min(600, self.remaining() - 45),
                extra_env={
                    "XLA_FLAGS":
                        (os.environ.get("XLA_FLAGS", "") +
                         " --xla_force_host_platform_device_count=8"
                         # raise the collective rendezvous F-check
                         # (40 s default): on a loaded 1-core host
                         # even the fs=6.25 shard programs can arrive
                         # >40 s apart (SIGABRT observed r5 on a
                         # contended run; a false alarm, as meshday
                         # proves at fs=50)
                         " --xla_cpu_collective_call_terminate_timeout"
                         "_seconds=900").strip(),
                    # mesh8 must not inherit a forced wire codec
                    "XCORR_WIRE_PACK": "0",
                })

        # 5b. production-geometry multi-device proof: one fs=50 day
        # pack through 2- and 8-device CPU meshes with the collective
        # rendezvous F-check timeout raised (the 40 s default is a
        # false alarm on 1 core running shard programs sequentially)
        if not small and "--no-e2e" not in self.argv:
            self.run_section(
                "meshday", min(900, self.remaining() - 45),
                extra_env={
                    "XLA_FLAGS":
                        (os.environ.get("XLA_FLAGS", "") +
                         " --xla_force_host_platform_device_count=8"
                         " --xla_cpu_collective_call_terminate_timeout"
                         "_seconds=900").strip(),
                    "XCORR_WIRE_PACK": "0",
                })

        # 6. per-config results recorded by
        # `benchmarks/run_configs.py --save` (BASELINE.md's five
        # workloads), inlined so the driver artifact carries them
        cfg = os.path.join(_REPO, "benchmarks", "results_latest.json")
        if os.path.exists(cfg):
            try:
                with open(cfg) as f:
                    self.merge({"configs_recorded": json.load(f)})
            except Exception:
                pass

        self.emit()


def main():
    argv = sys.argv[1:]
    if "--mesh8-child" in argv:
        _heap_reuse()
        _mesh8_host_child()
        return
    if "--oracle-child" in argv:
        _heap_reuse()
        _e2e_oracle_child()
        return
    if "--section" in argv:
        # child mode: run one measurement section, stream markers.
        # The parent decides small mode (it knows the probed platform)
        # and passes --small explicitly.
        i = argv.index("--section")
        name = argv[i + 1]
        small = ("--small" in argv
                 or os.environ.get("XCORR_BENCH_SMALL") == "1")
        plat = os.environ.get("XCORR_BENCH_PLATFORM")
        if plat and name not in ("mesh8", "meshday"):  # these pin cpu
            # config update (not the env var): the axon plugin ignores
            # JAX_PLATFORMS — lets the whole bench run offline on cpu
            import jax
            jax.config.update("jax_platforms", plat)
        _heap_reuse()
        {"probe": lambda: _section_probe(),
         "kernel": lambda: _section_kernel(small),
         "sweep": lambda: _section_sweep(small),
         "reference": lambda: _section_reference(small),
         "e2e": lambda: _section_e2e(small),
         "mesh8": lambda: _section_mesh8(small),
         "meshday": lambda: _section_mesh_day(small)}[name]()
        return

    deadline = float(os.environ.get("XCORR_BENCH_DEADLINE", "2400"))
    orch = _Orchestrator(deadline, argv)
    import atexit
    atexit.register(orch.emit)
    try:
        orch.run()
    except Exception as error:
        orch.artifact.setdefault("error",
                                 f"{type(error).__name__}: {error}")
        orch.emit()


if __name__ == "__main__":
    main()
