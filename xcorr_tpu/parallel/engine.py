r"""
:mod:`parallel.engine` -- Device-preprocessed dataset correlation
=================================================================

The high-throughput alternative to :func:`xcorr_tpu.core.process`: instead
of host-preprocessing each (pair, window) through the Trace methods
(reference semantics, ``xcorr/core/process.py:82-172``), this engine

1. fetches each receiver's RAW day coverage ONCE (the reference re-fetches
   overlapping windows from the archive per step — at the production 87.5%
   overlap that reads every sample 8x),
2. ships each raw span to the device ONCE and slices the overlapping
   windows on device (traced-offset dynamic slices inside the jit) — an
   8x cut in host->device transfer at production overlap,
3. runs the compiled per-channel preprocess chains + the four-step/Pallas
   correlation (:class:`xcorr_tpu.parallel.pipeline.MultiSpanPipeline`),
   stacking every (pair, day) task with a common chain/geometry into one
   device batch — :func:`device_process_bulk` batches MULTIPLE datasets
   (days) per launch, where the kernel's B-sweep pays off (1.22 ms/window
   at the 32-window launch cap vs 1.58 at B=8),
4. fills the dataset's cc/status/offset bookkeeping exactly like the
   host path — deferred into a ``finalize`` callable so a writer thread
   can overlap the device->host readback + netCDF writes with the next
   chunk's fetches and device work.

Equivalence: each window's device input equals the host path's fetched
buffered window, and the compiled chain reproduces the per-trace ops, so
results match the host engine to f32 tolerance (tested).

Limitations (fall back to :func:`core.process`): chains containing
host-only ops with effect (rotate/select/simulate) and R/T component
substitution.
"""

from __future__ import annotations

import json
import os
import threading
import warnings
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

from .. import stream as stream_mod
from .. import util
from ..stream.compile import HOST_OPS
from .pipeline import MultiSpanPipeline, mesh_fingerprint, pad_nwin

__all__ = ["device_process", "device_process_bulk"]

# one compiled pipeline per (ops, geometry, response) config, shared
# across day-tasks and worker threads (every pair-day reuses the same
# executable; the per-day window offsets are runtime arrays, so the key
# holds geometry only)
_pipeline_cache = {}
_pipeline_lock = threading.Lock()


def _response_key(resp):
    if resp is None:
        return None
    return (tuple(map(complex, resp.poles)), tuple(map(complex, resp.zeros)),
            resp.gain, resp.sensitivity, resp.input_units)


def _get_pipeline(ops_a, ops_b, span_a, fs_a, span_b, fs_b,
                  offsets_a, offsets_b,
                  npts_raw_a, npts_raw_b, npts, imin, imax, normalize,
                  resp_a, resp_b, buf_out, mesh=None):
    # offsets are CANONICAL (window positions on the REQUESTED fetch
    # grid, invariant to what the archive returned), so the key — and
    # the compiled executable, in-process and in the persistent
    # cache — repeats chunk-over-chunk and across worker processes
    # the CC precision env is read at TRACE time inside the jitted
    # step (ops.cc.correlate) — it must key the cache, or a process
    # that switches XCORR_CC_PRECISION would silently reuse a pipeline
    # traced at the other precision
    key = (json.dumps(ops_a), json.dumps(ops_b), span_a, fs_a,
           span_b, fs_b, tuple(offsets_a), tuple(offsets_b),
           npts_raw_a, npts_raw_b, npts, imin, imax, normalize,
           _response_key(resp_a), _response_key(resp_b), buf_out,
           mesh_fingerprint(mesh),
           os.environ.get("XCORR_CC_PRECISION") or "high")
    with _pipeline_lock:
        pipe = _pipeline_cache.get(key)
        if pipe is None:
            pipe = MultiSpanPipeline(
                ops_a, ops_b, span_a, fs_a, span_b, fs_b,
                offsets_a, offsets_b,
                npts_raw_a, npts_raw_b, npts,
                index_min=imin, index_max=imax, normalize=normalize,
                response_a=resp_a, response_b=resp_b,
                trim_offset=buf_out, mesh=mesh)
            _pipeline_cache[key] = pipe
    return pipe


def _chain_compilable(ops_list):
    # resample has no device stage either — silently dropping a rate
    # change would correlate mis-sliced data, so route to core.process
    for op, _ in ops_list:
        if op in ("rotate", "select", "simulate", "resample"):
            return False
    return True


def _prepare_pair(dataset, ip, client, inventory, operations, times,
                  window_length, buffer, retry_missing, status, timer,
                  kwargs, caches):
    """Fetch raw spans + window offsets for one pair; mark failures in
    ``status``; return a list of task dicts (one per response epoch;
    empty when nothing is runnable).

    ``caches`` (shared across one :func:`device_process_bulk` call)
    dedups work across pairs with a common receiver — the reference
    workload is receiver-triangle pairs (H03S1-H03S2, H03S1-H03S3, ...)
    where each archive day would otherwise be fetched and shipped once
    PER PAIR. ``caches["fetch"]`` memoizes the archive read per
    (receiver, span); ``caches["span"]`` memoizes the canonicalized
    float32 span so tasks from different pairs share ONE array object,
    which the launch assembly then pools into a single device row.

    Buffers and window offsets are aligned to the REQUESTED sample
    grid, not to whatever trace the archive returned: a day whose data
    starts late or ends short lands shifted inside a zero-filled
    grid-length buffer, windows that fall outside the real data are
    flagged missing, and the executable shapes (span length + offset
    tuples) stay identical chunk-over-chunk and process-over-process
    regardless of archive jitter."""
    pair = str(dataset.coords["pair"].values[ip])
    r_a, r_b = util.receiver.split_pair(pair)[:2]
    cha_a = util.receiver.get_receiver_channel(r_a)
    cha_b = util.receiver.get_receiver_channel(r_b)
    ops_a = operations.get(cha_a)
    ops_b = operations.get(cha_b)
    if ops_a is None or ops_b is None:
        raise ValueError(f"no operations for channels {cha_a}/{cha_b}")
    if cha_a[-1] in "RT" or cha_b[-1] in "RT" or \
            not (_chain_compilable(ops_a) and _chain_compilable(ops_b)):
        raise NotImplementedError(
            "chain not device-compilable; use core.process")

    work = [it for it in range(times.size)
            if status[ip, it] == 0 or (retry_missing
                                       and status[ip, it] == -1)]
    if not work:
        return []

    # raw day coverage for both receivers (one archive read each)
    t0 = times[work[0]] - pd.Timedelta(seconds=window_length / 2 + buffer)
    t1 = times[work[-1]] + pd.Timedelta(seconds=window_length / 2 + buffer)
    span = (t1 - t0).total_seconds()

    def fetch_span(receiver):
        """Fetch the chunk-wide union span for this receiver when
        device_process_bulk marked it profitable, the pending-window
        span otherwise. Returns ``(trace_or_None, grid_t0, grid_span)``
        — the GRID span defines the canonical sample grid everything
        downstream aligns to. It can exceed the fetched span: a tail
        chunk's grid is padded to the full-chunk (canonical) geometry
        so its executables repeat, while the archive request covers
        only the real days (the surplus grid stays zero-filled and no
        valid window touches it)."""
        u = caches.get("union", {}).get(receiver)
        if u is not None:
            req_t0 = u[0]
            req_span = (u[1] - u[0]).total_seconds()
            grid_span = (u[2] - u[0]).total_seconds()
        else:
            req_t0, req_span, grid_span = t0, span, span
        st = client.get_waveforms(
            receiver=receiver,
            time=req_t0 + pd.Timedelta(seconds=req_span / 2),
            centered=True, duration=req_span, buffer=0.0, verb=0,
            **kwargs)
        return (st[0] if len(st) else None), req_t0, grid_span

    def fetch_cached(receiver):
        u = caches.get("union", {}).get(receiver)
        key = (receiver,
               u[0].value if u else t0.value,
               round((u[1] - u[0]).total_seconds(), 6) if u
               else round(span, 6),
               repr(sorted(kwargs.items())))
        with caches["lock"]:
            ent = caches["fetch"].get(key)
            if ent is None:
                # [done, result, ok]: ok False means the owner RAISED
                # (not merely found no data) — waiters then fetch
                # independently instead of inheriting a transient error
                ent = caches["fetch"][key] = [threading.Event(), None,
                                              False]
                owner = True
            else:
                owner = False
        if owner:
            try:
                ent[1] = fetch_span(receiver)
                ent[2] = True
            finally:
                ent[0].set()
            return ent[1]
        ent[0].wait()
        if not ent[2]:
            return fetch_span(receiver)
        return ent[1]

    with timer("fetch-archive"):
        (tr_a, gt0_a, gspan_a) = fetch_cached(r_a)
        (tr_b, gt0_b, gspan_b) = fetch_cached(r_b)
    if tr_a is None or tr_b is None:
        for it in work:
            status[ip, it] = -1
        return []

    fs_a = tr_a.stats.sampling_rate
    fs_b = tr_b.stats.sampling_rate
    npts_raw_a = int(round((window_length + 2 * buffer) * fs_a))
    npts_raw_b = int(round((window_length + 2 * buffer) * fs_b))
    # canonical grid length + where the returned trace sits on it
    need_a = int(round(gspan_a * fs_a))
    need_b = int(round(gspan_b * fs_b))
    shift_a = int(round((pd.Timestamp(tr_a.stats.starttime.ns)
                         - gt0_a).total_seconds() * fs_a))
    shift_b = int(round((pd.Timestamp(tr_b.stats.starttime.ns)
                         - gt0_b).total_seconds() * fs_b))

    # per-WINDOW response epochs: an instrument swap mid-span must not
    # deconvolve later windows with the earlier response (host-path
    # equivalence: core.process resolves the inventory at each window's
    # time). Windows sharing a (resp_a, resp_b) epoch pair become one
    # task; mixed spans split into several tasks over the same fetch.
    resp_pairs = []
    for it in work:
        ra = rb = None
        if inventory is not None:
            try:
                ra = inventory.get_response(r_a, times[it])
                rb = inventory.get_response(r_b, times[it])
            except KeyError:
                ra = rb = None
        resp_pairs.append((ra, rb))

    # static per-window sample offsets on the REQUESTED grid; a window
    # is usable only when it lies fully inside BOTH the real trace and
    # the grid buffer (archive jitter flags windows missing instead of
    # correlating zero-fill)
    def window_offsets(tr, npts_raw, fs, gt0, need, shift):
        idx, starts = [], []
        for it in work:
            start = (times[it] - pd.Timedelta(
                seconds=window_length / 2 + buffer)
                - gt0).total_seconds()
            g0 = int(round(start * fs))   # grid offset
            i0 = g0 - shift               # trace offset
            if i0 < 0 or i0 + npts_raw > tr.stats.npts or \
                    g0 < 0 or g0 + npts_raw > need:
                idx.append(None)
                starts.append(None)
                continue
            idx.append(g0)
            # actual window start time (sample-aligned, after the buffer)
            starts.append(tr.stats.starttime + i0 / fs + buffer)
        return idx, starts

    ia, off_a = window_offsets(tr_a, npts_raw_a, fs_a, gt0_a, need_a,
                               shift_a)
    ib, off_b = window_offsets(tr_b, npts_raw_b, fs_b, gt0_b, need_b,
                               shift_b)
    good = [k for k in range(len(work))
            if ia[k] is not None and ib[k] is not None]
    for k in range(len(work)):
        if k not in good:
            status[ip, work[k]] = -1
    if not good:
        return []

    # keep 'trim' as a positional marker: the compiled chain applies
    # the buffer slice AT the DSL's trim position (host parity — the
    # trailing detrend/taper must act on the FINAL window, not on the
    # buffered one with the ramps sliced off afterwards)
    dev_ops_a = [op for op in ops_a
                 if op[0] == "trim" or op[0] not in HOST_OPS]
    dev_ops_b = [op for op in ops_b
                 if op[0] == "trim" or op[0] not in HOST_OPS]

    # host parity: a chain that deconvolves needs a response — without
    # one the host path raises per window (status -1); never fall back
    # to a silent flat/unity response
    def _needs_response(ops_list):
        return any(op == "remove_response"
                   or (op == "remove_sensitivity" and "sensitivity" not
                       in params)
                   for op, params in ops_list)

    if _needs_response(dev_ops_a) or _needs_response(dev_ops_b):
        na = _needs_response(dev_ops_a)
        nb = _needs_response(dev_ops_b)
        kept = []
        for k in good:
            ra, rb = resp_pairs[k]
            if (na and ra is None) or (nb and rb is None):
                status[ip, work[k]] = -1
            else:
                kept.append(k)
        good = kept
        if not good:
            return []

    epochs = {}
    for k in good:
        rk = (_response_key(resp_pairs[k][0]),
              _response_key(resp_pairs[k][1]))
        epochs.setdefault(rk, []).append(k)

    def canonicalize(tr, idx, subset, need, shift):
        """Return the receiver's span as ONE grid-length float32 array
        (zero-filled where the archive returned less than requested;
        no valid window touches the fill — window_offsets enforced
        that), memoized per trace so every task (any pair, any day)
        drawing on this receiver holds the SAME object, which the
        launch assembly pools into a single device row shipped once
        per bulk call. Offsets are grid-absolute, so they repeat
        chunk-over-chunk and across processes regardless of what the
        archive actually returned."""
        rel = {k: idx[k] for k in subset}
        # the entry VALUE keeps the trace alive: an id() key is only
        # sound while the object it names cannot be freed (a waiter
        # refetch after an owner error holds its trace nowhere else, and
        # a recycled address would alias another receiver's span)
        key = (id(tr),)
        with caches["lock"]:
            ent = caches["span"].get(key)
        if ent is None:
            buf = np.zeros(need, dtype=np.float32)
            dst0, src0 = max(0, shift), max(0, -shift)
            n = min(int(tr.stats.npts) - src0, need - dst0)
            if n > 0:
                buf[dst0:dst0 + n] = tr.data[src0:src0 + n]
            with caches["lock"]:
                ent = caches["span"].setdefault(key, (tr, buf))
        return ent[1], rel, need

    tasks = []
    for rk, subset in epochs.items():
        resp_a, resp_b = resp_pairs[subset[0]]
        data_a, rel_a, _ = canonicalize(tr_a, ia, subset, need_a,
                                        shift_a)
        data_b, rel_b, _ = canonicalize(tr_b, ib, subset, need_b,
                                        shift_b)
        # tasks sharing this key run through ONE compiled chain + batch
        # structural compatibility only — the launch concatenates each
        # task's per-window offsets, so tasks need not share an offset
        # grid to share an executable-compatible launch (absolute
        # offsets into a chunk union span repeat chunk-over-chunk, so
        # the concatenated tuples — and the compiled executables —
        # still recur)
        group_key = (json.dumps(dev_ops_a), json.dumps(dev_ops_b),
                     need_a, fs_a, need_b, fs_b,
                     npts_raw_a, npts_raw_b, rk)
        tasks.append({
            "ip": ip, "work": work, "good": subset,
            "data_a": data_a, "data_b": data_b,
            "rel_a": rel_a, "rel_b": rel_b,
            "need_a": need_a, "need_b": need_b,
            "off_a": off_a, "off_b": off_b,
            "fs_a": fs_a, "fs_b": fs_b,
            "npts_raw_a": npts_raw_a, "npts_raw_b": npts_raw_b,
            "dev_ops_a": dev_ops_a, "dev_ops_b": dev_ops_b,
            "resp_a": resp_a, "resp_b": resp_b,
            "key": group_key,
        })
    return tasks


def _dataset_geometry(dataset):
    """Per-dataset lag/window constants shared by all its tasks."""
    pre = dataset.coords["pair"].attrs["preprocess"]
    if isinstance(pre, dict):
        operations = pre
        stream_mod.process.check_operations_hash(operations,
                                                 raise_error=True)
    else:
        operations = stream_mod.process.operations_to_dict(pre)

    util.time.update_lag_indices(dataset.coords["lag"])
    lag_attrs = dataset.coords["lag"].attrs
    return {
        "operations": operations,
        "npts": int(lag_attrs["npts"]),
        "imin": int(lag_attrs["index_min"]),
        "imax": int(lag_attrs["index_max"]),
        "fs_out": float(lag_attrs["sampling_rate"]),
        "times": pd.DatetimeIndex(dataset.coords["time"].values),
        "window_length": float(
            dataset.coords["time"].attrs["window_length"]),
        "normalize": dataset["cc"].attrs.get("normalize", 1) == 1,
    }


def _canonical_prefix(spans, canonical_days: int, stride_s: float):
    """True when a receiver's distinct task spans (ns-epoch ``(t0, t1)``
    tuples) look like a prefix of a canonical chunk: equal lengths on a
    uniform ``stride_s`` grid, at most ``canonical_days`` of them —
    the span-level analogue of the periodicity ``_phantom_pad``
    demands of launch groups."""
    spans = sorted(spans)
    if len(spans) > canonical_days:
        return False
    starts = [s0 for s0, _ in spans]
    lens = {s1 - s0 for s0, s1 in spans}
    gaps = {b - a for a, b in zip(starts, starts[1:])}
    stride_ns = int(round(stride_s * 1e9))
    return len(lens) == 1 and (not gaps or gaps == {stride_ns})


def _phantom_pad(group, canonical_days: int, stride_s: float):
    """Pad a launch group of day-tasks to the canonical chunk size with
    PHANTOM tasks: copies of the last real task whose window offsets
    shift by whole day strides into the (zero-filled, canonically
    extended) union grid. Greedy packing then reproduces the full
    chunks' exact offset tuples, so a tail chunk reuses the campaign's
    compiled executables instead of compiling its own.

    Strictly guarded — padding only applies to groups that look like a
    canonical chunk prefix: every task repeats the previous task's
    window pattern shifted by exactly one stride, on the SAME pooled
    union-span arrays, and the shifted phantom windows must lie inside
    the canonical grid. Groups failing any check (mixed pairs, sparse
    resumes, disengaged unions, sub-stride jitter) are left untouched
    and simply compile their own executable as before."""
    n = len(group)
    if n == 0 or n >= canonical_days:
        return
    last = group[-1]
    sa = int(round(stride_s * last["fs_a"]))
    sb = int(round(stride_s * last["fs_b"]))

    def offs(t):
        return (sorted(t["rel_a"][k] for k in t["good"]),
                sorted(t["rel_b"][k] for k in t["good"]))

    offsets = [offs(t) for t in group]
    for prev, cur, (pa, pb), (ca, cb) in zip(group, group[1:],
                                             offsets, offsets[1:]):
        if (id(cur["data_a"]) != id(prev["data_a"])
                or id(cur["data_b"]) != id(prev["data_b"])
                or ca != [v + sa for v in pa]
                or cb != [v + sb for v in pb]):
            return
    phantoms = []
    for j in range(1, canonical_days - n + 1):
        rel_a = {k: v + j * sa for k, v in last["rel_a"].items()}
        rel_b = {k: v + j * sb for k, v in last["rel_b"].items()}
        if (max(rel_a.values()) + last["npts_raw_a"] > last["need_a"]
                or max(rel_b.values()) + last["npts_raw_b"]
                > last["need_b"]):
            # grid was not canonically extended (union disengaged or no
            # room): cannot place phantoms — leave the group as-is
            # (all-or-nothing: a PARTIAL pad would compile a unique
            # executable matching neither the padded nor the raw shape)
            return
        phantoms.append({**last, "rel_a": rel_a, "rel_b": rel_b,
                         "phantom": True})
    group.extend(phantoms)


def device_process_bulk(datasets, client, inventory=None,
                        buffer: float = None, retry_missing: bool = False,
                        mesh=None, verb: int = 1, timer=None,
                        fetch_workers: int = None,
                        max_windows_per_launch: int = 32,
                        canonical_days: int = None,
                        canonical_stride_s: float = None, **kwargs):
    """Prepare and LAUNCH every unprocessed (pair, time) window of
    several datasets (typically several days x pairs) as shared device
    batches; defer readback/bookkeeping to the returned callable.

    Returns ``(finalize, fallback)``:

    * ``finalize(on_complete=None)`` blocks on the device results,
      scatters them into the datasets and finishes their provenance —
      run it from a writer thread to overlap device->host readback with
      the next chunk's fetches and device dispatches. ``on_complete``
      fires per dataset the moment it is complete, so callers can
      pipeline shard writes against the remaining readbacks.
      Idempotent-safe to call once.
    * ``fallback``: datasets whose chains are not device-compilable
      (route them through :func:`xcorr_tpu.core.process`).

    Tasks across ALL datasets with a common (chain, geometry, response)
    key stack into shared launches, packed to at most
    ``max_windows_per_launch`` windows each (default 32 — the kernel's
    B-sweep saturates by ~32 and a full 64+-window day-scale launch
    oversubscribes the 16 GB chip; see the HBM-budget comment below).
    At the production config an 8-day chunk therefore dispatches as
    2 launches of 32 windows.

    ``canonical_days`` + ``canonical_stride_s`` declare the caller's
    chunking policy (``days_per_launch`` day-tasks at the campaign's
    day stride): a TAIL chunk with fewer days then (a) pads each
    receiver's union-span GRID to the full-chunk geometry (the archive
    fetch still covers only the real days; the surplus grid is
    zero-filled and no valid window addresses it) and (b) pads each
    launch group with PHANTOM day-tasks — the last real task's window
    offsets shifted by whole day strides into the zero-filled grid —
    so the greedy packing reproduces the full chunks' exact offset
    tuples. The tail then reuses the campaign's existing executables
    instead of compiling its own (a multi-minute cost through tunneled
    runtimes). Phantom windows compute garbage (0/0 normalization) that
    is sliced off ON DEVICE before readback; all-phantom packs are
    dropped before launch.
    """
    if timer is None:
        timer = util.profiler.StageTimer()  # unreported no-op sink
    if fetch_workers is None:
        # parallel archive fetches only pay off with real cores; on a
        # 1-core host the threads just fight the GIL (and, before the
        # M_ARENA_MAX pin, each paid fresh-arena page faults)
        import os
        fetch_workers = min(4, os.cpu_count() or 1)

    fallback, items = [], []
    for dataset in datasets:
        geo = _dataset_geometry(dataset)
        dataset.attrs["history"] = (
            dataset.attrs.get("history", "") +
            f", Device-process started @ {pd.to_datetime('now')}")
        items.append((dataset, geo))

    # fetch + window preparation, threaded across (dataset, pair)
    jobs = []
    for dataset, geo in items:
        buf = geo["window_length"] * 0.05 if buffer is None else buffer
        status = dataset["status"].values
        for ip in range(dataset.coords["pair"].values.size):
            jobs.append((dataset, geo, buf, status, ip))

    # shared across this bulk call: archive fetches and canonicalized
    # spans dedup across pairs with a common receiver (cleared after
    # prepare — tasks hold the canonicalized arrays, the raw traces can
    # then be collected)
    caches = {"fetch": {}, "span": {}, "lock": threading.Lock()}

    # per-receiver UNION span across the chunk: at the production
    # config consecutive days' task spans overlap ~50% (each (pair,
    # day) task needs window_length + day + 2*buffer ~ 47 h), so one
    # continuous fetch per receiver roughly halves archive reads,
    # host copies AND host->device span bytes for multi-day chunks.
    # Guarded per receiver: only when the union is actually smaller
    # than the per-task fetches it replaces (a sparse resume of
    # scattered days would otherwise fetch the whole gap).
    union_bounds, union_spans, union_single = {}, {}, {}
    for dataset, geo, buf, status, ip in jobs:
        times = geo["times"]
        # the PENDING windows only (mirrors _prepare_pair's work set):
        # a partial-day resume must not widen the union to done windows
        work = [it for it in range(times.size)
                if status[ip, it] == 0 or (retry_missing
                                           and status[ip, it] == -1)]
        if not work:
            continue
        pair = str(dataset.coords["pair"].values[ip])
        r_a, r_b = util.receiver.split_pair(pair)[:2]
        half = pd.Timedelta(seconds=geo["window_length"] / 2 + buf)
        t0, t1 = times[work[0]] - half, times[work[-1]] + half
        for r in (r_a, r_b):
            cur = union_bounds.get(r)
            union_bounds[r] = (t0, t1) if cur is None else \
                (min(t0, cur[0]), max(t1, cur[1]))
            # DISTINCT per-task spans: the fetch cache already dedups
            # identical spans across pairs sharing this receiver, so
            # the union must beat the deduped per-task cost, not the
            # naive per-pair sum
            union_spans.setdefault(r, set()).add((t0.value, t1.value))
            union_single[r] = max(union_single.get(r, 0.0),
                                  (t1 - t0).total_seconds())
    caches["union"] = {}
    for r, (t0, t1) in union_bounds.items():
        # engagement guard on the UNEXTENDED union so full and tail
        # chunks of one campaign take the same decision
        if (t1 - t0).total_seconds() > sum(
                (s1 - s0) / 1e9 for s0, s1 in union_spans[r]):
            continue
        t1_grid = t1
        if canonical_days and canonical_stride_s:
            # extend ONLY when this receiver's task spans form a
            # canonical-chunk prefix — equal-length spans on a uniform
            # canonical-stride grid, at most canonical_days of them
            # (the same periodicity _phantom_pad later demands). A
            # sparse resume or a mixed-cadence chunk would pay the
            # zero-fill h2d of a full-chunk grid while the phantom
            # guard declines anyway (advisor r4).
            if _canonical_prefix(union_spans[r], canonical_days,
                                 canonical_stride_s):
                # canonical grid: what a FULL chunk of canonical_days
                # day-tasks would span from this t0 (exact equality
                # for full contiguous chunks — the extension is then
                # a no-op)
                ext = t0 + pd.Timedelta(
                    seconds=(canonical_days - 1) * canonical_stride_s
                    + union_single[r])
                t1_grid = max(t1, ext)
        caches["union"][r] = (t0, t1, t1_grid)

    def prep(job):
        dataset, geo, buf, status, ip = job
        try:
            ts = _prepare_pair(dataset, ip, client, inventory,
                               geo["operations"], geo["times"],
                               geo["window_length"], buf, retry_missing,
                               status, timer, kwargs, caches=caches)
        except NotImplementedError:
            raise  # chain not device-compilable -> host fallback
        except Exception as error:
            # per-(pair,day) error isolation, like the reference's
            # per-task dask.delayed boundary (xcorr/core/lazy.py:26-82):
            # one corrupt archive day must not fail its whole chunk.
            # Flag this pair's pending windows missing and carry on.
            warnings.warn(
                f"prepare failed for pair {ip} "
                f"({type(error).__name__}: {error}); flagged missing",
                UserWarning)
            for it in range(geo["times"].size):
                if status[ip, it] == 0 or (retry_missing
                                           and status[ip, it] == -1):
                    status[ip, it] = -1
            return []
        for t in ts:
            t["dataset"] = dataset
            t["geo"] = geo
            t["buf"] = buf
            t["status"] = status
        return ts

    bad = set()
    tasks = []
    with timer("prepare"):
        if fetch_workers > 1 and len(jobs) > 1:
            # pool threads have their OWN thread_time clocks: wrap each
            # job in a worker-side stage so the prep CPU is recorded on
            # multi-core hosts ("prepare" itself only sees the main
            # thread, which mostly waits here). Nested "fetch-archive"
            # CPU is contained in this stage's cpu_s, same as in the
            # serial path where "prepare" contains it.
            def prep_timed(job):
                with timer("prepare-worker"):
                    return prep(job)

            with ThreadPoolExecutor(max_workers=fetch_workers) as ex:
                futs = [(job, ex.submit(prep_timed, job)) for job in jobs]
                for job, f in futs:
                    try:
                        tasks.extend(f.result())
                    except NotImplementedError:
                        bad.add(id(job[0]))
        else:
            for job in jobs:
                try:
                    tasks.extend(prep(job))
                except NotImplementedError:
                    bad.add(id(job[0]))
    caches["fetch"].clear()
    caches["span"].clear()
    if bad:
        fallback.extend(d for d, _ in items if id(d) in bad)
        items = [(d, g) for d, g in items if id(d) not in bad]
        tasks = [t for t in tasks if id(t["dataset"]) not in bad]

    groups = {}
    for t in tasks:
        geo = t["geo"]
        buf_out = int(round(t["buf"] * geo["fs_out"]))
        key = t["key"] + (geo["npts"], geo["imin"], geo["imax"],
                          geo["normalize"], buf_out)
        t["buf_out"] = buf_out
        groups.setdefault(key, []).append(t)

    if canonical_days and canonical_stride_s:
        for group in groups.values():
            _phantom_pad(group, canonical_days, canonical_stride_s)

    # day-scale HBM budget: a single launch of the whole multi-day
    # batch (64+ windows) oversubscribes the 16 GB chip (stacks + chain
    # intermediates + the CC kernel's working set) and the runtime
    # thrashes — measured 30 s/day vs ~2 s at bounded sizes. The kernel
    # B-sweep saturates by ~32 windows anyway, so pack each group into
    # launches of at most ``max_windows_per_launch`` windows; packs of
    # equal shape share one executable (canonical offsets).
    packs = []
    for group in groups.values():
        pack, nwin = [], 0
        for t in group:
            w = len(t["good"])
            if pack and nwin + w > max_windows_per_launch:
                packs.append(pack)
                pack, nwin = [], 0
            pack.append(t)
            nwin += w
        if pack:
            packs.append(pack)
    # phantoms exist only to complete the pack holding the last real
    # windows; a pack of NOTHING but phantoms would burn device time on
    # discarded work (its executable, shared with the full chunks, is
    # already compiled)
    packs = [p for p in packs if any(not t.get("phantom") for t in p)]

    # one host->device transfer per unique span-stack composition: with
    # chunk-union spans, every pack of a chunk draws on the SAME pooled
    # rows, so the (multi-hundred-MB at day scale) span stack ships
    # once and later packs reuse the resident device buffer. Bounded to
    # the last two compositions (the a/b sides of the current group —
    # same-group packs are consecutive): scattered-day campaigns with
    # disengaged unions must not pin every pack's stacks in HBM at once
    dev_stacks = {}

    def _dev_stack(pool):
        key = tuple(id(a) for a in pool)
        dev = dev_stacks.get(key)
        if dev is None:
            host = pool[0][None] if len(pool) == 1 else np.stack(pool)
            sharding = None
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                sharding = NamedSharding(mesh, PartitionSpec())
            # util.xfer.ship_packed: on tunneled links the span stack
            # crosses the wire as int16 block-float and decodes on
            # device (half the h2d bytes; quantization averages down
            # ~1/sqrt(npts) through the correlation — docstring);
            # plain async device_put elsewhere. Under
            # XCORR_WIRE_SERIALIZE=1 the transfer takes the wire lock
            # so it cannot overlap a readback (measured a LOSS at
            # production shapes — see the xfer.py lock note — kept
            # opt-in for links where duplex contention dominates)
            dev = util.xfer.ship_packed(host, sharding, timer=timer)
            while len(dev_stacks) >= 2:
                dev_stacks.pop(next(iter(dev_stacks)))
            dev_stacks[key] = dev
        return dev

    launches = []
    for group in packs:
        t0g = group[0]
        geo = t0g["geo"]
        # pool identical span objects (pairs sharing a receiver-day;
        # the prepare caches make those the SAME array): each unique
        # span ships to the device ONCE and every window addresses it
        # by its pool row
        pool_a, slot_a, pool_b, slot_b = [], {}, [], {}

        def _slot(pool, slots, arr):
            s = slots.get(id(arr))
            if s is None:
                s = slots[id(arr)] = len(pool)
                pool.append(arr)
            return s

        offsets_a = [(_slot(pool_a, slot_a, t["data_a"]),
                      t["rel_a"][k]) for t in group for k in t["good"]]
        offsets_b = [(_slot(pool_b, slot_b, t["data_b"]),
                      t["rel_b"][k]) for t in group for k in t["good"]]
        nused = len(offsets_a)
        # phantom windows (canonical tail padding) sit AFTER the real
        # tasks' windows — only the real rows are read back
        nreal = sum(len(t["good"]) for t in group
                    if not t.get("phantom"))
        # static dummy windows pad the batch to a mesh-divisible bucket
        # (executable reuse itself comes from canonical offsets; see
        # pad_nwin docstring)
        pad = pad_nwin(nused, mesh) - nused
        offsets_a = tuple(offsets_a + [(0, 0)] * pad)
        offsets_b = tuple(offsets_b + [(0, 0)] * pad)
        with timer("pipeline-build"):
            pipe = _get_pipeline(
                t0g["dev_ops_a"], t0g["dev_ops_b"],
                t0g["need_a"], t0g["fs_a"],
                t0g["need_b"], t0g["fs_b"],
                offsets_a, offsets_b,
                t0g["npts_raw_a"], t0g["npts_raw_b"], geo["npts"],
                geo["imin"], geo["imax"], geo["normalize"],
                t0g["resp_a"], t0g["resp_b"], t0g["buf_out"], mesh=mesh)
        ka = tuple(id(x) for x in pool_a)
        kb = tuple(id(x) for x in pool_b)
        fresh = 0 if ka in dev_stacks else sum(a.nbytes for a in pool_a)
        if kb != ka and kb not in dev_stacks:
            # kb == ka (autocorrelation) reuses side a's fresh transfer
            fresh += sum(b.nbytes for b in pool_b)
        with timer("device-dispatch", nbytes=fresh, items=nreal):
            raw_a = _dev_stack(pool_a)
            raw_b = _dev_stack(pool_b)
        if verb:
            print(f"device_process: {nreal} windows "
                  f"({len(group)} pair-days, "
                  f"{len(pool_a)}+{len(pool_b)} unique spans, "
                  f"{fresh / 1e6:.0f} MB fresh span transfer"
                  + (f", {nused - nreal} phantom windows)"
                     if nused != nreal else ")"))
        with timer("device-dispatch", nbytes=0, items=nreal):
            # slice off the bucket-pad AND phantom rows ON DEVICE
            # (async) so the tunnel/PCIe readback only moves real
            # windows; on tunneled links additionally pack to int16
            # block-float (half the f32 readback bytes,
            # util.xfer.pack_for_wire policy)
            ccf_dev = util.xfer.pack_for_wire(
                pipe.launch(raw_a, raw_b)[:nreal])
            # kick the device->host copy off NOW (non-blocking): the
            # transfer then rides the runtime while the remaining packs
            # fetch/dispatch and while finalize scatters earlier
            # launches, instead of starting when finalize first blocks.
            # prefetch() declines when the fetch will be row-chunked —
            # an in-flight monolithic copy would just double the wire
            # traffic there (util.xfer.prefetch docstring)
            util.xfer.prefetch(ccf_dev)
        launches.append((group, nreal, ccf_dev))

    # windows still in flight per dataset: lets finalize() hand each
    # dataset to the caller AS SOON as its last launch is read back, so
    # shard writes (zlib, GIL-free) overlap the remaining device->host
    # readbacks (also GIL-free) instead of queueing behind them
    launched_windows = {}
    for group, nused, _ in launches:
        for t in group:
            if t.get("phantom"):
                continue
            key = id(t["dataset"])
            launched_windows[key] = launched_windows.get(key, 0) \
                + len(t["good"])

    def finalize(on_complete=None):
        """Block on the device results and scatter them into the
        datasets. ``on_complete(dataset)``, when given, fires once per
        dataset the moment all its windows are scattered and its
        provenance is finished — call ``write`` there to pipeline shard
        writes against the remaining readbacks."""
        finished = set()

        def finish(dataset):
            if id(dataset) in finished:
                return
            finished.add(id(dataset))
            _finish(dataset)
            if on_complete is not None:
                on_complete(dataset)

        for group, nused, ccf_dev in launches:
            # per-task row ranges in launch order (phantoms carry no
            # readback rows)
            bounds, b = [], 0
            for t in group:
                if t.get("phantom"):
                    continue
                bounds.append((b, b + len(t["good"]), t))
                b += len(t["good"])
            cursor = [0]

            def scatter_ready(ccf, nrows, bounds=bounds, cursor=cursor):
                """Scatter every task whose rows have fully landed;
                fires per landed readback chunk (util.xfer.device_fetch
                row_done), so a dataset completing MID-readback hands
                off to the caller's writer immediately — the writer-
                drain tail shrinks to the last dataset's write instead
                of the last chunk's whole write queue."""
                complete = []
                with timer("bookkeeping"):
                    while (cursor[0] < len(bounds)
                           and bounds[cursor[0]][1] <= nrows):
                        b0, b1, t = bounds[cursor[0]]
                        cursor[0] += 1
                        geo = t["geo"]
                        times = geo["times"]
                        wl = geo["window_length"]
                        dataset = t["dataset"]
                        ip = t["ip"]
                        for b_, k in enumerate(t["good"], start=b0):
                            it = t["work"][k]
                            dataset["cc"].values[ip, it] = ccf[b_]
                            t["status"][ip, it] = 1
                            dataset["pair_offset"].values[ip, it] = \
                                t["off_a"][k] - t["off_b"][k]
                            dataset["time_offset"].values[ip, it] = \
                                (pd.Timestamp(t["off_a"][k].ns)
                                 + pd.to_timedelta(wl / 2, unit="s")
                                 - times[it]) / pd.Timedelta("1s")
                        key = id(dataset)
                        launched_windows[key] -= len(t["good"])
                        if launched_windows[key] == 0:
                            complete.append(dataset)
                for dataset in complete:
                    finish(dataset)

            with timer("device-readback"):
                # row-chunked + async-piped: a monolithic multi-hundred-
                # MB read degrades to single-digit MB/s through tunneled
                # runtimes (util.xfer.device_fetch docstring). The
                # row_done hook streams completed tasks to the scatter
                # while later rows are still on the wire.
                util.xfer.device_fetch(ccf_dev, row_done=scatter_ready)
        for dataset, _ in items:
            finish(dataset)
        return [d for d, _ in items]

    return finalize, fallback


def device_process(dataset, client, inventory=None, buffer: float = None,
                   retry_missing: bool = False, mesh=None, verb: int = 1,
                   timer=None, **kwargs):
    """Correlate every unprocessed (pair, time) window of ONE dataset
    with on-device preprocessing. API mirrors
    :func:`xcorr_tpu.core.process.process`; raises NotImplementedError
    when the chains are not device-compilable (callers fall back to the
    host path).

    Multi-pair datasets are handled in full: pairs whose preprocess
    chains, geometry and responses coincide are stacked into ONE device
    batch (pairs x windows); the rest run per group. For multi-DAY
    batching use :func:`device_process_bulk`.

    ``timer``: optional :class:`xcorr_tpu.util.profiler.StageTimer` that
    accumulates per-stage wall time (fetch / pipeline-build / device /
    bookkeeping) across day-tasks; with ``verb >= 2`` and no timer given,
    a local one is created and its report printed at the end.
    """
    own_timer = timer is None and verb >= 2
    if own_timer:
        timer = util.profiler.StageTimer()
    finalize, fallback = device_process_bulk(
        [dataset], client, inventory=inventory, buffer=buffer,
        retry_missing=retry_missing, mesh=mesh, verb=verb, timer=timer,
        **kwargs)
    if fallback:
        raise NotImplementedError(
            "chain not device-compilable; use core.process")
    finalize()
    if own_timer:
        print(timer.report())
    return dataset


def _finish(dataset):
    dataset.attrs["history"] += \
        f", Device-process ended @ {pd.to_datetime('now')}"
    if dataset["cc"].attrs.get("bias_correct", 0) == 1:
        dataset["cc"] = dataset["cc"].signal.unbias()
    dataset.attrs["sha256_hash_metadata"] = util.hasher.hash_Dataset(
        dataset, metadata_only=True)
