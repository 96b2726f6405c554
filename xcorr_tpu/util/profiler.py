r"""
:mod:`util.profiler` -- Performance observability
=================================================

The reference's only observability is the Dask dashboard link
(``xcorr/scripts/utils.py:72``) and completion percentages
(``xcorr/core/lazy.py:363-367``); SURVEY.md §5 calls for JAX profiler
hooks plus per-stage wall/throughput counters. This module provides both:

* :class:`StageTimer` — lightweight nested wall-clock/throughput counters
  for pipeline stages (host IO, device compute, writes), with a one-line
  report.
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace.
* :func:`device_memory` — current device memory stats where the backend
  exposes them.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict

__all__ = ["StageTimer", "trace", "device_memory", "parse_device_trace"]


class StageTimer:
    """Accumulate per-stage wall time and optional byte/item throughput.

    >>> timer = StageTimer()
    >>> with timer("ingest", nbytes=123456):
    ...     pass
    >>> print(timer.report())
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._wall = defaultdict(float)
        self._cpu = defaultdict(float)
        self._pcpu = defaultdict(float)
        self._bytes = defaultdict(int)
        self._items = defaultdict(int)
        self._calls = defaultdict(int)
        self._last_end = {}

    @contextlib.contextmanager
    def __call__(self, stage: str, nbytes: int = 0, items: int = 0):
        # thread CPU alongside wall: on a contended host (or with wire
        # waits inside the stage) wall >> cpu, and the cpu number is the
        # contention-free cost a dedicated core would pay. Stages timed
        # from different threads each measure their own thread. A stage
        # that fans work out to a thread pool shows cpu ~0 here (the
        # pool threads' CPU lands on THEIR clocks) — process_cpu_s
        # covers it: the whole-process CPU delta, exact when nothing
        # else runs concurrently (e.g. campaign preflight stages), an
        # upper bound otherwise.
        t0 = time.perf_counter()
        c0 = time.thread_time()
        p0 = time.process_time()
        try:
            yield self
        finally:
            with self._lock:  # stages may be timed from pool threads
                self._wall[stage] += time.perf_counter() - t0
                self._cpu[stage] += time.thread_time() - c0
                self._pcpu[stage] += time.process_time() - p0
                self._bytes[stage] += nbytes
                self._items[stage] += items
                self._calls[stage] += 1
                self._last_end[stage] = time.perf_counter()

    def add(self, stage: str, seconds: float, nbytes: int = 0,
            items: int = 0, cpu_seconds: float = 0.0):
        with self._lock:
            self._wall[stage] += seconds
            self._cpu[stage] += cpu_seconds
            self._bytes[stage] += nbytes
            self._items[stage] += items
            self._calls[stage] += 1
            self._last_end[stage] = time.perf_counter()

    def last_end(self, stage: str):
        """perf_counter timestamp when the stage last finished (None if
        it never ran) — lets callers measure drain tails, e.g. how long
        a campaign outlives its final device readback."""
        return self._last_end.get(stage)

    @property
    def stages(self):
        return dict(self._wall)

    def as_dict(self):
        out = {}
        for stage, wall in self._wall.items():
            entry = {"wall_s": round(wall, 4),
                     "cpu_s": round(self._cpu[stage], 4),
                     "process_cpu_s": round(self._pcpu[stage], 4),
                     "calls": self._calls[stage]}
            if self._bytes[stage]:
                entry["GB"] = round(self._bytes[stage] / 1e9, 3)
                entry["GB_per_s"] = round(
                    self._bytes[stage] / 1e9 / wall, 3) if wall else None
            if self._items[stage]:
                entry["items"] = self._items[stage]
                entry["items_per_s"] = round(
                    self._items[stage] / wall, 3) if wall else None
            out[stage] = entry
        return out

    def report(self, as_json: bool = False):
        d = self.as_dict()
        if as_json:
            return json.dumps(d)
        total = sum(self._wall.values())
        lines = []
        for stage, entry in sorted(d.items(), key=lambda kv:
                                   -kv[1]["wall_s"]):
            pct = 100 * entry["wall_s"] / total if total else 0
            extra = ""
            if "GB_per_s" in entry and entry["GB_per_s"]:
                extra += f" {entry['GB_per_s']:.2f} GB/s"
            if "items_per_s" in entry and entry["items_per_s"]:
                extra += f" {entry['items_per_s']:.1f} items/s"
            lines.append(f"  {stage:<24s} {entry['wall_s']:8.3f} s "
                         f"({pct:4.1f}%) x{entry['calls']}{extra}")
        return "\n".join([f"Stage timings ({total:.3f} s total):"] + lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/xcorr_tpu_trace"):
    """Capture a JAX device trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def parse_device_trace(logdir: str):
    """Device-busy seconds + launch count from the newest profiler
    trace under ``logdir`` (written by :func:`trace`).

    Reads the chrome-trace ``*.trace.json.gz``, finds the device
    process lanes (process names carrying ``TPU``/``GPU``/``XLA Ops``;
    the host python/thread lanes are excluded), and returns::

        {"device_busy_s": <union of device-op intervals per lane>,
         "launches": <number of device-lane op events>}

    Busy time is the per-thread interval UNION, so nested/overlapping
    trace spans (op groups containing per-op children) don't double
    count. Returns ``None`` when no trace or no device lane is found.
    """
    import glob
    import gzip
    import os

    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])

    pid_name, tid_name = {}, {}
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_name[ev.get("pid")] = ev.get("args", {}).get("name", "")
        elif ev.get("name") == "thread_name":
            tid_name[(ev.get("pid"), ev.get("tid"))] = \
                ev.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_name.items()
                   if ("/device:" in n or "TPU" in n or "GPU" in n)
                   and "host" not in n.lower()}
    if not device_pids:
        return None

    def lane(pred):
        spans = []
        for ev in events:
            if (ev.get("ph") == "X" and ev.get("pid") in device_pids
                    and ev.get("dur", 0) > 0
                    and pred(tid_name.get((ev["pid"], ev.get("tid")),
                                          ""))):
                t0 = float(ev["ts"])
                spans.append((t0, t0 + float(ev["dur"])))
        return spans

    # "XLA Modules" carries ONE span per executable launch and covers
    # its ops lane — the natural launch counter and busy measure; the
    # per-op "XLA Ops" lane (which overlaps it) is the fallback
    spans = lane(lambda n: n == "XLA Modules")
    launches = len(spans)
    if not spans:
        spans = lane(lambda n: n.startswith("XLA Ops") or not n)
        launches = len(spans)
    if not spans:
        return None
    spans.sort()
    busy_us, (cur0, cur1) = 0.0, spans[0]
    for a, b in spans[1:]:
        if a > cur1:
            busy_us += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    busy_us += cur1 - cur0
    return {"device_busy_s": round(busy_us / 1e6, 6),
            "launches": launches}


def device_memory():
    """Per-device memory stats (bytes) where the backend exposes them."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except (AttributeError, NotImplementedError, RuntimeError):
            stats = None
        out[str(d)] = stats
    return out
