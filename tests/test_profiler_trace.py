"""parse_device_trace: chrome-trace parsing for device-busy evidence
(util/profiler.py). Synthetic trace fixtures — no device needed."""
import gzip
import json
import os

from xcorr_tpu.util.profiler import parse_device_trace


def _write_trace(tmp_path, events):
    d = os.path.join(str(tmp_path), "plugins", "profile", "t1")
    os.makedirs(d, exist_ok=True)
    with gzip.open(os.path.join(d, "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _meta(pid, pname, threads):
    evs = [{"ph": "M", "name": "process_name", "pid": pid,
            "args": {"name": pname}}]
    for tid, tname in threads.items():
        evs.append({"ph": "M", "name": "thread_name", "pid": pid,
                    "tid": tid, "args": {"name": tname}})
    return evs


def test_modules_lane_counts_launches_and_unions_busy(tmp_path):
    evs = _meta(3, "/device:TPU:0", {2: "XLA Modules", 3: "XLA Ops"})
    evs += _meta(701, "/host:CPU", {9: "python"})
    # two overlapping module spans (10-30, 20-40) -> union 30 us; the
    # ops lane (longer) must NOT be double counted; host lane ignored
    evs += [
        {"ph": "X", "pid": 3, "tid": 2, "ts": 10, "dur": 20},
        {"ph": "X", "pid": 3, "tid": 2, "ts": 20, "dur": 20},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 10, "dur": 35},
        {"ph": "X", "pid": 701, "tid": 9, "ts": 0, "dur": 500},
    ]
    out = parse_device_trace(_write_trace(tmp_path, evs))
    assert out["launches"] == 2
    assert abs(out["device_busy_s"] - 30e-6) < 1e-9


def test_ops_lane_fallback_without_modules(tmp_path):
    evs = _meta(3, "/device:TPU:0", {3: "XLA Ops"})
    evs += [
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 10},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 100, "dur": 10},
    ]
    out = parse_device_trace(_write_trace(tmp_path, evs))
    assert out["launches"] == 2
    assert abs(out["device_busy_s"] - 20e-6) < 1e-9


def test_no_device_lane_returns_none(tmp_path):
    evs = _meta(701, "/host:CPU", {9: "python"})
    evs += [{"ph": "X", "pid": 701, "tid": 9, "ts": 0, "dur": 10}]
    assert parse_device_trace(_write_trace(tmp_path, evs)) is None


def test_missing_dir_returns_none(tmp_path):
    assert parse_device_trace(str(tmp_path)) is None
