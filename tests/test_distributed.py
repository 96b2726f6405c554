"""Multi-host bring-up tests (SURVEY.md §2.8 P5): a REAL 2-process
``jax.distributed`` formation on localhost CPU, plus the host_slice work
partition that lazy_process uses to shard the (pair x day) grid.

Reference analogue: the Dask scheduler-file cluster formation of
``xcorr/scripts/utils.py:50-79``.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

from xcorr_tpu.parallel import distributed


class TestHostSlice:
    def test_partition(self):
        items = list(range(10))
        slices = [distributed.host_slice(items, process_id=p,
                                         num_processes=3)
                  for p in range(3)]
        flat = [i for s in slices for i in s]
        assert flat == items  # contiguous, complete, disjoint
        assert max(len(s) for s in slices) - \
            min(len(s) for s in slices) <= 1

    @pytest.mark.parametrize("nitems,nproc", [
        (0, 3),    # empty campaign: every host gets a zero-task slice
        (1, 4),    # fewer tasks than hosts: 3 hosts idle, no crash
        (7, 3),    # uneven division
        (5, 5),
        (13, 8),
    ])
    def test_partition_edges(self, nitems, nproc):
        """Uneven/degenerate divisions stay contiguous, complete and
        disjoint; zero-task slices are legitimate (a host with no work
        completes immediately — core/lazy.py host_slice semantics)."""
        items = list(range(nitems))
        slices = [distributed.host_slice(items, process_id=p,
                                         num_processes=nproc)
                  for p in range(nproc)]
        assert [i for s in slices for i in s] == items
        assert max(len(s) for s in slices) - \
            min(len(s) for s in slices) <= 1
        if nitems < nproc:
            assert sum(1 for s in slices if not s) == nproc - nitems

    def test_single_host_noop(self):
        assert distributed.initialize() is False


_WORKER = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from xcorr_tpu.parallel import distributed
    ok = distributed.initialize(f"127.0.0.1:{port}",
                                num_processes=2, process_id=pid)
    assert ok, "initialize() returned False in multi-process mode"
    assert jax.process_count() == 2
    assert jax.process_index() == pid
    # 2 local CPU devices per process -> 4 global
    assert len(jax.devices()) == 4, jax.devices()
    mine = distributed.host_slice(list(range(10)))
    print("SLICE", pid, ",".join(map(str, mine)), flush=True)
    # lazy_process's auto-detect must see the multi-process state
    from jax._src.distributed import global_state
    assert (global_state.num_processes or 1) == 2
    jax.distributed.shutdown()
    print("DONE", pid, flush=True)
""")


class TestTwoProcessFormation:
    def test_localhost_cluster(self, tmp_path):
        """Two real processes form a jax.distributed cluster on
        localhost, agree on the global device count, and take disjoint
        host slices of the work list."""
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        script = tmp_path / "worker.py"
        script.write_text(_WORKER)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        # the worker script lives in tmp_path, so sys.path[0] is NOT the
        # repo root; make xcorr_tpu importable even without an editable
        # install of the package
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env) for pid in range(2)]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=150)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out}"
            assert f"DONE {pid}" in out
        slices = {}
        for out in outs:
            for line in out.splitlines():
                if line.startswith("SLICE"):
                    _, pid, items = line.split(" ", 2)
                    slices[int(pid)] = [int(x) for x in
                                        items.split(",") if x]
        assert sorted(slices) == [0, 1]
        assert slices[0] + slices[1] == list(range(10))


_CAMPAIGN_WORKER = textwrap.dedent("""
    import os, sys
    pid, port, root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from xcorr_tpu.parallel import distributed
    ok = distributed.initialize(f"127.0.0.1:{port}",
                                num_processes=2, process_id=pid)
    assert ok

    import pandas as pd
    from xcorr_tpu import lazy_process
    from xcorr_tpu.stream import Channel, Inventory, SyntheticClient

    FS = 5.0
    inv = Inventory([
        Channel("IM", "H03S1", "", "EDH", latitude=-33.6,
                longitude=-78.8),
        Channel("IM", "H03S2", "", "EDH", latitude=-33.7,
                longitude=-78.9),
        Channel("IM", "H03S3", "", "EDH", latitude=-33.8,
                longitude=-79.0),
    ])
    client = SyntheticClient(
        sds_root=os.path.join(root, "sds"), sampling_rate=FS,
        delays={"IM.H03S1..EDH": 0.0, "IM.H03S2..EDH": 4.0,
                "IM.H03S3..EDH": 9.0},
        source_period=600.0, source_amplitude=20.0)
    ops = [
        ("detrend", {"type": "demean"}),
        ("filter", {"type": "bandpass", "freqmin": 0.3,
                    "freqmax": 2.0}),
        ("taper", {"type": "cosine", "max_percentage": 0.05,
                   "max_length": 30.0}),
    ]
    init_args = dict(
        preprocess={"EDH": ops},
        attrs={"institution": "t", "author": "t", "source": "t"},
        sampling_rate=FS, window_length=3600.0, window_overlap=0.5,
        clip_lag=(-100.0, 100.0), inventory=inv)
    pairs = ["IM.H03S1..EDH-IM.H03S2..EDH",
             "IM.H03S1..EDH-IM.H03S3..EDH"]
    times = pd.date_range("2014-01-01", periods=2, freq="1D")
    results = lazy_process(pairs, times, init_args, client,
                           inventory=inv,
                           root=os.path.join(root, "cc"),
                           nworkers=1, verb=0)
    print("RESULTS", pid, len(results),
          all(map(bool, results)), flush=True)
    jax.distributed.shutdown()
    print("DONE", pid, flush=True)
""")


class TestTwoProcessCampaign:
    def test_lazy_process_sliced_campaign_merges(self, tmp_path):
        """End-to-end 2-host campaign: two real processes join one
        formation, lazy_process auto-detects it and splits the 2x2
        (pair, day) grid, each host writes ITS shards to the shared
        root (filesystem as the data plane), and the union of shards
        merges into one complete validated dataset."""
        import numpy as np
        import pandas as pd

        import xcorr_tpu

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        script = tmp_path / "worker.py"
        script.write_text(_CAMPAIGN_WORKER)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env) for pid in range(2)]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=600)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out}"
            # each host took HALF the 4-task grid and completed it
            assert f"RESULTS {pid} 2 True" in out, out

        pairs = ["IM.H03S1..EDH-IM.H03S2..EDH",
                 "IM.H03S1..EDH-IM.H03S3..EDH"]
        times = pd.date_range("2014-01-01", periods=2, freq="1D")
        root = str(tmp_path / "cc")
        files = [xcorr_tpu.ncfile(p, t, root) for p in pairs
                 for t in times]
        assert all(os.path.exists(f) for f in files), files
        ds = xcorr_tpu.merge(files, fast=True)
        assert sorted(np.asarray(ds.coords["pair"].values)) == pairs
        assert ds.dims["time"] == 2 * 48  # 2 days x 48 windows
        assert (ds["status"].values == 1).all()
