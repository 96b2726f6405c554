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
