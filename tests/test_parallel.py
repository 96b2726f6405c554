"""Parallel-layer tests: mesh helpers, host slicing, distributed init."""
import jax
import numpy as np

from xcorr_tpu.parallel import (batch_sharding, host_slice, initialize,
                                make_mesh)
from xcorr_tpu.parallel.mesh import pad_to_multiple


def test_make_mesh_and_sharding():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    sh = batch_sharding(mesh, ndim=2)
    assert sh.spec == jax.sharding.PartitionSpec("batch", None)


def test_pad_to_multiple():
    x = np.ones((5, 3))
    padded, n0 = pad_to_multiple(x, 4)
    assert padded.shape == (8, 3) and n0 == 5
    same, n1 = pad_to_multiple(np.ones((8, 3)), 4)
    assert same.shape == (8, 3) and n1 == 8


def test_initialize_single_host_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize() is False


def test_host_slice_partitions():
    items = list(range(10))
    parts = [host_slice(items, process_id=i, num_processes=3)
             for i in range(3)]
    assert sum(parts, []) == items
    assert all(len(p) >= 3 for p in parts)
