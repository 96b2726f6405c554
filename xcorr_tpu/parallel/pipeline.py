r"""
:mod:`parallel.pipeline` -- Fused production pipeline
=====================================================

The full TPU production path: raw day-waveform blocks -> per-channel
compiled preprocess chains -> batched cross-correlation, all inside ONE
jitted step (optionally sharded over the mesh batch axis). This is the
end-state of SURVEY.md §7 steps 3-5: where :func:`xcorr_tpu.core.process`
still preprocesses per trace on the host (matching reference semantics
exactly), this pipeline keeps everything after gap-filling on device.

Flow per (pair, day):

1. host: fetch + merge the raw buffered windows for both receivers
   (irregular work: gaps, multi-record days);
2. device: ``chain_a(x), chain_b(y)`` — the hashed DSL ops compiled by
   :func:`xcorr_tpu.stream.compile.compile_operations` — then the
   four-step correlation with fused normalization and lag clipping;
3. host: scatter results into the dataset / shard writer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..stream.compile import compile_operations

__all__ = ["FusedPipeline", "SpanPipeline", "MultiSpanPipeline"]


class FusedPipeline:
    """One compiled executable: preprocess both channels + correlate.

    Parameters
    ----------
    ops_a, ops_b : the two receivers' DSL operation lists
    npts_raw_a, npts_raw_b : raw input block lengths (buffered windows)
    fs_a, fs_b : raw input sampling rates
    npts : correlation window length after preprocessing (samples)
    index_min, index_max : clipped lag window
    response_a, response_b : optional PAZ responses
    """

    def __init__(self, ops_a, ops_b, npts_raw_a, fs_a, npts_raw_b, fs_b,
                 npts, index_min=None, index_max=None, normalize=True,
                 response_a=None, response_b=None, trim_offset=0):
        chain_a, n_a, fs_out_a = compile_operations(
            ops_a, npts_raw_a, fs_a, response=response_a, jit=False,
            trim_to=npts, trim_offset=trim_offset)
        chain_b, n_b, fs_out_b = compile_operations(
            ops_b, npts_raw_b, fs_b, response=response_b, jit=False,
            trim_to=npts, trim_offset=trim_offset)
        if abs(fs_out_a - fs_out_b) > 1e-9:
            raise ValueError(
                f"chains produce different rates: {fs_out_a} vs {fs_out_b}")
        if n_a < npts or n_b < npts:
            raise ValueError(
                f"chains produce too few samples ({n_a}, {n_b}) for "
                f"npts={npts}")
        self.npts = npts
        self.sampling_rate = fs_out_a
        self.index_min = index_min
        self.index_max = index_max

        # three separate executables: one monolithic jit of
        # (chain_a + chain_b + correlate) at day scale overwhelms the
        # AOT compiler (observed SIGKILLed compile helpers)
        self._pre_a = jax.jit(chain_a)
        self._pre_b = jax.jit(chain_b)
        self._normalize = normalize
        # serialize the first (compiling) call across worker threads
        import threading
        self._compile_lock = threading.Lock()
        self._warm = False

    def _step(self, x_raw, y_raw):
        xa = self._pre_a(x_raw)[..., : self.npts]
        yb = self._pre_b(y_raw)[..., : self.npts]
        return ops.cc.correlate(
            xa, yb, normalize=self._normalize,
            index_min=self.index_min, index_max=self.index_max)

    def __call__(self, x_raw, y_raw):
        """(B, npts_raw_a), (B, npts_raw_b) float32 -> (B, nlag)
        float32."""
        x_raw = jnp.asarray(x_raw)
        y_raw = jnp.asarray(y_raw)
        if not self._warm:
            with self._compile_lock:
                out = np.asarray(self._step(x_raw, y_raw))
                self._warm = True
                return out
        return np.asarray(self._step(x_raw, y_raw))


class SpanPipeline:
    """Like :class:`FusedPipeline`, but takes each receiver's full raw
    span ONCE and slices the (overlapping) windows on device.

    At the production 87.5% window overlap the window stack contains every
    raw sample 8x; shipping the span instead cuts host->device transfer by
    the same factor (the dominant cost on tunneled/PCIe-limited hosts) and
    the windowing becomes free static slices inside the jit.
    """

    def __init__(self, ops_a, ops_b, span_a, fs_a, span_b, fs_b,
                 offsets_a, offsets_b, npts_raw_a, npts_raw_b, npts,
                 index_min=None, index_max=None, normalize=True,
                 response_a=None, response_b=None, trim_offset=0,
                 mesh=None):
        chain_a, n_a, fs_out_a = compile_operations(
            ops_a, npts_raw_a, fs_a, response=response_a, jit=False,
            trim_to=npts, trim_offset=trim_offset)
        chain_b, n_b, fs_out_b = compile_operations(
            ops_b, npts_raw_b, fs_b, response=response_b, jit=False,
            trim_to=npts, trim_offset=trim_offset)
        if abs(fs_out_a - fs_out_b) > 1e-9:
            raise ValueError(
                f"chains produce different rates: {fs_out_a} vs {fs_out_b}")
        self.npts = npts
        self.sampling_rate = fs_out_a
        offsets_a = tuple(int(o) for o in offsets_a)
        offsets_b = tuple(int(o) for o in offsets_b)

        shard = None
        if mesh is not None and len(offsets_a) % mesh.devices.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(mesh, P("batch", None))

        def step(raw_a, raw_b):
            # spans replicate; the window stack shards over the mesh
            xa = jnp.stack([jax.lax.dynamic_slice_in_dim(
                raw_a, o, npts_raw_a) for o in offsets_a])
            yb = jnp.stack([jax.lax.dynamic_slice_in_dim(
                raw_b, o, npts_raw_b) for o in offsets_b])
            if shard is not None:
                xa = jax.lax.with_sharding_constraint(xa, shard)
                yb = jax.lax.with_sharding_constraint(yb, shard)
            xa = chain_a(xa)
            yb = chain_b(yb)
            return ops.cc.correlate(
                xa, yb, normalize=normalize, index_min=index_min,
                index_max=index_max)

        import threading
        self._step = jax.jit(step)
        self._compile_lock = threading.Lock()
        self._warm = False

    def __call__(self, raw_a, raw_b):
        """raw spans (span_a,), (span_b,) float32 -> (nwin, nlag)."""
        raw_a = jnp.asarray(raw_a)
        raw_b = jnp.asarray(raw_b)
        if not self._warm:
            with self._compile_lock:
                out = np.asarray(self._step(raw_a, raw_b))
                self._warm = True
                return out
        return np.asarray(self._step(raw_a, raw_b))


class MultiSpanPipeline:
    """A :class:`SpanPipeline` over SEVERAL pairs' raw spans at once.

    All pairs in the batch must share the preprocess chains, sampling
    rates, span lengths and responses (enforced by the caller's grouping
    key); their windows then stack into ONE device batch — B=64 measured
    1.14 ms/window on v5e-1 vs 1.58 at B=8, so launching 8 pairs x 8
    windows together is a ~1.4x end-to-end win over per-pair launches.

    ``offsets_a`` / ``offsets_b`` are sequences of ``(src, sample_off)``:
    window ``k`` slices ``npts_raw`` samples starting at ``sample_off``
    from span row ``src`` of the stacked ``(nsrc, span)`` input.
    """

    def __init__(self, ops_a, ops_b, span_a, fs_a, span_b, fs_b,
                 offsets_a, offsets_b, npts_raw_a, npts_raw_b, npts,
                 index_min=None, index_max=None, normalize=True,
                 response_a=None, response_b=None, trim_offset=0,
                 mesh=None):
        chain_a, n_a, fs_out_a = compile_operations(
            ops_a, npts_raw_a, fs_a, response=response_a, jit=False,
            trim_to=npts, trim_offset=trim_offset)
        chain_b, n_b, fs_out_b = compile_operations(
            ops_b, npts_raw_b, fs_b, response=response_b, jit=False,
            trim_to=npts, trim_offset=trim_offset)
        if abs(fs_out_a - fs_out_b) > 1e-9:
            raise ValueError(
                f"chains produce different rates: {fs_out_a} vs {fs_out_b}")
        self.npts = npts
        self.sampling_rate = fs_out_a
        offsets_a = tuple((int(s), int(o)) for s, o in offsets_a)
        offsets_b = tuple((int(s), int(o)) for s, o in offsets_b)

        shard = None
        if mesh is not None and len(offsets_a) % mesh.devices.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(mesh, P("batch", None))

        def step(raw_a, raw_b):
            # (nsrc, span) spans replicate; the cross-pair window stack
            # shards over the mesh batch axis
            xa = jnp.stack([jax.lax.dynamic_slice_in_dim(
                raw_a[s], o, npts_raw_a) for s, o in offsets_a])
            yb = jnp.stack([jax.lax.dynamic_slice_in_dim(
                raw_b[s], o, npts_raw_b) for s, o in offsets_b])
            if shard is not None:
                xa = jax.lax.with_sharding_constraint(xa, shard)
                yb = jax.lax.with_sharding_constraint(yb, shard)
            xa = chain_a(xa)
            yb = chain_b(yb)
            return ops.cc.correlate(
                xa, yb, normalize=normalize, index_min=index_min,
                index_max=index_max)

        import threading
        self._step = jax.jit(step)
        self._compile_lock = threading.Lock()
        self._warm = False

    def __call__(self, raw_a, raw_b):
        """(nsrc, span_a), (nsrc, span_b) float32 -> (nwin, nlag)."""
        raw_a = jnp.asarray(raw_a)
        raw_b = jnp.asarray(raw_b)
        if not self._warm:
            with self._compile_lock:
                out = np.asarray(self._step(raw_a, raw_b))
                self._warm = True
                return out
        return np.asarray(self._step(raw_a, raw_b))
