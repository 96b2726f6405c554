r"""
:mod:`parallel.pipeline` -- Fused production pipeline
=====================================================

The full TPU production path: raw day-waveform blocks -> per-channel
compiled preprocess chains -> batched cross-correlation, all inside ONE
jitted step (optionally sharded over the mesh batch axis). This is the
end-state of SURVEY.md §7 steps 3-5: where :func:`xcorr_tpu.core.process`
still preprocesses per trace on the host (matching reference semantics
exactly, ``xcorr/core/process.py:82-172``), this pipeline keeps everything
after gap-filling on device.

Flow per launch (one or MANY (pair, day) tasks batched together):

1. host: fetch + merge each receiver-day's raw span (irregular work:
   gaps, multi-record days);
2. device: slice the overlapping windows out of the spans (static
   slices inside the jit; the engine re-bases each span at its first
   window so the offset grid is canonical — identical across days and
   worker processes — and ONE compiled executable serves them all, with
   the persistent compilation cache hitting across workers), run
   ``chain_a(x), chain_b(y)`` — the hashed DSL ops compiled by
   :func:`xcorr_tpu.stream.compile.compile_operations` — then the
   four-step correlation with fused normalization and lag clipping;
3. host: scatter results into the dataset / shard writer.
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops, util
from ..stream.compile import compile_operations

__all__ = ["FusedPipeline", "MultiSpanPipeline", "mesh_fingerprint",
           "pad_nwin"]


def mesh_fingerprint(mesh):
    """Content-based (hashable) identity of a Mesh for cache keys.

    ``id(mesh)`` made two equal meshes produce two compiled pipelines
    (and defeated day-over-day executable reuse when callers rebuilt the
    mesh); device ids + axis layout are the actual compilation inputs.
    """
    if mesh is None:
        return None
    return (tuple(mesh.axis_names), mesh.devices.shape,
            tuple(d.id for d in mesh.devices.flat))


def pad_nwin(nwin: int, mesh=None) -> int:
    """Bucket a window count: rounds up to a multiple of 4, and of the
    mesh size when sharding (the batch axis must divide evenly over the
    devices).

    Note the bucket alone does NOT make a partial day hit a full day's
    executable — the compiled step's cache key includes the exact
    window-offset tuple, which a missing window changes. Executable
    reuse comes from canonical (re-based) offsets repeating across
    full-coverage days, the overwhelmingly common case; partial days
    compile their own variant once and then cache like any other.
    """
    step = 4
    if mesh is not None:
        step = int(np.lcm(step, mesh.devices.size))
    return max(step, -(-int(nwin) // step) * step)


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
        # util.xfer.device_fetch: row-chunked on tunneled runtimes —
        # a day of windows (~52 MB) degrades monolithic there
        if not self._warm:
            with self._compile_lock:
                out = util.xfer.device_fetch(
                    util.xfer.pack_for_wire(self._step(x_raw, y_raw)))
                self._warm = True
                return out
        return util.xfer.device_fetch(
            util.xfer.pack_for_wire(self._step(x_raw, y_raw)))


class MultiSpanPipeline:
    """Windowed correlation over a batch of raw spans: each receiver-day
    span ships to the device ONCE and the (overlapping) windows slice out
    on device.

    At the production 87.5% window overlap the window stack contains every
    raw sample 8x; shipping spans instead cuts host->device transfer by
    the same factor (the dominant cost on tunneled/PCIe-limited hosts).

    ``offsets_a`` / ``offsets_b`` are sequences of ``(src, sample_off)``:
    window ``k`` slices ``npts_raw`` samples starting at ``sample_off``
    from span row ``src`` of the stacked ``(nsrc, span)`` input. The
    offsets are STATIC (baked into the jit as constant-start slices —
    a traced-offset variant was tried and abandoned: XLA's buffer
    assignment for runtime-start dynamic slices from a day-scale span
    exploded to 144 GB of HBM at B=64). Executable reuse across chunks
    and worker processes comes from the CALLER canonicalizing spans to
    the REQUESTED fetch grid (the engine zero-fills grid-length
    buffers and emits window offsets as positions on that grid, so the
    tuples repeat regardless of archive jitter).

    Multiple (pair, day) tasks with a common geometry batch into ONE
    launch of one executable: B=64 measured 1.14 ms/window on v5e-1 vs
    1.58 at B=8.
    """

    def __init__(self, ops_a, ops_b, span_a, fs_a, span_b, fs_b,
                 offsets_a, offsets_b, npts_raw_a, npts_raw_b, npts,
                 index_min=None, index_max=None, normalize=True,
                 response_a=None, response_b=None, trim_offset=0,
                 mesh=None, pre_padded_len="auto"):
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
        if len(offsets_a) != len(offsets_b):
            raise ValueError("offsets_a and offsets_b lengths differ")
        self.nwin = len(offsets_a)
        npts_raw_a = int(npts_raw_a)
        npts_raw_b = int(npts_raw_b)

        shard = None
        if mesh is not None and self.nwin % mesh.devices.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(mesh, P("batch", None))

        # materialize the preprocessed window stacks directly at the
        # four-step's stage-A geometry (zero tail) so the correlation
        # kernel skips its zero-extension pass — the pad fuses with the
        # chain's trailing trim copy instead of costing a separate full
        # read+write of every window (measured ~10% of the batch)
        plen = ops.cc.preferred_padded_len(npts) \
            if pre_padded_len == "auto" else pre_padded_len
        kw = {} if plen is None else {"pre_padded_n": npts}

        def step(raw_a, raw_b):
            # (nsrc, span) spans replicate; the cross-task window stack
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
            if plen is not None:
                xa = jnp.pad(xa, ((0, 0), (0, plen - xa.shape[-1])))
                yb = jnp.pad(yb, ((0, 0), (0, plen - yb.shape[-1])))
            return ops.cc.correlate(
                xa, yb, normalize=normalize, index_min=index_min,
                index_max=index_max, **kw)

        self._step = jax.jit(step)
        self._compile_lock = threading.Lock()
        self._warm = False

    def launch(self, raw_a, raw_b):
        """Dispatch asynchronously; returns the (nwin, nlag) device
        array. ``raw_a``: (nsrc, span_a), ``raw_b``: (nsrc, span_b)
        float32."""
        raw_a = jnp.asarray(raw_a)
        raw_b = jnp.asarray(raw_b)
        if not self._warm:
            with self._compile_lock:
                out = self._step(raw_a, raw_b)
                jax.block_until_ready(out)
                self._warm = True
                return out
        return self._step(raw_a, raw_b)

    def __call__(self, raw_a, raw_b):
        """Synchronous :meth:`launch` returning a host array."""
        return util.xfer.device_fetch(
            util.xfer.pack_for_wire(self.launch(raw_a, raw_b)))
