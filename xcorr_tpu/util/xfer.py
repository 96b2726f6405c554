"""Device->host transfer helper tuned for high-latency links.

The reference reads results straight out of device memory (torch/CUDA
``tensor.cpu()``; implicit in ``xcorr/core/process.py:173-210`` where
CCFs land in the in-memory dataset). On a TPU host the PCIe readback is
effectively free at these sizes, but through a tunneled/forwarded
runtime (the axon dev harness) a single multi-hundred-MB
``np.asarray(device_array)`` degrades to single-digit MB/s, while the
same bytes fetched as row-chunks with one transfer in flight behind the
consumer sustain several times that (measured on v5e-1: 415 MB
monolithic 7.5 MB/s twice in a row; 52 MB row-sliced 23 MB/s in the
same session).

``device_fetch`` reads a device array into host memory in row-chunks
with a bounded async pipeline. Chunking only engages above a size
threshold AND on tunneled runtimes (platform ``axon``) — real-PCIe
hosts and the CPU backend keep the single-copy path, where chunking
would only add per-slice dispatches and an extra host copy. Set
``XCORR_D2H_CHUNK_MB`` to force a chunk size on any platform, or to
``0`` to disable chunking entirely.
"""
import os
import threading
from contextlib import nullcontext

import numpy as np

__all__ = ["device_fetch", "device_ship", "prefetch", "pack_for_wire",
           "ship_packed", "PackedWire", "wire_pack_enabled",
           "tunneled_runtime_registered"]

# Serializes WIRE transfers (h2d and d2h) within this process
# (XCORR_WIRE_SERIALIZE=1): device_fetch holds this lock for a whole
# array's readback and device_ship holds it across device_put +
# block_until_ready (the put alone returns before the wire moves — the
# plugin queues host memory). Motivated by a microbenchmark where a
# concurrent h2d dragged chunked d2h from 31-42 to ~14 MB/s, but
# MEASURED A LOSS on the production campaign (same-session off/on/off/
# on A/B, 12 pair-days: 37.8/44.2 s overlapped vs 42.9/54.4 s
# serialized — readback rates were UNCHANGED by serialization while
# dispatch gained 15-20 s of now-synchronous h2d wait; in the real
# flow the span uploads ride readback gaps instead of contending).
# Kept opt-in for link regimes where duplex contention does dominate.
_WIRE_LOCK = threading.RLock()


def _serialize_wire() -> bool:
    env = os.environ.get("XCORR_WIRE_SERIALIZE")
    if env is None:
        return False
    return env not in ("0", "", "false", "False")

#: platforms reached through a forwarded/tunneled runtime, where
#: monolithic multi-hundred-MB reads degrade (measured; module
#: docstring). Real backends (tpu/gpu/cpu) stay on the single copy.
_TUNNELED_PLATFORMS = ("axon",)

# chunk target in MB; also the "engage" threshold (arrays at or below
# one chunk go through the plain single-copy path). Swept on a fresh
# 415 MB buffer (the e2e launch readback shape): 32 MB 36.4-37.7 MB/s,
# 64 MB 33.4-35.9, 16 MB 34.7-36.2, 8 MB 22.9-25.5, monolithic ~25.
_DEFAULT_CHUNK_MB = 32.0


_row_slice_jit = None


def _row_slice(x, i, n):
    """``x[i:i+n]`` with a traced start index (shared executable)."""
    import jax
    global _row_slice_jit
    if _row_slice_jit is None:
        _row_slice_jit = jax.jit(
            lambda a, j, m: jax.lax.dynamic_slice_in_dim(a, j, m, 0),
            static_argnums=(2,))
    return _row_slice_jit(x, i, n)


def _chunk_mb() -> float:
    try:
        return float(os.environ.get("XCORR_D2H_CHUNK_MB",
                                    _DEFAULT_CHUNK_MB))
    except ValueError:
        return _DEFAULT_CHUNK_MB


def _platform_of(arr) -> str:
    """Runtime identifier used for the tunnel check. The axon plugin
    registers its devices as plain ``tpu`` (``device.platform`` and
    ``client.platform`` both say ``tpu`` — measured; only
    ``client.platform_version`` carries the ``axon ...`` banner), so
    matching ``device.platform`` alone silently disabled chunking in
    production and every large readback went monolithic at ~20 MB/s.
    Return the platform_version token when it names a known tunneled
    runtime, the device platform otherwise."""
    try:
        dev = next(iter(arr.devices()))
    except Exception:
        dev = getattr(arr, "device", None)
    if dev is None:
        return ""
    try:
        version = str(dev.client.platform_version).lower()
        for name in _TUNNELED_PLATFORMS:
            if name in version:
                return name
    except Exception:
        pass
    try:
        return dev.platform
    except Exception:
        return ""


def _should_chunk(arr) -> bool:
    """Whether :func:`device_fetch` will read ``arr`` in row-chunks."""
    chunk_mb = _chunk_mb()
    nbytes = getattr(arr, "nbytes", 0)
    ndim = getattr(arr, "ndim", 0)
    if (chunk_mb <= 0 or ndim < 1 or isinstance(arr, np.ndarray)
            or arr.shape[0] < 2 or nbytes <= chunk_mb * 1e6):
        return False
    if "XCORR_D2H_CHUNK_MB" not in os.environ and \
            _platform_of(arr) not in _TUNNELED_PLATFORMS:
        return False  # real link: single copy is strictly better
    return True


def tunneled_runtime_registered() -> bool:
    """Whether a tunneled-runtime PJRT plugin (see
    ``_TUNNELED_PLATFORMS``) is REGISTERED with jax — checked against
    the backend factory table, which fills at ``import jax`` time, so
    this never initializes a client (creating one through a dead
    tunnel can block for tens of minutes). Used by the analysis CLIs
    to pin the cpu backend when a tunneled device runtime is
    registered (assumed to be the device path; --platform overrides):
    derived-analysis workloads are per-op dispatch/transfer bound
    there (measured 3-15x faster on the local host), while the
    correlation engine's day-scale batches still win on the device."""
    try:
        import jax._src.xla_bridge as xb
        names = {str(n).lower() for n in xb._backend_factories}
    except Exception:
        return False
    return any(t in n for n in names for t in _TUNNELED_PLATFORMS)


# ---------------------------------------------------------------------
# int16 block-float wire codec (tunneled links, both directions)
#
# The tunnel moves ~35-45 MB/s shared across both directions; at
# production shapes the wire is the e2e bottleneck (a pair-day is
# ~53 MB of f32 CCF readback + ~35 MB of f32 span upload). Packing
# each row to int16 with a per-row float32 scale HALVES the wire bytes
# (f32 4 B -> i16 2 B) at a worst-case quantization error of
# ``0.5 * row_max / 32767`` = 1.53e-5 of the row's peak:
#
# * d2h (``pack_for_wire``): normalized CCFs (|cc| <= 1) quantize to
#   <= 1.53e-5 absolute — far below the physics but ABOVE the kernel's
#   5.5e-8 arithmetic error. Rows containing non-finite values decode
#   to all-NaN (int16 cannot carry a NaN; a whole-row NaN keeps the
#   corruption DETECTABLE instead of casting it to finite garbage).
# * h2d (``ship_packed``): raw spans are MEAN-CENTERED on host before
#   quantization (the row mean ships as a float32 side array and is
#   added back exactly on device), so a DC offset cannot consume the
#   int16 range; rows whose crest factor ``peak/rms`` exceeds
#   ``_PACK_CREST_MAX`` (a transient/earthquake would set the scale
#   and crush the ambient signal the CC needs) or that contain
#   non-finite values fall back to the unpacked f32 ship for the whole
#   stack. Quantization noise on the survivors is white and averages
#   down ~1/sqrt(npts) through the correlation (~1e-7 relative at day
#   scale).
#
# The codec only engages where the wire is the bottleneck:
# * default: tunneled runtimes only (``axon``); real PCIe hosts and the
#   CPU backend move full f32 — production output is bit-unaffected.
# * ``XCORR_WIRE_PACK=0`` disables it everywhere;
#   ``XCORR_WIRE_PACK=1`` forces it on any platform (tests/benchmarks).
#
# Documented as a tunnel-only divergence in docs/PARITY.md.
# ---------------------------------------------------------------------

_PACK_ENV = "XCORR_WIRE_PACK"
#: packing below this size is not worth the extra device launch
_PACK_MIN_BYTES = 4_000_000
#: h2d: rows with peak/rms above this ship unpacked (scale set by a
#: transient would quantize the ambient signal to a handful of levels;
#: Gaussian noise has crest ~5, so 64 passes normal data and catches
#: spikes/earthquakes/DC steps)
_PACK_CREST_MAX = 64.0

_pack_jit = None


def _pack_env_state() -> str:
    """Shared env gate: ``'off'`` (disabled everywhere), ``'forced'``
    (engage on any platform), or ``'auto'`` (tunneled runtimes only)."""
    env = os.environ.get(_PACK_ENV)
    if env is None:
        return "auto"
    if env in ("0", "", "false", "False", "off"):
        return "off"
    return "forced"


def _pack_shape_ok(arr) -> bool:
    """Common payload gate: float32, >=2-D, worth the extra launch."""
    return (getattr(arr, "dtype", None) == np.float32
            and getattr(arr, "ndim", 0) >= 2
            and getattr(arr, "nbytes", 0) >= _PACK_MIN_BYTES)


class PackedWire:
    """Device-side int16 block-float encoding of a float32 array.

    ``q`` holds ``round(x / scale)`` as int16, ``scale`` the per-row
    (last-axis) float32 scale ``row_max / 32767``, and ``finite`` a
    per-row bool that is False where the source row contained NaN/Inf
    (those rows decode to all-NaN). :func:`device_fetch` accepts
    instances and returns the decoded float32 host array.
    """

    __slots__ = ("q", "scale", "finite", "shape", "ndim", "nbytes")

    def __init__(self, q, scale, finite):
        self.q = q
        self.scale = scale
        self.finite = finite
        self.shape = q.shape
        self.ndim = q.ndim
        self.nbytes = q.nbytes + scale.nbytes + finite.nbytes

    def devices(self):
        return self.q.devices()

    def block_until_ready(self):
        self.q.block_until_ready()
        self.scale.block_until_ready()
        self.finite.block_until_ready()
        return self


def _pack_fn(x):
    import jax.numpy as jnp
    finite = jnp.isfinite(x).all(axis=-1, keepdims=True)
    a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = (jnp.where(finite & (a > 0), a, 1.0)
             / 32767.0).astype(jnp.float32)
    # zero non-finite payloads before the int cast (astype(int16) of
    # NaN/Inf is implementation-defined); the row decodes to NaN anyway
    safe = jnp.where(jnp.isfinite(x), x, 0.0)
    q = jnp.clip(jnp.round(safe / scale), -32767.0, 32767.0)
    return q.astype(jnp.int16), scale, finite


def wire_pack_enabled(arr=None) -> bool:
    """Whether :func:`pack_for_wire` would engage (for ``arr`` when
    given, for the configured policy alone otherwise)."""
    state = _pack_env_state()
    if state == "off":
        return False
    if arr is None:
        return True
    if isinstance(arr, (np.ndarray, PackedWire)) or not _pack_shape_ok(arr):
        return False
    return state == "forced" or _platform_of(arr) in _TUNNELED_PLATFORMS


_unpack_jit = None


def _h2d_pack_engages(host) -> bool:
    """h2d policy twin of :func:`wire_pack_enabled` for HOST arrays
    (no device to inspect): same env gate, engages by default only
    when the LIVE default backend is a tunneled runtime."""
    state = _pack_env_state()
    if state == "off":
        return False
    if not isinstance(host, np.ndarray) or not _pack_shape_ok(host):
        return False
    return state == "forced" or live_backend_tunneled()


def live_backend_tunneled() -> bool:
    """Whether the LIVE default backend is a tunneled runtime. Unlike
    :func:`tunneled_runtime_registered` this initializes the backend —
    only call it where a client is already (or must anyway be) live."""
    try:
        import jax
        version = str(jax.devices()[0].client.platform_version).lower()
    except Exception:
        return False
    return any(t in version for t in _TUNNELED_PLATFORMS)


def ship_packed(host, sharding=None, timer=None):
    """Host->device ship of a float32 array through the int16
    block-float wire codec (same policy/env as :func:`pack_for_wire`,
    h2d direction): per-row mean + scale computed on host, int16
    payload crosses the wire (half the f32 bytes), decode
    ``q * scale + mean`` runs ON DEVICE. Returns the decoded float32
    device array — callers see the same contract as
    :func:`device_ship`.

    Safety gates for RAW data (module comment): rows are mean-centered
    before quantization so a DC offset cannot set the scale, and the
    whole stack falls back to the unpacked ship when any row's
    ``peak/rms`` crest factor exceeds ``_PACK_CREST_MAX`` (a transient
    would crush the ambient signal) or contains non-finite values.
    Quantization on the survivors is ``<=0.5 * row_peak / 32767`` per
    sample, white, and averages down ~``1/sqrt(npts)`` through the
    normalized correlation (~1e-7 relative at day scale). Also falls
    back on real PCIe hosts, the CPU backend, non-f32 and small arrays.
    """
    if not _h2d_pack_engages(host):
        return device_ship(host, sharding)
    import contextlib
    import jax

    # the encode CPU is a TUNNEL-ONLY cost (the codec disengages on
    # PCIe hosts): report it as its own stage so host-CPU projections
    # can subtract it from the serial clamp
    enc_timer = (timer("wire-encode") if timer is not None
                 else contextlib.nullcontext())
    with enc_timer:
        # single-pass row statistics, no array-sized temporaries: the
        # host pathologically first-touches large fresh allocations
        # (CLAUDE.md)
        rows = host.reshape(-1, host.shape[-1])
        n = rows.shape[-1]
        mu = rows.mean(axis=-1, dtype=np.float64)
        sumsq = np.einsum("ij,ij->i", rows, rows, dtype=np.float64)
        var = np.maximum(sumsq / n - mu * mu, 0.0)
        peak = np.maximum(rows.max(axis=-1) - mu,
                          mu - rows.min(axis=-1))
        finite = np.isfinite(mu) & np.isfinite(sumsq) \
            & np.isfinite(peak)
        # crest gate: rms==0 rows (all-constant) pack fine (peak==0)
        crest_bad = peak > _PACK_CREST_MAX * np.sqrt(var)
        bail = not finite.all() or (crest_bad & (var > 0)).any()
        if not bail:
            scale = (np.where(peak > 0, peak, 1.0)
                     / 32767.0).astype(np.float32)[:, None]
            mu32 = mu.astype(np.float32)[:, None]
            q = np.empty(rows.shape, np.int16)
            buf = np.empty(n, np.float32)  # one reusable row temp
            for i in range(rows.shape[0]):
                np.subtract(rows[i], mu32[i, 0], out=buf)
                np.divide(buf, scale[i, 0], out=buf)
                np.rint(buf, out=buf)
                np.clip(buf, -32767.0, 32767.0, out=buf)
                q[i] = buf  # casts f32 -> int16 into the buffer
    if bail:
        return device_ship(host, sharding)

    side_shape = host.shape[:-1] + (1,)
    qd = device_ship(q.reshape(host.shape), sharding)
    sd = device_ship(scale.reshape(side_shape), sharding)
    md = device_ship(mu32.reshape(side_shape), sharding)
    global _unpack_jit
    if _unpack_jit is None:
        import jax.numpy as jnp
        _unpack_jit = jax.jit(
            lambda qq, ss, mm: qq.astype(jnp.float32) * ss + mm)
    return _unpack_jit(qd, sd, md)


def pack_for_wire(arr):
    """Encode a float32 device array for a slow wire (int16 block-float
    per row, HALF the f32 readback bytes; policy in the module
    comment). Returns ``arr`` unchanged when the codec does not engage;
    otherwise a :class:`PackedWire` that
    :func:`device_fetch`/:func:`prefetch` accept in place of the
    array."""
    if not wire_pack_enabled(arr):
        return arr
    import jax
    global _pack_jit
    if _pack_jit is None:
        _pack_jit = jax.jit(_pack_fn)
    return PackedWire(*_pack_jit(arr))


def prefetch(arr) -> bool:
    """Start a non-blocking device->host copy of ``arr`` — but ONLY
    when :func:`device_fetch` will later read it in one piece. When the
    fetch will be row-chunked, an in-flight monolithic copy is pure
    waste: the chunked slices are separate device arrays that cannot
    reuse it, so the same bytes would cross the (degraded) wire twice.
    Returns True when a copy was started."""
    if isinstance(arr, PackedWire):
        try:
            arr.scale.copy_to_host_async()
            arr.finite.copy_to_host_async()
        except Exception:
            pass
        return prefetch(arr.q)
    if isinstance(arr, np.ndarray) or _should_chunk(arr):
        return False
    try:
        arr.copy_to_host_async()
        return True
    except Exception:
        return False


def device_fetch(arr, out: np.ndarray = None, row_done=None) -> np.ndarray:
    """Copy a (device) array to host memory, row-chunked + async-piped
    when large AND the runtime is tunneled (see module docstring).
    Equivalent to ``np.asarray(arr)`` otherwise.

    ``out``, when given, must be a C-contiguous host array of matching
    shape/dtype; the result is written into it (no extra allocation).

    ``row_done(out, n)``, when given, fires (on the calling thread)
    each time leading rows ``out[:n]`` are final — after every landed
    chunk on the chunked path, once at the end otherwise. Rows complete
    strictly in order. Consumers use it to overlap per-row work (shard
    scatter/writes) with the remaining readback of the SAME array —
    the writer-drain tail then shrinks to the last rows' work instead
    of the whole array's.

    A :class:`PackedWire` (from :func:`pack_for_wire`) is decoded to
    the float32 array it encodes: the int16 payload crosses the wire
    (itself row-chunked when large), the per-row scales ride along, and
    the multiply happens host-side (per landed chunk, so ``row_done``
    sees decoded float32 rows).
    """
    if isinstance(arr, PackedWire):
        scale = np.asarray(arr.scale)
        finite = np.asarray(arr.finite)
        if out is None:
            out = np.empty(arr.shape, dtype=np.float32)
        done = [0]

        def decode(q_host, n):
            i0, done[0] = done[0], n
            np.multiply(q_host[i0:n], scale[i0:n], out=out[i0:n])
            if not finite[i0:n].all():
                # int16 cannot carry a NaN: decode corrupt rows to
                # all-NaN so the corruption stays detectable
                # (PackedWire docstring)
                sel = ~np.broadcast_to(finite[i0:n], out[i0:n].shape)
                out[i0:n][sel] = np.nan
            if row_done is not None:
                row_done(out, n)

        device_fetch(arr.q, row_done=decode)
        if out.ndim and done[0] < out.shape[0]:  # pragma: no cover
            raise RuntimeError("packed readback incomplete")
        return out
    if not _should_chunk(arr):
        host = np.asarray(arr)
        if out is not None:
            out[...] = host
            host = out
        if row_done is not None:
            row_done(host, host.shape[0] if host.ndim else 0)
        return host
    chunk_mb = _chunk_mb()
    nbytes = arr.nbytes

    rows = arr.shape[0]
    row_bytes = max(nbytes // rows, 1)
    r = max(1, int(chunk_mb * 1e6 // row_bytes))
    if out is None:
        out = np.empty(arr.shape, dtype=arr.dtype)

    # device-side row slices: the start index is TRACED (one executable
    # per chunk size, not per chunk position — eager x[i:i+n] would
    # compile every start offset separately, minutes through an AOT
    # tunnel); copy_to_host_async starts the wire transfer so one chunk
    # is in flight while the previous lands in ``out``
    pend = []
    # under XCORR_WIRE_SERIALIZE=1 the whole chunk loop holds the wire
    # lock — arbitrary row_done work (engine scatter, shard-write
    # handoff) must NOT run under it, or h2d ships stall on host
    # bookkeeping CPU instead of wire time; fire one final callback
    # after release instead (streaming is an overlap optimization, and
    # serialize mode exists to forbid overlap)
    serialize = _serialize_wire()
    stream_cb = None if serialize else row_done

    def drain():
        i0, n0, s0 = pend.pop(0)
        out[i0:i0 + n0] = np.asarray(s0)
        if stream_cb is not None:
            stream_cb(out, i0 + n0)

    with _WIRE_LOCK if serialize else nullcontext():
        for i in range(0, rows, r):
            n = min(r, rows - i)
            s = _row_slice(arr, i, n)
            try:
                s.copy_to_host_async()
            except Exception:
                pass
            pend.append((i, n, s))
            if len(pend) > 2:
                drain()
        while pend:
            drain()
    if serialize and row_done is not None:
        row_done(out, rows)
    return out


def device_ship(host, sharding=None):
    """Host->device counterpart of :func:`device_fetch`: a
    ``jax.device_put`` that, under ``XCORR_WIRE_SERIALIZE=1``, holds the
    wire lock across put + ``block_until_ready`` so the transfer cannot
    overlap a readback (the put alone queues host memory and returns
    before any bytes move, so a lock around it wouldn't serialize
    anything). Plain async ``device_put`` otherwise."""
    import jax
    if not _serialize_wire():
        return jax.device_put(host) if sharding is None \
            else jax.device_put(host, sharding)
    with _WIRE_LOCK:
        dev = jax.device_put(host) if sharding is None \
            else jax.device_put(host, sharding)
        try:
            jax.block_until_ready(dev)
        except Exception:
            pass
    return dev
