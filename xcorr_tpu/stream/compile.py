r"""
:mod:`stream.compile` -- Compile preprocess chains to fused device kernels
==========================================================================

The production ingest path: a channel's hashed operations list
(``stream/process.py`` DSL) compiles into ONE jitted function over dense
``(batch, npts)`` blocks — the TPU replacement for the reference's
per-trace obspy dispatch (``xcorr/stream/process.py:279-282`` applies each
op eagerly on the host, single-threaded).

Host-irregular steps (``merge`` gap filling, ``select``, ``rotate``) run at
the edge before blocks densify; everything sample-regular (detrend, taper,
Butterworth filters, decimate, Lanczos interpolation, response removal,
normalization, running RMS) fuses on device. Static shapes throughout: one
compiled executable per (channel-chain, npts) config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sp_signal

from .. import ops

__all__ = ["compile_operations", "DEVICE_OPS", "HOST_OPS"]

# ops the device chain implements; everything else must run host-side first
DEVICE_OPS = {"detrend", "taper", "filter", "decimate", "interpolate",
              "remove_sensitivity", "remove_response", "normalize",
              "running_rms"}
HOST_OPS = {"merge", "trim", "select", "rotate", "attach_response",
            "simulate", "resample"}


class _Stage:
    """One compiled stage: fn(batch_block) -> batch_block, with static
    output length/rate tracking."""

    def __init__(self, fn, npts_out, fs_out):
        self.fn = fn
        self.npts_out = npts_out
        self.fs_out = fs_out


def _stage_detrend(params, npts, fs):
    kind = params.get("type", "simple")
    if kind in ("demean", "constant"):
        return _Stage(ops.detrend.demean, npts, fs)
    if kind == "linear":
        return _Stage(ops.detrend.detrend_linear, npts, fs)
    if kind == "simple":
        # obspy 'simple' = line through first/last samples, NOT the
        # least-squares fit (host parity: Trace.detrend in trace.py)
        return _Stage(ops.detrend.detrend_simple, npts, fs)
    raise ValueError(f"detrend type {kind!r} not compilable")


def _stage_taper(params, npts, fs):
    if params.get("max_percentage") is None and \
            params.get("max_length") is None:
        # host parity: Trace.taper requires max_percentage (or a
        # max_length cap); silently defaulting here would make the
        # device path succeed where the host path drops the window
        raise ValueError("taper needs max_percentage or max_length")
    vec = ops.taper.taper_vector(
        npts, wtype=params.get("type", "hann"),
        max_percentage=params.get("max_percentage"),
        max_length=params.get("max_length"),
        sampling_rate=fs, side=params.get("side", "both"),
        dtype=np.float64)

    def fn(x, vec=jnp.asarray(vec)):
        return x * vec.astype(x.dtype)
    return _Stage(fn, npts, fs)


def _stage_filter(params, npts, fs):
    btype = params["type"]
    corners = params.get("corners", 4)
    zerophase = params.get("zerophase", False)
    if btype in ("bandpass", "bandstop"):
        freq = (params["freqmin"], params["freqmax"])
    else:
        freq = params["freq"]
    sos = ops.filter.butter_sos(corners, freq, btype, fs)
    if zerophase:
        zi, padlen = ops.filter.filtfilt_design(sos)

        def fn(x):
            return ops.filter.sosfiltfilt(sos, x, zi_template=zi,
                                          padlen=padlen)
    else:
        def fn(x):
            return ops.filter.sosfilt(sos, x)
    return _Stage(fn, npts, fs)


def _stage_decimate(params, npts, fs):
    factor = int(params["factor"])
    no_filter = params.get("no_filter", False)
    new_fs = fs / factor
    npts_out = int(np.ceil(npts / factor))
    if no_filter:
        def fn(x):
            return x[..., ::factor]
    else:
        # anti-alias: obspy-style cheby2 lowpass at 0.98 x new nyquist
        sos = sp_signal.cheby2(10, 96, 0.98 * new_fs / 2, btype="lowpass",
                               fs=fs, output="sos")

        def fn(x, sos=sos):
            y = ops.filter.sosfilt(sos, x)
            return y[..., ::factor]
    return _Stage(fn, npts_out, new_fs)


def _stage_interpolate(params, npts, fs):
    new_fs = float(params["sampling_rate"])
    a = int(params.get("a", 20))
    duration = (npts - 1) / fs
    npts_out = int(np.floor(duration * new_fs)) + 1

    # fractional source positions of each output sample (static)
    pos = np.arange(npts_out) / new_fs * fs
    i0 = np.floor(pos).astype(np.int32)
    frac = (pos - i0).astype(np.float64)

    # Lanczos weights/indices form ON DEVICE from the O(npts_out) i0 /
    # frac vectors: baking the dense (npts_out, 2a) weight and index
    # matrices as host constants costs gigabytes at day scale (4.7M x
    # 40 float64 ~ 1.5 GB each, first-touched at ~16 MB/s on this host
    # and re-shipped over the wire per fresh compile), while the
    # outer-difference + two sincs recompute in microseconds of VPU
    # time per call
    ks = np.arange(-a + 1, a + 1, dtype=np.int32)

    def fn(x, i0=jnp.asarray(i0), frac64=frac, ks=jnp.asarray(ks)):
        t = jnp.asarray(frac64, x.dtype)[:, None] \
            - jnp.asarray(ks, x.dtype)[None, :]
        w = jnp.sinc(t) * jnp.sinc(t / a) * (jnp.abs(t) < a)
        idx = i0[:, None] + ks[None, :]
        w = jnp.where((idx >= 0) & (idx < npts), w, 0.0)
        wsum = jnp.sum(w, axis=-1, keepdims=True)
        w = jnp.where(wsum > 0, w / jnp.where(wsum > 0, wsum, 1.0), 0.0)
        g = x[..., jnp.clip(idx, 0, npts - 1)]   # (..., npts_out, 2a)
        return jnp.sum(g * w, axis=-1)
    return _Stage(fn, npts_out, new_fs)


def _stage_remove_sensitivity(params, npts, fs, response=None):
    if response is None and "sensitivity" not in params:
        # host parity: Trace.remove_sensitivity raises without an
        # inventory response — silently dividing by 1.0 would produce
        # amplitudes wrong by the full instrument gain with status=1
        raise ValueError("remove_sensitivity needs a response (or an "
                         "explicit 'sensitivity' parameter)")
    sens = float(response.sensitivity if response is not None
                 else params["sensitivity"])

    def fn(x):
        return x / jnp.asarray(sens, x.dtype)
    return _Stage(fn, npts, fs)


def _stage_remove_response(params, npts, fs, response=None):
    from .trace import _cosine_sac_taper, _invert_spectrum_water_level
    if response is None:
        # host parity: Trace.remove_response raises without a response
        raise ValueError("remove_response needs a response")
    resp = response
    water_level = params.get("water_level", 60.0)
    output = params.get("output", "VEL")
    pre_filt = params.get("pre_filt")

    nfft = ops.fft.next_fast_len(2 * npts)
    freqs = np.fft.rfftfreq(nfft, d=1.0 / fs)
    r = resp.evaluate(freqs, output=output)
    inv_r = _invert_spectrum_water_level(r, water_level)
    if pre_filt is not None:
        inv_r = inv_r * _cosine_sac_taper(freqs, pre_filt)
    # ship the inverse response as real/imag planes (the axon PJRT
    # tunnel cannot transfer complex constants) and rebuild on device
    inv_re = np.ascontiguousarray(inv_r.real)
    inv_im = np.ascontiguousarray(inv_r.imag)

    def fn(x):
        rdt = x.dtype
        inv = jax.lax.complex(jnp.asarray(inv_re, rdt),
                              jnp.asarray(inv_im, rdt))
        X = jnp.fft.rfft(x, n=nfft, axis=-1)
        return jnp.fft.irfft(X * inv, n=nfft,
                             axis=-1)[..., :npts].astype(x.dtype)
    return _Stage(fn, npts, fs)


def _stage_normalize(params, npts, fs):
    def fn(x):
        m = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        return x / jnp.where(m == 0, 1.0, m)
    return _Stage(fn, npts, fs)


def _stage_running_rms(params, npts, fs):
    window = float(params.get("window", 60.0))
    win_n = int(round(window * fs))
    if win_n < 1:
        raise ValueError(f"running_rms window {window}s is shorter than "
                         f"one sample at {fs} Hz")
    if win_n > npts:
        # host parity: running_rms_trace raises on a too-short trace
        raise ValueError(f"running_rms window {window}s exceeds the "
                         f"{npts / fs}s block")
    nwin = npts // win_n

    def fn(x):
        y = x[..., : nwin * win_n]
        y = y.reshape(y.shape[:-1] + (nwin, win_n))
        return jnp.sqrt(jnp.mean(y * y, axis=-1))
    return _Stage(fn, nwin, 1.0 / window)


_STAGES = {
    "detrend": _stage_detrend,
    "taper": _stage_taper,
    "filter": _stage_filter,
    "decimate": _stage_decimate,
    "interpolate": _stage_interpolate,
    "normalize": _stage_normalize,
    "running_rms": _stage_running_rms,
}


def compile_operations(operations, npts: int, sampling_rate: float,
                       response=None, trim_to: int = None,
                       trim_offset: int = 0, jit: bool = True):
    """Compile a channel's operation list into one device function.

    Parameters
    ----------
    operations : list of ``(op, params)`` (the DSL form)
    npts, sampling_rate : input block geometry
    response : optional PAZResponse for remove_response/sensitivity
    trim_to : optionally slice the final output to this many samples
        (the 'trim' op equivalent once buffers are removed)
    trim_offset : first sample of the trim window at the *final* rate
        (drops the leading time buffer)

    Returns
    -------
    (fn, npts_out, fs_out): ``fn(x: (batch, npts)) -> (batch, npts_out)``.

    Edge-only ops in the list (merge/select/rotate/attach_response) are
    skipped — they run at the edge before densification. ``resample``
    and ``simulate`` raise ``NotImplementedError`` (silently dropping a
    rate change would correlate mis-sliced data; the engine's
    ``_chain_compilable`` routes such chains to the host path).

    The buffer trim honors the DSL's op order (host parity,
    ``get_processed_waveforms`` injects starttime/endtime at the 'trim'
    position): when the list carries an explicit ``('trim', ...)`` and
    ``trim_to`` is given, the slice applies THERE, so trailing
    detrend/taper act on the FINAL window — tapering the buffered
    window and then slicing the ramps off would leave the correlated
    window effectively untapered. If a rate/length-changing op follows
    the trim (no canonical chain does), the slice falls back to the end
    of the chain, matching the client's trailing ``st.trim``.
    """
    _EDGE_OPS = ("merge", "select", "rotate", "attach_response")
    _RESHAPING = ("decimate", "interpolate", "running_rms")
    ops_seq = list(operations)

    trim_at = None
    if trim_to is not None:
        for i, (op, _) in enumerate(ops_seq):
            if op == "trim":
                tail = [o for o, _ in ops_seq[i + 1:]]
                if not any(o in _RESHAPING for o in tail):
                    trim_at = i
                break

    def make_trim(n, fs, inclusive=False):
        if trim_offset + trim_to > n:
            raise ValueError(
                f"trim window [{trim_offset}, {trim_offset + trim_to}) "
                f"exceeds chain output length {n}")
        k, o = int(trim_to), int(trim_offset)
        if inclusive and o + k + 1 <= n:
            # host parity: Trace.trim's endtime is INCLUSIVE, so the
            # mid-chain window carries trim_to+1 samples through the
            # trailing ops; the client's final st.trim drops the last
            # sample afterwards (a trailing [..., :trim_to] stage here)
            k += 1

        def trim_stage(x, k=k, o=o):
            return x[..., o:o + k]
        return _Stage(trim_stage, k, fs)

    stages = []
    fs = float(sampling_rate)
    n = int(npts)
    trimmed = False
    for i, (op, params) in enumerate(ops_seq):
        if i == trim_at:
            st = make_trim(n, fs, inclusive=True)
            stages.append(st)
            n, trimmed = st.npts_out, True
            continue  # 'trim' itself is consumed by the slice stage
        if op in _EDGE_OPS or op == "trim":
            continue
        if op == "remove_sensitivity":
            st = _stage_remove_sensitivity(params, n, fs, response)
        elif op == "remove_response":
            st = _stage_remove_response(params, n, fs, response)
        elif op in _STAGES:
            st = _STAGES[op](params, n, fs)
        else:
            raise NotImplementedError(f"op {op!r} not device-compilable")
        stages.append(st)
        n, fs = st.npts_out, st.fs_out

    if trim_to is not None and not trimmed:
        st = make_trim(n, fs)
        stages.append(st)
        n = st.npts_out
    elif trimmed and n != int(trim_to):
        # drop the host-inclusive extra endtime sample
        def final_drop(x, k=int(trim_to)):
            return x[..., :k]
        stages.append(_Stage(final_drop, int(trim_to), fs))
        n = int(trim_to)

    def chain(x):
        for st in stages:
            x = st.fn(x)
        return x

    return (jax.jit(chain) if jit else chain), n, fs
