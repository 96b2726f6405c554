r"""
:mod:`ops.filter` -- IIR filtering on TPU
=========================================

Butterworth second-order-section filtering as a *parallel associative scan*
(spec: ``xcorr/signal/filter.py:27-120`` = scipy ``butter`` +
``sosfiltfilt``; obspy's single-pass ``sosfilt`` for the stream DSL).

A biquad in transposed direct-form II is the affine state recurrence

    s[t] = A s[t-1] + B x[t],    y[t] = b0 x[t] + s1[t-1]

with A = [[-a1, 1], [-a2, 0]], B = [b1 - a1 b0, b2 - a2 b0]. Affine maps
compose associatively, so the whole day-long trace filters in
O(log n) depth via ``jax.lax.associative_scan`` — the TPU answer to a
recurrence scipy runs sequentially on one core (SURVEY.md §7 hard part 1).

At day scale (> 2^18 samples) each biquad instead runs as a ``lax.scan``
over 2^18-sample chunks carrying the exact 2-element state, with the
in-chunk solution computed in closed form: s[t] = A^(t+1) z_in +
(h * x)[t] where the A-power sequences and the impulse response
h[k] = A^k B are host-precomputed — ONE causal FFT convolution per chunk
(~3 memory passes) instead of a deep scan.

Design on host (tiny): scipy ``butter``/``sosfilt_zi``; application on
device. ``sosfiltfilt`` reproduces scipy's odd-extension padding and
x0-scaled initial conditions, matching the scipy oracle to f64 precision.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sp_signal

__all__ = ["butter_sos", "sosfilt", "sosfiltfilt", "filtfilt_design"]


def butter_sos(order: int, frequency, btype: str, sampling_rate: float):
    """Butterworth SOS design (host-side scipy; coefficients are data)."""
    nyq = 0.5 * sampling_rate
    wn = np.atleast_1d(np.asarray(frequency, dtype=np.float64)) / nyq
    wn = wn if wn.size > 1 else wn.item()
    return sp_signal.butter(order, wn, btype=btype, output="sos")


# above this length the within-chunk associative scan wraps in a
# lax.scan over chunks: the unrolled scan's HLO at day scale (4.75M
# samples) is too large for the AOT compiler, and the chunked form also
# keeps peak memory at one chunk of composed affine maps
_CHUNKED_THRESHOLD = 1 << 18
_CHUNK = 1 << 18  # swept on v5e: 2^18 fastest (174 ms / 4 sections / (8, 4.75M))


def _biquad_affine_scan(x, b, a, zi=None):
    """Apply one biquad along the last axis via associative scan.

    x: (..., n); b, a: length-3 coefficient arrays (a[0] == 1).
    zi: optional (..., 2) initial state (transposed DF-II convention,
    scipy-compatible).
    Returns y with the same shape.
    """
    if x.shape[-1] > _CHUNKED_THRESHOLD:
        return _biquad_chunked(x, b, a, zi)
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b0, b1, b2 = float(b[0]), float(b[1]), float(b[2])
    a1, a2 = float(a[1]), float(a[2])

    # state transition is constant: s[t] = A s[t-1] + B x[t] with
    # A = [[-a1, 1], [-a2, 0]], B = [b1 - a1 b0, b2 - a2 b0].
    # The affine maps (M, v) are carried as SIX separate (..., n) planes
    # (m11, m12, m21, m22, v1, v2): a trailing (..., 2)/(..., 2, 2) layout
    # gets lane-padded 64x on TPU (T(8,128) tiling) and OOMs at day scale.
    ones = jnp.ones_like(x)
    m11 = -a1 * ones
    m12 = ones
    m21 = -a2 * ones
    m22 = jnp.zeros_like(x)
    v1 = (b1 - a1 * b0) * x
    v2 = (b2 - a2 * b0) * x
    if zi is not None:
        # fold the initial state into the first element: s[0] = A zi + B x[0]
        zi = jnp.broadcast_to(jnp.asarray(zi, x.dtype), x.shape[:-1] + (2,))
        z1 = zi[..., 0]
        z2 = zi[..., 1]
        v1 = v1.at[..., 0].add(-a1 * z1 + z2)
        v2 = v2.at[..., 0].add(-a2 * z1)

    def compose(e1, e2):
        a11, a12, a21, a22, u1, u2 = e1
        c11, c12, c21, c22, w1, w2 = e2
        # M = M2 @ M1 ; v = M2 @ v1 + v2
        return (c11 * a11 + c12 * a21,
                c11 * a12 + c12 * a22,
                c21 * a11 + c22 * a21,
                c21 * a12 + c22 * a22,
                c11 * u1 + c12 * u2 + w1,
                c21 * u1 + c22 * u2 + w2)

    out = jax.lax.associative_scan(
        compose, (m11, m12, m21, m22, v1, v2), axis=-1)
    s1 = out[4]  # z1[t] after processing x[t]
    # y[t] = b0 x[t] + s1[t-1]; s1[-1] = zi[0] (or 0)
    s1_init = (zi[..., :1] if zi is not None
               else jnp.zeros(x.shape[:-1] + (1,), x.dtype))
    s1_prev = jnp.concatenate([s1_init, s1[..., :-1]], axis=-1)
    y = b0 * x + s1_prev
    return y


@lru_cache(maxsize=64)
def _biquad_chunk_plan_cached(bt, at, L):
    return _biquad_chunk_plan(np.asarray(bt), np.asarray(at), L)


def _biquad_chunk_plan(b, a, L):
    """Host precomputation for the conv-based chunked biquad.

    The state recurrence s[t] = A s[t-1] + B x[t] has, within a chunk of
    length L, the closed form s[t] = A^(t+1) z_in + sum_j A^(t-j) B x[j]:
    the A-power entries are data-independent sequences (computed here in
    f64) and the convolution term uses the impulse response h[k] = A^k B.
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    a1, a2 = a[1], a[2]
    B1, B2 = b[1] - a1 * b[0], b[2] - a2 * b[0]

    def seq(u0, u1):
        # generate u[t] with u[t] = -a1 u[t-1] - a2 u[t-2] and the given
        # first two values, via one lfilter call
        delta = np.zeros(L)
        delta[0] = 1.0
        return sp_signal.lfilter([u0, u1 + a1 * u0], [1.0, a1, a2], delta)

    # A^(t+1) entries (A = [[-a1, 1], [-a2, 0]])
    m11 = seq(-a1, a1 * a1 - a2)
    m12 = seq(1.0, -a1)
    m21 = seq(-a2, a1 * a2)
    m22 = seq(0.0, -a2)
    # impulse response h[k] = A^k B
    h1 = seq(B1, -a1 * B1 + B2)
    h2 = seq(B2, -a2 * B1)
    nfft = 1
    while nfft < 2 * L:
        nfft *= 2
    H1 = np.fft.rfft(h1, nfft)
    return {
        "m11": m11, "m12": m12, "m21": m21, "m22": m22,
        "H1_re": H1.real, "H1_im": H1.imag,
        "h2_rev": h2[::-1].copy(),
        "nfft": nfft,
    }


def _biquad_chunked(x, b, a, zi=None):
    """Chunked biquad via exact impulse-response convolution.

    lax.scan over 2^18-sample chunks carrying the exact 2-element state;
    inside each chunk the data-dependent part is ONE causal FFT
    convolution with the host-precomputed impulse response (the A-power
    sequences are constants), ~3 memory passes instead of the ~16 of an
    in-chunk associative scan.
    """
    b = np.asarray(b, dtype=np.float64)  # coefficients must be concrete
    a = np.asarray(a, dtype=np.float64)
    b0 = float(b[0])
    n = x.shape[-1]
    L = _CHUNK
    C = -(-n // L)
    pad = C * L - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xc = jnp.moveaxis(xp.reshape(x.shape[:-1] + (C, L)), -2, 0)

    plan = _biquad_chunk_plan_cached(tuple(b), tuple(a), L)
    nfft = plan["nfft"]
    m11 = jnp.asarray(plan["m11"], x.dtype)
    m12 = jnp.asarray(plan["m12"], x.dtype)
    m21L = float(plan["m21"][L - 1])
    m22L = float(plan["m22"][L - 1])
    H1 = jax.lax.complex(jnp.asarray(plan["H1_re"], x.dtype),
                         jnp.asarray(plan["H1_im"], x.dtype))
    h2_rev = jnp.asarray(plan["h2_rev"], x.dtype)

    def body(carry, xk):
        z1, z2 = carry  # state entering the chunk, shape x.shape[:-1]
        X = jnp.fft.rfft(xk, n=nfft, axis=-1)
        v1 = jnp.fft.irfft(X * H1, n=nfft, axis=-1)[..., :L]
        # s1[t] = m11[t] z1 + m12[t] z2 + v1[t]
        s1 = m11 * z1[..., None] + m12 * z2[..., None] + v1
        y = b0 * xk + jnp.concatenate(
            [z1[..., None], s1[..., :-1]], axis=-1)
        # carry: full state at t = L-1 (v2 via one dot product)
        v2_last = jnp.sum(xk * h2_rev, axis=-1)
        z1n = s1[..., -1]
        z2n = m21L * z1 + m22L * z2 + v2_last
        return (z1n, z2n), y

    if zi is not None:
        zi = jnp.broadcast_to(jnp.asarray(zi, x.dtype),
                              x.shape[:-1] + (2,))
        carry0 = (zi[..., 0], zi[..., 1])
    else:
        carry0 = (jnp.zeros(x.shape[:-1], x.dtype),
                  jnp.zeros(x.shape[:-1], x.dtype))
    _, yc = jax.lax.scan(body, carry0, xc)
    y = jnp.moveaxis(yc, 0, -2).reshape(xp.shape)
    return y[..., :n]


def sosfilt(sos, x, zi=None):
    """Cascaded-biquad forward filtering along the last axis.

    sos: (nsections, 6) scipy-layout coefficients — must be concrete
    (numpy or a constant jax array), the chunked day-scale path plans the
    impulse-response convolution from the values on the host. zi:
    optional (nsections, ..., 2) per-section initial conditions (may be
    traced).
    """
    sos = np.asarray(sos, dtype=np.float64)
    nsec = sos.shape[0]
    y = x
    for i in range(nsec):
        b = sos[i, :3]
        a = sos[i, 3:]
        zii = None if zi is None else zi[i]
        y = _biquad_affine_scan(y, b, a, zii)
    return y


def filtfilt_design(sos):
    """Host-side precomputation for sosfiltfilt: per-section zi templates
    and the scipy default pad length."""
    sos = np.asarray(sos, dtype=np.float64)
    zi = sp_signal.sosfilt_zi(sos)  # (nsec, 2), scaled for unit step
    # scipy sosfiltfilt default edge padding: 3 x effective taps, crediting
    # trailing zero coefficients
    ntaps = 2 * sos.shape[0] + 1
    ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
    padlen = 3 * int(ntaps)
    return zi, padlen


def sosfiltfilt(sos, x, zi_template=None, padlen: int = None):
    """Zero-phase forward-backward SOS filtering (scipy ``sosfiltfilt``
    algorithm: odd extension by ``padlen``, x0-scaled initial conditions,
    forward pass, reversed pass, trim).

    Eager (non-traced) calls dispatch through a cached ``jax.jit`` of the
    whole forward+backward cascade: the associative scan is thousands of
    tiny primitives which, dispatched op-by-op, dominate the analysis
    CLIs (measured 7.0 of 9.2 s of the snr_ct benchmark before this
    cache; the compiled cascade fuses them)."""
    sos = np.asarray(sos, dtype=np.float64)
    if zi_template is None or padlen is None:
        zi_template, padlen_default = filtfilt_design(sos)
        padlen = padlen_default if padlen is None else padlen
    n = x.shape[-1]
    if padlen >= n:
        raise ValueError(
            f"padlen ({padlen}) must be less than the signal length ({n})")
    if not isinstance(x, jax.core.Tracer):
        fn = _filtfilt_jitted(sos.tobytes(), sos.shape[0],
                              np.asarray(zi_template,
                                         dtype=np.float64).tobytes(),
                              int(padlen))
        return fn(x)
    zi_t = jnp.asarray(np.asarray(zi_template))  # (nsec, 2)

    # odd extension at both ends
    left = 2 * x[..., :1] - x[..., 1:padlen + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -padlen - 1:-1][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    def run(data):
        # scipy scales every section's zi by the *original* first sample
        x0 = data[..., :1]  # (..., 1)
        y = data
        for i in range(sos.shape[0]):
            y = _biquad_affine_scan(y, sos[i, :3], sos[i, 3:], zi_t[i] * x0)
        return y

    fwd = run(ext)
    bwd = run(fwd[..., ::-1])[..., ::-1]
    return bwd[..., padlen:padlen + n]


@lru_cache(maxsize=64)
def _filtfilt_jitted(sos_bytes: bytes, nsec: int, zi_bytes: bytes,
                     padlen: int):
    """Compiled sosfiltfilt closure for one concrete filter design; jit's
    own cache handles the input shapes/dtypes."""
    sos = np.frombuffer(sos_bytes, dtype=np.float64).reshape(nsec, 6)
    zi_t = np.frombuffer(zi_bytes, dtype=np.float64).reshape(nsec, 2)

    @jax.jit
    def f(x):
        return sosfiltfilt(sos, x, zi_template=zi_t, padlen=padlen)

    return f
