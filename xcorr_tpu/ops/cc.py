r"""
:mod:`ops.cc` -- Batched frequency-domain cross-correlation
===========================================================

THE hot kernel (spec: ``xcorr/util/cc.py:22-79``; scale analysis SURVEY.md
§2.2): normalized cross-correlation of receiver pairs via
``rfft -> conj-multiply -> irfft`` over a dense leading batch axis.

TPU-first design decisions vs the reference:

* The reference zero-pads to the FFT-hostile odd length 2N-1 and runs one
  complex FFT per pair-window on the host. Here both inputs pad to the next
  5-smooth length (:func:`ops.fft.next_fast_len`) and a single *real* FFT
  handles an entire ``(batch, n)`` block; the lag gather out of the circular
  buffer is two static slices, so XLA fuses normalize/weights/clip into the
  irfft epilogue.
* Normalization by the norm product and the unbiased lag weights are applied
  on the clipped lag window only (index math identical to the reference's
  ``index_min``/``index_max`` machinery, ``xcorr/util/time.py:94-108``).
* Everything is shape-static: one compiled executable per (n, lag-window)
  config, reused across all pairs/days.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fft import next_fast_len

__all__ = ["correlate", "correlate_fn", "lag_slice_of_circular",
           "unbiased_weights"]


def unbiased_weights(npts: int, index_min: int = None, index_max: int = None,
                     clip: float = None, dtype=jnp.float32):
    """Unbiased-estimate weights ``npts/(npts-|k|)`` on the fftshifted lag
    window [index_min, index_max) of the full 2·npts-1 lag vector."""
    nn = 2 * npts - 1
    index_min = 0 if index_min is None else index_min
    index_max = nn if index_max is None else index_max
    k = np.arange(index_min, index_max, dtype=np.float64) - (npts - 1)
    w = npts / (npts - np.abs(k))
    if clip is not None:
        w = np.minimum(w, clip)
    return jnp.asarray(w, dtype=dtype)


def lag_slice_of_circular(r, npts: int, nfft: int, index_min: int,
                          index_max: int):
    """Gather the fftshift-ordered lag window out of a circular correlation
    buffer ``r`` of length ``nfft``.

    fftshifted index ``i`` (0..2·npts-2, zero lag at npts-1) lives at
    circular index ``(i - (npts-1)) mod nfft``; with static bounds this is
    one or two static slices — no gather, no roll.
    """
    z = npts - 1  # zero-lag fftshift position
    if index_max <= z:  # purely negative lags
        return r[..., nfft + index_min - z: nfft + index_max - z]
    if index_min >= z:  # purely non-negative lags
        return r[..., index_min - z: index_max - z]
    neg = r[..., nfft + index_min - z:]
    pos = r[..., : index_max - z]
    return jnp.concatenate([neg, pos], axis=-1)


# windows at least this long route to the four-step pruned kernel on
# accelerator backends (measured 3.6x on v5e at day scale; see ops/fft4.py)
FOURSTEP_THRESHOLD = 1 << 20


def preferred_padded_len(n: int):
    """Stage-A geometry length for pre-padded dispatch (see
    :func:`correlate`'s ``pre_padded_n``), or ``None`` when the
    four-step path will not engage (small windows / CPU backend) so the
    caller should hand :func:`correlate` plain ``n``-sample windows.

    Callers that materialize window stacks anyway (the span pipeline,
    the benchmark) zero-extend to this length so the kernel skips its
    zero-extension pass — a full read+write of every window (measured
    ~10% of the day-scale batch) that the pruned stage-A never needed.
    """
    if n < FOURSTEP_THRESHOLD or jax.default_backend() == "cpu":
        return None
    from .fft4 import padded_len
    from .pallas_fft import fused_available
    return padded_len(n, stageb="pallas" if fused_available() else "fft")


def correlate(x, y, *, normalize: bool = True, index_min: int = None,
              index_max: int = None, unbiased: bool = False,
              nfft: int = None, clip_weight: float = None,
              method: str = "auto", pre_padded_n: int = None,
              precision: str = None):
    """Dispatch wrapper: monolithic kernel for small windows (and exact
    f64 oracle work), four-step pruned kernel for day-scale windows on
    accelerators. ``method``: 'auto' | 'monolithic' | 'fourstep'.

    ``pre_padded_n``: the logical window length when ``x``/``y`` are
    already zero-extended to the four-step stage-A geometry
    (``ops.fft4.padded_len(pre_padded_n)`` samples, tail zero) — the
    kernel then skips its zero-extension pass. Paths that cannot consume
    padded inputs trim back to ``pre_padded_n`` first.

    ``precision`` (four-step path only): ``'high'`` (default — bf16
    hi/lo expansion, 6e-8 max err vs f64, the 1e-6 parity bar),
    ``'default'`` (native bf16 MXU passes — measured 1.57x faster at
    ~1.3e-5 max deviation; the speed knob for error-tolerant scans),
    ``'high3'``/``'highest'``. ``None`` reads ``XCORR_CC_PRECISION``
    (same values) so production campaigns — ``xcorr-cc
    --cc-precision`` — select it without plumbing; the monolithic
    XLA-FFT path is unaffected (its transforms are not MXU matmuls).
    """
    if precision is None:
        precision = os.environ.get("XCORR_CC_PRECISION") or "high"
    if precision not in ("default", "high", "high3", "highest"):
        raise ValueError(
            f"precision={precision!r}: expected default|high|high3|"
            "highest")
    n = x.shape[-1] if pre_padded_n is None else int(pre_padded_n)
    if pre_padded_n is not None and x.shape[-1] < n:
        # the four-step branch validates the exact padded geometry; the
        # trimming fallthroughs would otherwise silently shorten the
        # window (and the caller's lag indices, computed for 2n-1,
        # would select the wrong lags)
        raise ValueError(
            f"pre_padded_n={n} but the input has only {x.shape[-1]} "
            "samples; pass the zero-extended buffers "
            "(ops.fft4.padded_len) or drop pre_padded_n")
    if method == "fourstep" and (unbiased or nfft is not None
                                 or clip_weight is not None):
        raise ValueError(
            "method='fourstep' does not support unbiased/nfft/"
            "clip_weight; use method='auto' or 'monolithic'")
    use4 = method == "fourstep" or (
        method == "auto" and nfft is None and not unbiased
        and n >= FOURSTEP_THRESHOLD
        and jax.default_backend() != "cpu"
        and x.dtype == jnp.float32)
    if use4:
        from .fft4 import padded_len, plan_correlate4
        from .pallas_fft import fused_available
        stageb = "pallas" if fused_available() else "fft"
        if pre_padded_n is not None and \
                x.shape[-1] != padded_len(n, stageb=stageb):
            raise ValueError(
                f"pre-padded input is {x.shape[-1]} samples; the "
                f"{stageb} plan expects padded_len({n}) = "
                f"{padded_len(n, stageb=stageb)}")
        try:
            fn = plan_correlate4(n, index_min, index_max,
                                 normalize=normalize, stageb=stageb,
                                 precision=precision,
                                 pre_padded=pre_padded_n is not None)
        except ValueError:  # geometry unsupported by the fused kernel
            if pre_padded_n is not None:  # fft plan pads differently
                x, y = x[..., :n], y[..., :n]
            fn = plan_correlate4(n, index_min, index_max,
                                 normalize=normalize,
                                 precision=precision)
        return fn(x, y)
    if pre_padded_n is not None:
        x, y = x[..., :n], y[..., :n]
    return _correlate_monolithic(
        x, y, normalize=normalize, index_min=index_min,
        index_max=index_max, unbiased=unbiased, nfft=nfft,
        clip_weight=clip_weight)


@partial(jax.jit, static_argnames=("normalize", "index_min", "index_max",
                                   "unbiased", "nfft", "clip_weight"))
def _correlate_monolithic(x, y, *, normalize: bool = True,
                          index_min: int = None, index_max: int = None,
                          unbiased: bool = False, nfft: int = None,
                          clip_weight: float = None):
    """Batched normalized cross-correlation along the last axis.

    Parameters
    ----------
    x, y : jnp.ndarray ``(..., n)``
        Equal-shape input blocks (pairs x windows flattened into the batch).
    normalize : divide by ``||x||·||y||`` (reference ``util/cc.py:76-78``).
    index_min, index_max : clipped window into the fftshifted 2n-1 lag
        vector (defaults: full).
    unbiased : apply ``n/(n-|k|)`` weights in the same kernel.
    nfft : FFT length override (>= 2n-1); default next 5-smooth length.

    Returns
    -------
    ``(..., index_max-index_min)`` cross-correlation estimate, same dtype
    as ``x``.
    """
    n = x.shape[-1]
    nn = 2 * n - 1
    index_min = 0 if index_min is None else index_min
    index_max = nn if index_max is None else index_max
    if nfft is not None and nfft < nn:
        raise ValueError(
            f"nfft={nfft} < 2n-1={nn}: the circular correlation would "
            "alias positive lags onto negative ones")
    nfft = nfft or next_fast_len(nn)

    X = jnp.fft.rfft(x, n=nfft, axis=-1)
    Y = jnp.fft.rfft(y, n=nfft, axis=-1)
    r = jnp.fft.irfft(X * jnp.conj(Y), n=nfft, axis=-1)
    out = lag_slice_of_circular(r, n, nfft, index_min, index_max)

    if normalize:
        nx = jnp.linalg.norm(x, axis=-1, keepdims=True)
        ny = jnp.linalg.norm(y, axis=-1, keepdims=True)
        denom = nx * ny
        out = out / jnp.where(denom == 0, 1.0, denom)
    if unbiased:
        w = unbiased_weights(n, index_min, index_max, clip=clip_weight,
                             dtype=out.dtype)
        out = out * w
    return out.astype(x.dtype)


def correlate_fn(n: int, **kwargs):
    """Pre-configured correlation kernel for fixed window length ``n``:
    returns a jitted ``f(x, y) -> ccf`` closure (one executable, reused
    across the whole batch engine)."""
    def f(x, y):
        return correlate(x, y, **kwargs)
    return jax.jit(f)
