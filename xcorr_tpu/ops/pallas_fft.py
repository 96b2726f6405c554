r"""
:mod:`ops.pallas_fft` -- Fused Pallas stage-B kernels for the four-step CC
==========================================================================

The four-step correlation (:mod:`ops.fft4`) is memory-PASS bound on TPU:
XLA materializes every stage of the fast-axis transform to HBM (~6 full
passes over the 600 MB spectrum tensor per transform chain). These Pallas
kernels fuse an entire stage-B chain per 8-row VMEM block, so each
direction costs exactly one HBM read + one write:

* ``fwd``: ``F = DFT_N2(Ah * T)`` with the length-N2 DFT decomposed as
  ``P x Q`` MXU matmuls inside VMEM, output in permuted (k_p, k_q) order;
* ``inv``: ``C = IDFT_N2(Fx * conj(Fy)) * conj(T)`` — spectral multiply,
  the exact adjoint matmuls, and the outer conjugate twiddle in one pass.

Because the inverse is the exact adjoint of the forward, the internal
output permutation cancels; the correlation result is identical (f32
tolerance) to the plain four-step path.

Complex data travels as separate float32 re/im planes (the axon PJRT
tunnel cannot transfer complex, and Mosaic prefers real tiles).
Data layout: rows flattened to (B*N1, N2); the outer twiddle block for
grid step i is T[(i % (N1/ROWS)) block] since rows cycle through k1.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["plan_fused_stageb", "fused_available"]

ROWS = 8  # sublane-tile rows per block


def _split_pq_pallas(n2: int):
    """P x Q = N2 with Q a lane multiple (last axis)."""
    for q in (128, 256, 512, 64):
        if n2 % q == 0 and n2 // q >= 2:
            return n2 // q, q
    raise ValueError(f"N2={n2} not splittable for the pallas kernel")


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdot(ar, ai, br, bi, dn):
    """Complex dot_general via 4 real MXU matmuls."""
    f32 = jnp.float32
    rr = jax.lax.dot_general(ar, br, dn, preferred_element_type=f32)
    ii = jax.lax.dot_general(ai, bi, dn, preferred_element_type=f32)
    ri = jax.lax.dot_general(ar, bi, dn, preferred_element_type=f32)
    ir = jax.lax.dot_general(ai, br, dn, preferred_element_type=f32)
    return rr - ii, ri + ir


@lru_cache(maxsize=8)
def plan_fused_stageb(N1: int, N2: int, N: int):
    """(fwd, inv) fused stage-B callables for the (N1, N2) geometry.

    fwd(Ah_re, Ah_im) -> (F_re, F_im); inv(Fx_re, Fx_im, Fy_re, Fy_im)
    -> (C_re, C_im). All arrays (B*N1, N2) float32 with B*N1 % ROWS == 0.
    """
    if N1 % ROWS:
        raise ValueError(f"N1={N1} must be a multiple of {ROWS}")
    P, Q = _split_pq_pallas(N2)
    nb_t = N1 // ROWS  # T blocks per batch element

    k1 = np.arange(N1)
    T = np.exp(-2j * np.pi * np.outer(k1, np.arange(N2)) / N)
    WP = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(P)) / P)
    WQ = np.exp(-2j * np.pi * np.outer(np.arange(Q), np.arange(Q)) / Q)
    T2 = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(Q)) / N2)
    c = [T.real.astype(np.float32), T.imag.astype(np.float32),
         WP.real.astype(np.float32), WP.imag.astype(np.float32),
         WQ.real.astype(np.float32), WQ.imag.astype(np.float32),
         T2.real.astype(np.float32), T2.imag.astype(np.float32)]

    # contraction specs
    dn_fwd_p = (((1,), (1,)), ((), ()))   # (R,P,Q) x (Pk,P) over P
    dn_fwd_q = (((2,), (1,)), ((), ()))   # (R,Pk,Q) x (Qk,Q) over Q
    dn_inv_q = (((2,), (0,)), ((), ()))   # (R,Pk,Qk) x (Qk,Q) over Qk
    dn_inv_p = (((1,), (0,)), ((), ()))   # (R,Pk,Q) x (Pk,P) over Pk

    def _dft(ar, ai, wp_re, wp_im, wq_re, wq_im, t2_re, t2_im):
        ar = ar.reshape(ROWS, P, Q)
        ai = ai.reshape(ROWS, P, Q)
        # over P: result (ROWS, Q, Pk) -> swap to (ROWS, Pk, Q)
        gr, gi = _cdot(ar, ai, wp_re, wp_im, dn_fwd_p)
        gr = jnp.swapaxes(gr, 1, 2)
        gi = jnp.swapaxes(gi, 1, 2)
        gr, gi = _cmul(gr, gi, t2_re[None], t2_im[None])
        # over Q: result (ROWS, Pk, Qk)
        hr, hi = _cdot(gr, gi, wq_re, wq_im, dn_fwd_q)
        return hr.reshape(ROWS, N2), hi.reshape(ROWS, N2)

    def _idft(sr, si, wp_re, wp_im, wq_re, wq_im, t2_re, t2_im):
        sr = sr.reshape(ROWS, P, Q)
        si = si.reshape(ROWS, P, Q)
        gr, gi = _cdot(sr, si, wq_re, -wq_im, dn_inv_q)
        gr = gr * (1.0 / Q)
        gi = gi * (1.0 / Q)
        gr, gi = _cmul(gr, gi, t2_re[None], -t2_im[None])
        hr, hi = _cdot(gr, gi, wp_re, -wp_im, dn_inv_p)
        hr = jnp.swapaxes(hr, 1, 2) * (1.0 / P)
        hi = jnp.swapaxes(hi, 1, 2) * (1.0 / P)
        return hr.reshape(ROWS, N2), hi.reshape(ROWS, N2)

    def fwd_kernel(ah_re, ah_im, t_re, t_im, wp_re, wp_im, wq_re, wq_im,
                   t2_re, t2_im, f_re, f_im):
        ar, ai = _cmul(ah_re[...], ah_im[...], t_re[...], t_im[...])
        hr, hi = _dft(ar, ai, wp_re[...], wp_im[...], wq_re[...],
                      wq_im[...], t2_re[...], t2_im[...])
        f_re[...] = hr
        f_im[...] = hi

    def inv_kernel(fx_re, fx_im, fy_re, fy_im, t_re, t_im, wp_re, wp_im,
                   wq_re, wq_im, t2_re, t2_im, c_re, c_im):
        sr, si = _cmul(fx_re[...], fx_im[...], fy_re[...], -fy_im[...])
        hr, hi = _idft(sr, si, wp_re[...], wp_im[...], wq_re[...],
                       wq_im[...], t2_re[...], t2_im[...])
        cr, ci = _cmul(hr, hi, t_re[...], -t_im[...])
        c_re[...] = cr
        c_im[...] = ci

    data_spec = pl.BlockSpec((ROWS, N2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((ROWS, N2), lambda i: (i % nb_t, 0),
                          memory_space=pltpu.VMEM)
    wp_spec = pl.BlockSpec((P, P), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    wq_spec = pl.BlockSpec((Q, Q), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    t2_spec = pl.BlockSpec((P, Q), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    const_specs = [t_spec, t_spec, wp_spec, wp_spec, wq_spec, wq_spec,
                   t2_spec, t2_spec]

    def _call(kernel, n_data):
        def run(*arrays):
            rows = arrays[0].shape[0]
            if rows % ROWS:
                raise ValueError(f"rows {rows} not a multiple of {ROWS}")
            grid = (rows // ROWS,)
            out_shape = (
                jax.ShapeDtypeStruct((rows, N2), jnp.float32),
                jax.ShapeDtypeStruct((rows, N2), jnp.float32),
            )
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[data_spec] * n_data + const_specs,
                out_specs=(data_spec, data_spec),
                out_shape=out_shape,
            )(*arrays, *c)
        return run

    return _call(fwd_kernel, 2), _call(inv_kernel, 4)


def fused_available() -> bool:
    """Whether the fused kernels can run on this backend."""
    try:
        return jax.default_backend() in ("tpu",)
    except RuntimeError:
        return False
