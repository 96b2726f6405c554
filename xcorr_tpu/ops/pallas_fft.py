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
  the exact adjoint matmuls, and the outer conjugate twiddle in one pass;
* ``corr`` (:func:`plan_fused_corr`, the production path): BOTH forward
  stage-B chains, the spectral multiply, and the inverse chain in a
  SINGLE kernel. The cross-spectrum is per-bin and the stage-B transform
  is row-local, so nothing in the whole chain crosses the 8-row block:
  the intermediate spectra never touch HBM at all. Per block this reads
  the four stage-A planes once and writes the two correlation planes
  once — versus three separate launches it removes one full write + one
  full read of both spectra (~4.8 GB per production batch).

Because the inverse is the exact adjoint of the forward, the internal
output permutation cancels; the correlation result is identical (f32
tolerance) to the plain four-step path.

Complex data travels as separate float32 re/im planes (the axon PJRT
tunnel cannot transfer complex, and Mosaic prefers real tiles).
Data layout: rows flattened to (B*N1, N2); the outer twiddle block for
grid step i is T[(i % (N1/ROWS)) block] since rows cycle through k1.

Precision strategy (the MXU multiplies in bf16; see ``_PRECISIONS``):
the production ``precision='high'`` path recovers ~f32 multiplies via a
bf16 hi/lo expansion with all the static work hoisted to the HOST —
the DFT/adjoint matrices are pre-split into bf16 (hi, hi, lo) stacks
along the contraction dim and the (real | imag) halves stacked along
the output dim, so one MXU ``dot_general`` per complex operand computes
all three expansion products AND accumulates them inside the MXU's f32
accumulator. In-kernel VPU work per complex dot drops from 6 operand
splits + 6 accumulator adds + 4 combines (the round-1 Karatsuba form,
kept as ``precision='high3'``) to 2 data splits + 2 contraction-dim
concats + 2 combines. The inverse 1/P, 1/Q scales fold into the host
constants for free.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["plan_fused_stageb", "plan_fused_corr", "fused_available"]

# sublane-tile rows per block. 8 = one native sublane tile; 16 halves
# the grid-step count (overridable via XCORR_PALLAS_ROWS — round-1's
# ROWS=16 compile failure was the default 16 MB scoped-VMEM budget,
# lifted below via CompilerParams). Same-session A/B (v5e-1, day
# scale, bit-identical outputs — the math is row-local): ROWS=16 wins
# +1.9% at B=16 (15.74 vs 16.04 ms/batch), is a WASH at B=80
# (70.89 vs 70.87 — per-step overhead amortizes at saturated batch),
# and ROWS=32 loses (17.88; half rounds up to 288 rows = +6% compute).
# Already a wash by B=32 (30.40 vs 30.36 — the engine's launch size).
# Default stays 8: no production batch benefits.
ROWS = int(os.environ.get("XCORR_PALLAS_ROWS", "8"))

#: scoped-VMEM budget for the fused kernels (v5e has 128 MB; the
#: default 16 MB rejects larger block geometries)
_VMEM_LIMIT = int(os.environ.get("XCORR_PALLAS_VMEM_MB", "64")) << 20


def _split_pq_pallas(n2: int):
    """P x Q = N2 with Q a lane multiple (last axis)."""
    for q in (128, 256, 512, 64):
        if n2 % q == 0 and n2 // q >= 2:
            return n2 // q, q
    raise ValueError(f"N2={n2} not splittable for the pallas kernel")


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


# MXU passes for the in-kernel DFT matmuls. The TPU MXU multiplies in
# bfloat16; a single pass (jax's f32 default) rounds every operand to 8
# mantissa bits (~4e-3 relative) which leaks ~1e-5 absolute error into
# the normalized CC — 3.5e-3 of the CC peak, far off the 1e-6 oracle
# target. 'high' (the default) recovers ~18-bit multiplies with a
# MANUAL bf16 hi/lo expansion (Mosaic has no native HIGH lowering) at
# a fraction over the single-pass wall time. 'highest' (Mosaic's 6-pass
# f32) is exact but ~30x slower end-to-end — verification only.
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _split_bf16(v):
    """f32 -> (hi, lo) bf16 pair with hi + lo == v to ~16 mantissa bits."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _host_split_bf16(v):
    """Host-side f32 -> (hi, lo) bf16 pair, matching :func:`_split_bf16`."""
    import ml_dtypes
    v = np.asarray(v, dtype=np.float32)
    hi = v.astype(ml_dtypes.bfloat16)
    lo = (v - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _pack_rhs(Br, Bi, k_axis, m_axis):
    """Combined bf16 rhs constant for a complex DFT matrix B: the whole
    complex multiply as ONE real matmul.

    The complex product ``[gr gi] = [ar ai] · [[Br Bi], [-Bi Br]]`` is a
    real 2x2 block matrix; each block additionally carries the bf16
    hi/lo expansion stacked ``[hi, hi, lo]`` along K — pairing a
    kernel-side lhs stack ``[ah_hi, ah_lo, ah_hi]`` this yields
    ``a·b ≈ ah·bh + al·bh + ah·bl`` (the ~2^-32 ``al·bl`` term dropped)
    with all accumulation inside the MXU's f32 accumulator. Layout:
    K axis = [ar terms (3K) | ai terms (3K)], M axis = [real | imag],
    so one dot_general produces the full complex stage output with ZERO
    VPU accumulator or combine adds.
    """
    def k3(B):
        h, l = _host_split_bf16(B)
        return np.concatenate([h, h, l], axis=k_axis)
    col_r = np.concatenate([k3(Br), k3(-Bi)], axis=k_axis)   # (6K,) -> gr
    col_i = np.concatenate([k3(Bi), k3(Br)], axis=k_axis)    # (6K,) -> gi
    return np.concatenate([col_r, col_i], axis=m_axis)       # (6K, 2M)


def _dot3(a, b, dn):
    """f32-quality matmul from 3 single-pass bf16 MXU products:
    a·b = ah·bh + ah·bl + al·bh (the dropped al·bl term is ~2^-32)."""
    f32 = jnp.float32
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    r = jax.lax.dot_general(ah, bh, dn, preferred_element_type=f32)
    r = r + jax.lax.dot_general(ah, bl, dn, preferred_element_type=f32)
    r = r + jax.lax.dot_general(al, bh, dn, preferred_element_type=f32)
    return r


KARATSUBA = True  # 3-product complex dots (9 bf16 passes vs 12)


def _cdot(ar, ai, br, bi, dn, prec):
    """Complex dot_general: 4 real MXU matmuls, or — when prec is the
    string 'high3' (manual bf16x3 expansion) — 4x3 = 12 single-pass bf16
    products (or Karatsuba's 3x3 = 9 with ``KARATSUBA``; the t3 sums
    grow one bit, costing ~1 ulp of the recovered fidelity)."""
    f32 = jnp.float32
    if prec == "high3":
        if KARATSUBA:
            t1 = _dot3(ar, br, dn)
            t2 = _dot3(ai, bi, dn)
            t3 = _dot3(ar + ai, br + bi, dn)
            return t1 - t2, t3 - t1 - t2
        # shared-split 12-pass: split each operand ONCE and reuse across
        # the four real products — fewer VPU passes than Karatsuba (the
        # extra MXU passes are ~free; the kernel is VPU-bound at 'high')
        arh, arl = _split_bf16(ar)
        aih, ail = _split_bf16(ai)
        brh, brl = _split_bf16(br)
        bih, bil = _split_bf16(bi)

        def d3(xh, xl, yh, yl):
            r = jax.lax.dot_general(xh, yh, dn, preferred_element_type=f32)
            r = r + jax.lax.dot_general(xh, yl, dn,
                                        preferred_element_type=f32)
            return r + jax.lax.dot_general(xl, yh, dn,
                                           preferred_element_type=f32)

        rr = d3(arh, arl, brh, brl)
        ii = d3(aih, ail, bih, bil)
        ri = d3(arh, arl, bih, bil)
        ir = d3(aih, ail, brh, brl)
    else:
        rr = jax.lax.dot_general(ar, br, dn, preferred_element_type=f32,
                                 precision=prec)
        ii = jax.lax.dot_general(ai, bi, dn, preferred_element_type=f32,
                                 precision=prec)
        ri = jax.lax.dot_general(ar, bi, dn, preferred_element_type=f32,
                                 precision=prec)
        ir = jax.lax.dot_general(ai, br, dn, preferred_element_type=f32,
                                 precision=prec)
    return rr - ii, ri + ir


def _cdot_pre(ar, ai, B6, dn, k_axis, m):
    """Complex dot against a host-pre-split constant (see :func:`_pack_rhs`).

    ONE wide MXU dot: both real lhs operands are split in-kernel and
    stacked ``[ar_hi, ar_lo, ar_hi, ai_hi, ai_lo, ai_hi]`` along the
    contraction axis against the combined 2x2-block constant; the MXU's
    f32 accumulator performs the whole complex multiply AND the hi/lo
    expansion sums internally. In-kernel VPU work: 2 splits + 1 concat.
    """
    f32 = jnp.float32
    arh, arl = _split_bf16(ar)
    aih, ail = _split_bf16(ai)
    a6 = jnp.concatenate([arh, arl, arh, aih, ail, aih], axis=k_axis)
    o = jax.lax.dot_general(a6, B6, dn, preferred_element_type=f32)
    return o[..., :m], o[..., m:]


def _geometry(N1: int, N2: int, N: int, precision: str):
    """Shared plan pieces: P x Q split, constants, DFT/adjoint closures,
    block specs and a pallas_call wrapper factory.

    Returns ``(_dft, _idft, _call)`` where the transform closures take
    ``(re, im, consts)`` with ``consts`` the loaded non-T constant
    values, and ``_call(kernel, n_data)`` wraps a kernel written as
    ``kernel(*data_refs, t_re, t_im, *const_refs, *out_refs)``.
    """
    if N1 % ROWS:
        raise ValueError(f"N1={N1} must be a multiple of {ROWS}")
    # 'high' (and its alias 'high3') -> in-kernel bf16x3 Karatsuba
    # expansion: MEASURED FASTEST precise variant (18.1 ms/batch B=16
    # v5e-1 vs 19.6 for the pre-split block form — Mosaic fuses the
    # narrow-dot epilogues well, and the wide-K lhs concat the block
    # form needs costs more than the adds/splits it removes).
    # 'high_block' -> host-pre-split 2x2-block constants with
    # MXU-internal accumulation (kept for future A/B: fewer VPU ops on
    # paper, slightly slower in practice).
    presplit = precision == "high_block"
    prec = "high3" if precision in ("high", "high3") else (
        None if presplit else _PRECISIONS[precision])
    P, Q = _split_pq_pallas(N2)
    nb_t = N1 // ROWS  # T blocks per batch element

    k1 = np.arange(N1)
    T = np.exp(-2j * np.pi * np.outer(k1, np.arange(N2)) / N)
    WP = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(P)) / P)
    WQ = np.exp(-2j * np.pi * np.outer(np.arange(Q), np.arange(Q)) / Q)
    T2 = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(Q)) / N2)
    T2T = T2.T.copy()  # (q, k_p) layout for the transpose-free forward

    f32 = np.float32
    t_consts = [T.real.astype(f32), T.imag.astype(f32)]
    if presplit:
        # forward stages contract the rhs's dim 1; inverse stages its
        # dim 0 (adjoint). The inverse 1/Q, 1/P normalizations fold
        # straight into the host constants.
        c = [T2.real.astype(f32), T2.imag.astype(f32),
             T2T.real.astype(f32), T2T.imag.astype(f32),
             _pack_rhs(WP.real, WP.imag, k_axis=1, m_axis=0),   # (2P, 6P)
             _pack_rhs(WQ.real, WQ.imag, k_axis=1, m_axis=0),   # (2Q, 6Q)
             _pack_rhs(WQ.real / Q, -WQ.imag / Q,
                       k_axis=0, m_axis=1),                      # (6Q, 2Q)
             _pack_rhs(WP.real / P, -WP.imag / P,
                       k_axis=0, m_axis=1)]                      # (6P, 2P)
    else:
        c = [WP.real.astype(f32), WP.imag.astype(f32),
             WQ.real.astype(f32), WQ.imag.astype(f32),
             T2.real.astype(f32), T2.imag.astype(f32),
             T2T.real.astype(f32), T2T.imag.astype(f32)]

    # contraction specs
    dn_fwd_p = (((1,), (1,)), ((), ()))   # (R,P,Q) x (Pk,P) over P
    dn_fwd_q = (((1,), (1,)), ((), ()))   # (R,Q,Pk) x (Qk,Q) over Q
    dn_inv_q = (((2,), (0,)), ((), ()))   # (R,Pk,Qk) x (Qk,Q) over Qk
    dn_inv_p = (((1,), (0,)), ((), ()))   # (R,Pk,Q) x (Pk,P) over Pk

    if presplit:
        def _dft(ar, ai, cs):
            t2t_re, t2t_im, CFP, CFQ = cs[2], cs[3], cs[4], cs[5]
            ar = ar.reshape(ROWS, P, Q)
            ai = ai.reshape(ROWS, P, Q)
            gr, gi = _cdot_pre(ar, ai, CFP, dn_fwd_p, 1, P)  # (R,Q,Pk)
            gr, gi = _cmul(gr, gi, t2t_re[None], t2t_im[None])
            hr, hi = _cdot_pre(gr, gi, CFQ, dn_fwd_q, 1, Q)  # (R,Pk,Qk)
            return hr.reshape(ROWS, N2), hi.reshape(ROWS, N2)

        def _idft(sr, si, cs):
            t2_re, t2_im, CIQ, CIP = cs[0], cs[1], cs[6], cs[7]
            sr = sr.reshape(ROWS, P, Q)
            si = si.reshape(ROWS, P, Q)
            gr, gi = _cdot_pre(sr, si, CIQ, dn_inv_q, 2, Q)  # (R,Pk,Q)
            gr, gi = _cmul(gr, gi, t2_re[None], -t2_im[None])
            hr, hi = _cdot_pre(gr, gi, CIP, dn_inv_p, 1, P)  # (R,Q,P)
            hr = jnp.swapaxes(hr, 1, 2)
            hi = jnp.swapaxes(hi, 1, 2)
            return hr.reshape(ROWS, N2), hi.reshape(ROWS, N2)
    else:
        def _dft(ar, ai, cs):
            wp_re, wp_im, wq_re, wq_im = cs[0], cs[1], cs[2], cs[3]
            t2t_re, t2t_im = cs[6], cs[7]
            # transpose-free: stay in the (ROWS, Q, Pk) layout the
            # P-stage produces; the inner twiddle arrives
            # host-transposed (q, k_p) and the Q-stage contracts dim 1
            # directly -> (ROWS, Pk, Qk)
            ar = ar.reshape(ROWS, P, Q)
            ai = ai.reshape(ROWS, P, Q)
            gr, gi = _cdot(ar, ai, wp_re, wp_im, dn_fwd_p, prec)
            gr, gi = _cmul(gr, gi, t2t_re[None], t2t_im[None])
            hr, hi = _cdot(gr, gi, wq_re, wq_im, dn_fwd_q, prec)
            return hr.reshape(ROWS, N2), hi.reshape(ROWS, N2)

        def _idft(sr, si, cs):
            wp_re, wp_im, wq_re, wq_im = cs[0], cs[1], cs[2], cs[3]
            t2_re, t2_im = cs[4], cs[5]
            sr = sr.reshape(ROWS, P, Q)
            si = si.reshape(ROWS, P, Q)
            gr, gi = _cdot(sr, si, wq_re, -wq_im, dn_inv_q, prec)
            gr = gr * (1.0 / Q)
            gi = gi * (1.0 / Q)
            gr, gi = _cmul(gr, gi, t2_re[None], -t2_im[None])
            hr, hi = _cdot(gr, gi, wp_re, -wp_im, dn_inv_p, prec)
            hr = jnp.swapaxes(hr, 1, 2) * (1.0 / P)
            hi = jnp.swapaxes(hi, 1, 2) * (1.0 / P)
            return hr.reshape(ROWS, N2), hi.reshape(ROWS, N2)

    # 2-D grid (k1-block, batch element) with the batch iterating
    # FASTEST: the outer-twiddle T block's index depends only on the
    # k1-block, so Pallas keeps it resident in VMEM across all B batch
    # elements instead of re-fetching it from HBM every step — T is a
    # full (N1, N2) f32 re/im pair, i.e. half the input-plane traffic
    # at B=16 and 2x the data planes at B=64 (~0.6-2.3 GB/batch saved).
    data_spec = pl.BlockSpec((ROWS, N2), lambda i, b: (b * nb_t + i, 0),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((ROWS, N2), lambda i, b: (i, 0),
                          memory_space=pltpu.VMEM)
    const_specs = [t_spec, t_spec] + [
        pl.BlockSpec(a.shape, lambda i, b: (0, 0),
                     memory_space=pltpu.VMEM)
        for a in c]
    # packed layout for the production corr kernel: re/im stacked in
    # ONE (B, 2, N1, N2) tensor per signal, so the XLA-side stage-A and
    # inverse einsums read/write each signal once and the kernel block
    # carries both planes. (A k-major (2, N1, B, N2) natural-dot-order
    # layout with per-k1 shared T rows was MEASURED SLOWER — in-kernel
    # sublane broadcasts of the (1, N2) twiddle rows cost more than the
    # transpose copies they remove.)
    pdata_spec = pl.BlockSpec((1, 2, ROWS, N2),
                              lambda i, b: (b, 0, i, 0),
                              memory_space=pltpu.VMEM)
    all_consts = t_consts + c
    n_const = len(c)

    def _call(kernel, n_data):
        def run(*arrays):
            rows = arrays[0].shape[0]
            if rows % N1:
                raise ValueError(f"rows {rows} not a multiple of N1={N1}")
            grid = (nb_t, rows // N1)
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
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT),
            )(*arrays, *all_consts)
        return run

    def _call_packed(kernel, n_data):
        def run(*arrays):
            B = arrays[0].shape[0]
            for a in arrays:
                if a.shape != (B, 2, N1, N2):
                    raise ValueError(
                        f"packed input must be (B, 2, {N1}, {N2}), "
                        f"got {a.shape}")
            grid = (nb_t, B)
            out_shape = jax.ShapeDtypeStruct((B, 2, N1, N2), jnp.float32)
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[pdata_spec] * n_data + const_specs,
                out_specs=pdata_spec,
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT),
            )(*arrays, *all_consts)
        return run

    return _dft, _idft, _call, _call_packed, n_const


@lru_cache(maxsize=8)
def plan_fused_stageb(N1: int, N2: int, N: int,
                      precision: str = "high"):
    """(fwd, inv) fused stage-B callables for the (N1, N2) geometry.

    fwd(Ah_re, Ah_im) -> (F_re, F_im); inv(Fx_re, Fx_im, Fy_re, Fy_im)
    -> (C_re, C_im). All arrays (rows, N2) float32 with rows a multiple
    of N1 (rows = B*N1, batch-major).
    """
    _dft, _idft, _call, _call_packed, n_const = _geometry(
        N1, N2, N, precision)

    def fwd_kernel(ah_re, ah_im, t_re, t_im, *refs):
        cs = [r[...] for r in refs[:n_const]]
        f_re, f_im = refs[n_const:]
        ar, ai = _cmul(ah_re[...], ah_im[...], t_re[...], t_im[...])
        hr, hi = _dft(ar, ai, cs)
        f_re[...] = hr
        f_im[...] = hi

    def inv_kernel(fx_re, fx_im, fy_re, fy_im, t_re, t_im, *refs):
        cs = [r[...] for r in refs[:n_const]]
        c_re, c_im = refs[n_const:]
        sr, si = _cmul(fx_re[...], fx_im[...], fy_re[...], -fy_im[...])
        hr, hi = _idft(sr, si, cs)
        cr, ci = _cmul(hr, hi, t_re[...], -t_im[...])
        c_re[...] = cr
        c_im[...] = ci

    return _call(fwd_kernel, 2), _call(inv_kernel, 4)


@lru_cache(maxsize=8)
def plan_fused_corr(N1: int, N2: int, N: int,
                    precision: str = "high"):
    """Whole stage-B correlation in ONE kernel launch.

    corr(Ahx, Ahy) -> C, all arrays (B, 2, N1, N2) float32 with re/im
    packed on axis 1 — the NATURAL output order of the stage-A
    batched dot_general (b batch dim, (2*N1, N2) free dims, bitcast to
    (B, 2, N1, N2)), so the XLA-side producers/consumers touch each
    signal once and insert no transpose copies. Per 8-row block: twiddle+DFT
    both signals, multiply the spectra (per-bin, hence block-local),
    adjoint-DFT and conjugate-twiddle the product — the spectra live
    only in VMEM. Identical math/op-order to running plan_fused_stageb's
    fwd twice plus inv once, minus two full HBM round-trips of the
    spectra.
    """
    _dft, _idft, _call, _call_packed, n_const = _geometry(
        N1, N2, N, precision)

    def corr_kernel(ax, ay, t_re, t_im, *refs):
        cs = [r[...] for r in refs[:n_const]]
        c = refs[n_const]
        tr, ti = t_re[...], t_im[...]
        ar, ai = _cmul(ax[0, 0], ax[0, 1], tr, ti)
        fxr, fxi = _dft(ar, ai, cs)
        br, bi = _cmul(ay[0, 0], ay[0, 1], tr, ti)
        fyr, fyi = _dft(br, bi, cs)
        sr, si = _cmul(fxr, fxi, fyr, -fyi)
        hr, hi = _idft(sr, si, cs)
        cr, ci = _cmul(hr, hi, tr, -ti)
        c[0, 0] = cr
        c[0, 1] = ci

    return _call_packed(corr_kernel, 2)


@lru_cache(maxsize=8)
def plan_fused_corr_acc(N1: int, N2: int, N: int, rows_out_pad: int,
                        precision: str = "high"):
    """:func:`plan_fused_corr` with the PRUNED INVERSE DFT folded in as
    cross-block accumulation — the full four-step correlation becomes
    one kernel whose only HBM outputs are the ``rows_out_pad`` pruned
    rows.

    Grid is (B, N1/ROWS) with the k1-block sweep INNERMOST: the output
    block (one batch element's pruned rows) stays VMEM-resident across
    the whole sweep and accumulates ``Wi[:, k1-block] @ C(k1-block)``
    per step; nothing of the full (N1, N2) correlation plane ever
    reaches HBM. Compared to plan_fused_corr + the XLA inverse einsum
    this removes the 2-plane C write + 2-plane read (~5.7 GB/batch at
    B=80) at the cost of re-fetching the outer twiddle per batch
    element (~2.85 GB — the k1-inner order changes T every step).

    corr(Ahx, Ahy, WiT) -> (B, rows_out_pad, N2) float32, where
    Ahx/Ahy are the packed (B, 2, N1, N2) stage-A outputs and WiT is
    the (2, N1, rows_out_pad) folded inverse constant ([0] applies to
    Re(C), [1] to Im(C)) — k1 on the SUBLANE axis, because Mosaic only
    blocks the last-two dims in (8, 128) tiles (an (..., rows, ROWS)
    layout would block the lane axis at 8, which does not lower).
    VMEM-bounded: requires rows_out_pad * N2 * 4 bytes to fit the
    accumulator (callers gate on this and fall back to the unfused
    path).
    """
    if precision == "high_block":
        # this plan builds the non-presplit constant layout; _geometry's
        # presplit closures would contract mismatched shapes at trace
        # time. Use 'high'/'high3' (same accuracy, measured faster).
        raise ValueError(
            "precision='high_block' is not supported by this plan")
    _dft, _idft, _, _, n_const = _geometry(N1, N2, N, precision)
    P, Q = _split_pq_pallas(N2)
    nb_t = N1 // ROWS
    if rows_out_pad % ROWS:
        raise ValueError(f"rows_out_pad={rows_out_pad} not a multiple "
                         f"of {ROWS}")

    # rebuild the (grid-order-specific) specs: grid dims are (b, i)
    pdata_spec = pl.BlockSpec((1, 2, ROWS, N2),
                              lambda b, i: (b, 0, i, 0),
                              memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((ROWS, N2), lambda b, i: (i, 0),
                          memory_space=pltpu.VMEM)
    wi_spec = pl.BlockSpec((2, ROWS, rows_out_pad),
                           lambda b, i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, rows_out_pad, N2),
                            lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    k1 = np.arange(N1)
    T = np.exp(-2j * np.pi * np.outer(k1, np.arange(N2)) / N)
    WP = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(P)) / P)
    WQ = np.exp(-2j * np.pi * np.outer(np.arange(Q), np.arange(Q)) / Q)
    T2 = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(Q)) / N2)
    T2T = T2.T.copy()
    f32 = np.float32
    consts = [T.real.astype(f32), T.imag.astype(f32),
              WP.real.astype(f32), WP.imag.astype(f32),
              WQ.real.astype(f32), WQ.imag.astype(f32),
              T2.real.astype(f32), T2.imag.astype(f32),
              T2T.real.astype(f32), T2T.imag.astype(f32)]
    const_specs = [t_spec, t_spec] + [
        pl.BlockSpec(a.shape, lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM) for a in consts[2:]]
    prec = "high3" if precision in ("high", "high3", "high_block") \
        else _PRECISIONS[precision]
    dn_acc = (((0,), (0,)), ((), ()))  # (2R, M)^T x (2R, N2) -> (M, N2)

    def kernel(ax, ay, wi, t_re, t_im, *refs):
        cs = [r[...] for r in refs[:n_const]]
        out = refs[n_const]
        tr, ti = t_re[...], t_im[...]
        ar, ai = _cmul(ax[0, 0], ax[0, 1], tr, ti)
        fxr, fxi = _dft(ar, ai, cs)
        br, bi = _cmul(ay[0, 0], ay[0, 1], tr, ti)
        fyr, fyi = _dft(br, bi, cs)
        sr, si = _cmul(fxr, fxi, fyr, -fyi)
        hr, hi = _idft(sr, si, cs)
        cr, ci = _cmul(hr, hi, tr, -ti)
        wiv = wi[...]
        lhs = jnp.concatenate([wiv[0], wiv[1]], axis=0)  # (2R, M)
        rhs = jnp.concatenate([cr, ci], axis=0)          # (2R, N2)
        if prec == "high3":
            contrib = _dot3(lhs, rhs, dn_acc)
        else:
            contrib = jax.lax.dot_general(
                lhs, rhs, dn_acc, preferred_element_type=jnp.float32,
                precision=prec)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            out[0] = contrib

        @pl.when(i != 0)
        def _acc():
            out[0] = out[0] + contrib

    def run(ax, ay, wicat):
        B = ax.shape[0]
        for a in (ax, ay):
            if a.shape != (B, 2, N1, N2):
                raise ValueError(
                    f"packed input must be (B, 2, {N1}, {N2}), got "
                    f"{a.shape}")
        if wicat.shape != (2, N1, rows_out_pad):
            raise ValueError(
                f"WiT must be (2, {N1}, {rows_out_pad}), got "
                f"{wicat.shape}")
        out_shape = jax.ShapeDtypeStruct((B, rows_out_pad, N2),
                                         jnp.float32)
        # the VMEM-resident accumulator block (rows_out_pad x N2 f32,
        # ~6.8 MB at day scale) plus the DFT-chain temporaries overflow
        # Mosaic's default 16 MB scoped-vmem budget by ~2.4 MB; v5e
        # cores carry 128 MB of VMEM, so raise the limit rather than
        # splitting the accumulation (a rows_out grid axis would rerun
        # the whole forward+inverse chain per block)
        return pl.pallas_call(
            kernel,
            grid=(B, nb_t),
            in_specs=[pdata_spec, pdata_spec, wi_spec] + const_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(ax, ay, wicat, *consts)

    return run


@lru_cache(maxsize=8)
def plan_fused_corr_full(N1: int, N2: int, N: int, rows_in: int,
                         rows_out_pad: int, precision: str = "high"):
    """The ENTIRE four-step correlation in one kernel launch: stage-A
    (slow-axis pruned DFT), outer twiddle, both stage-B forward chains,
    the spectral multiply, the inverse chain AND the pruned inverse —
    HBM sees only the bf16 hi/lo split of the padded windows in and the
    ``rows_out_pad`` pruned correlation rows out.

    Versus :func:`plan_fused_corr` (+ XLA stage-A / inverse einsums)
    this removes, per window, the 4 stage-A plane writes + 4 kernel
    reads + 2 C-plane writes + 2 inverse reads (~12 plane passes); the
    cost is re-fetching the outer twiddle per batch element (grid is
    (b, k1-block) with the k1 sweep INNERMOST so the input blocks and
    the output accumulator stay VMEM-resident across the sweep).
    Modeled traffic drops ~2.3x vs the stage-A-outside form.

    Inputs (see :func:`ops.fft4._build_pallas_corr`'s full-fused branch):

    * ``axhl, ayhl``: (B, 2, rows_in, N2) bfloat16 — the real padded
      input reshaped to stage-A geometry and hi/lo split at the XLA
      level (``hi = bf16(A)``, ``lo = bf16(A - f32(hi))``), so the
      kernel performs stage-A as bf16x3 MXU products with ZERO in-kernel
      operand splits: ``W·A ~= Wh·Ah + Wh·Al + Wl·Ah`` (the dropped
      ``Wl·Al`` is ~2^-32 relative — the same expansion XLA's 3-pass
      HIGH uses, so accuracy matches the stage-A-outside path).
    * ``w1stk``: (3, 2, N1, rows_in) bfloat16 host constant — per term
      t the (re; im) stage-A matrix factors [W_hi, W_hi, W_lo] paired
      against [A_hi, A_lo, A_hi].
    * ``wicat``: (2, N1, rows_out_pad) float32 — the folded pruned
      inverse constants, k1 on the sublane axis (as
      :func:`plan_fused_corr_acc`).

    Output: (B, rows_out_pad, N2) float32 pruned correlation rows.
    """
    if precision == "high_block":
        # this plan builds the non-presplit constant layout; _geometry's
        # presplit closures would contract mismatched shapes at trace
        # time. Use 'high'/'high3' (same accuracy, measured faster).
        raise ValueError(
            "precision='high_block' is not supported by this plan")
    _dft, _idft, _, _, n_const = _geometry(N1, N2, N, precision)
    P, Q = _split_pq_pallas(N2)
    nb_t = N1 // ROWS
    if rows_out_pad % ROWS:
        raise ValueError(f"rows_out_pad={rows_out_pad} not a multiple "
                         f"of {ROWS}")
    if rows_in % ROWS:
        raise ValueError(f"rows_in={rows_in} not a multiple of {ROWS}")

    # grid dims are (b, i): input/output blocks depend only on b and
    # stay resident across the whole k1 sweep
    a_spec = pl.BlockSpec((1, 2, rows_in, N2), lambda b, i: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((3, 2, ROWS, rows_in),
                           lambda b, i: (0, 0, i, 0),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((ROWS, N2), lambda b, i: (i, 0),
                          memory_space=pltpu.VMEM)
    wi_spec = pl.BlockSpec((2, ROWS, rows_out_pad),
                           lambda b, i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, rows_out_pad, N2),
                            lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    k1 = np.arange(N1)
    T = np.exp(-2j * np.pi * np.outer(k1, np.arange(N2)) / N)
    WP = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(P)) / P)
    WQ = np.exp(-2j * np.pi * np.outer(np.arange(Q), np.arange(Q)) / Q)
    T2 = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(Q)) / N2)
    T2T = T2.T.copy()
    f32 = np.float32
    consts = [T.real.astype(f32), T.imag.astype(f32),
              WP.real.astype(f32), WP.imag.astype(f32),
              WQ.real.astype(f32), WQ.imag.astype(f32),
              T2.real.astype(f32), T2.imag.astype(f32),
              T2T.real.astype(f32), T2T.imag.astype(f32)]
    const_specs = [t_spec, t_spec] + [
        pl.BlockSpec(a.shape, lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM) for a in consts[2:]]
    prec = "high3" if precision in ("high", "high3", "high_block") \
        else _PRECISIONS[precision]
    # stage-A: lhs (2*ROWS, rows_in) x rhs (rows_in, N2) over rows_in
    dn_sa = (((1,), (0,)), ((), ()))
    dn_acc = (((0,), (0,)), ((), ()))

    def kernel(ax, ay, w1, wi, t_re, t_im, *refs):
        cs = [r[...] for r in refs[:n_const]]
        out = refs[n_const]
        w = w1[...]
        w0 = w[0].reshape(2 * ROWS, rows_in)
        w1_ = w[1].reshape(2 * ROWS, rows_in)
        w2 = w[2].reshape(2 * ROWS, rows_in)

        def stage_a(a):
            ah, al = a[0, 0], a[0, 1]
            o = jax.lax.dot_general(w0, ah, dn_sa,
                                    preferred_element_type=jnp.float32)
            o = o + jax.lax.dot_general(w1_, al, dn_sa,
                                        preferred_element_type=jnp.float32)
            o = o + jax.lax.dot_general(w2, ah, dn_sa,
                                        preferred_element_type=jnp.float32)
            return o[:ROWS], o[ROWS:]

        tr, ti = t_re[...], t_im[...]
        ar, ai = stage_a(ax)
        ar, ai = _cmul(ar, ai, tr, ti)
        fxr, fxi = _dft(ar, ai, cs)
        br, bi = stage_a(ay)
        br, bi = _cmul(br, bi, tr, ti)
        fyr, fyi = _dft(br, bi, cs)
        sr, si = _cmul(fxr, fxi, fyr, -fyi)
        hr, hi = _idft(sr, si, cs)
        cr, ci = _cmul(hr, hi, tr, -ti)
        wiv = wi[...]
        lhs = jnp.concatenate([wiv[0], wiv[1]], axis=0)  # (2R, M)
        rhs = jnp.concatenate([cr, ci], axis=0)          # (2R, N2)
        if prec == "high3":
            contrib = _dot3(lhs, rhs, dn_acc)
        else:
            contrib = jax.lax.dot_general(
                lhs, rhs, dn_acc, preferred_element_type=jnp.float32,
                precision=prec)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            out[0] = contrib

        @pl.when(i != 0)
        def _acc():
            out[0] = out[0] + contrib

    def run(axhl, ayhl, w1stk, wicat):
        B = axhl.shape[0]
        for a in (axhl, ayhl):
            if a.shape != (B, 2, rows_in, N2) or a.dtype != jnp.bfloat16:
                raise ValueError(
                    f"input must be (B, 2, {rows_in}, {N2}) bf16, got "
                    f"{a.shape} {a.dtype}")
        if w1stk.shape != (3, 2, N1, rows_in):
            raise ValueError(
                f"w1stk must be (3, 2, {N1}, {rows_in}), got {w1stk.shape}")
        if wicat.shape != (2, N1, rows_out_pad):
            raise ValueError(
                f"WiT must be (2, {N1}, {rows_out_pad}), got "
                f"{wicat.shape}")
        out_shape = jax.ShapeDtypeStruct((B, rows_out_pad, N2),
                                         jnp.float32)
        # resident set per step: both input blocks (2 x (2, rows_in,
        # N2) bf16, ~35 MB at day scale) + the f32 accumulator
        # (~7 MB) + DFT temporaries; give Mosaic most of the v5e's
        # 128 MB VMEM
        return pl.pallas_call(
            kernel,
            grid=(B, nb_t),
            in_specs=[a_spec, a_spec, w1_spec, wi_spec] + const_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(axhl, ayhl, w1stk, wicat, *consts)

    return run


def fused_available() -> bool:
    """Whether the fused kernels can run on this backend."""
    try:
        return jax.default_backend() in ("tpu",)
    except RuntimeError:
        return False
