r"""
:mod:`ops.fft4` -- Four-step (Cooley-Tukey) pruned correlation kernel
=====================================================================

A hand-decomposed frequency-domain correlation for day-scale windows,
replacing XLA's monolithic large-FFT lowering (measured at ~12 GB/s
effective on v5e for 9.4M points) with an MXU-friendly factorization
N = N1 x N2:

* **stage A (forward)**: DFT over the slow axis as a complex *matmul*
  ``W1[k1, n1] @ A[n1, n2]`` — rides the MXU, and prunes to the ``rows``
  actually covered by input samples (the zero padding costs nothing);
* **twiddle**: elementwise ``exp(-2πi k1 n2 / N)``, host-precomputed in
  f64, stored complex64 (no on-device transcendentals);
* **stage B**: batched length-N2 FFTs via XLA (N2 is a 2^a·{1,3,9} fast
  size);
* spectra multiply elementwise in the *permuted* frequency layout — the
  correlation never needs natural frequency order, so the four-step's
  final transpose is skipped entirely;
* **inverse**: length-N2 iFFTs, conjugate twiddle, and a *pruned* inverse
  DFT matmul computing only the output rows covered by the requested lag
  window (production keeps 0..9 h of ±24 h: 17% of rows).

Spec equivalence: identical math to ``ops.cc.correlate`` (reference
``xcorr/util/cc.py:22-79``); oracle-tested against it.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .fft import next_fast_len

__all__ = ["plan_correlate4", "correlate4", "padded_len"]


def _pick_factors(nn: int, n1: int = 512):
    """N1 x N2 >= nn with N2 a TPU-fast length."""
    n2 = next_fast_len((nn + n1 - 1) // n1)
    return n1, n2


def padded_len(n: int, n1: int = None, stageb: str = "pallas") -> int:
    """Stage-A input length ``rows_in * N2`` for a window of ``n`` samples.

    A ``pre_padded=True`` plan (see :func:`plan_correlate4`) consumes
    ``(B, padded_len(n))`` buffers whose tail beyond ``n`` is zero, so the
    caller can materialize windows directly at stage-A geometry (e.g.
    device-side window slicing writes into a zeroed padded stack) and the
    kernel skips its zero-extension pass — a pure read+write of the full
    window that the four-step itself never needed.
    """
    if n1 is None:
        n1 = 528 if stageb == "pallas" else 576
    _, N2 = _pick_factors(2 * n - 1, n1)
    return ((n + N2 - 1) // N2) * N2


def _split_pq(n2: int):
    """Factor N2 = P x Q with P, Q as close to sqrt(N2) as possible."""
    best = None
    p = int(np.sqrt(n2))
    while p >= 2:
        if n2 % p == 0:
            best = (max(p, n2 // p), min(p, n2 // p))
            break
        p -= 1
    if best is None:
        raise ValueError(f"N2={n2} has no usable factorization")
    return best


@lru_cache(maxsize=8)
def _plan(n: int, index_min: int, index_max: int, n1: int):
    """Static plan: factor geometry, twiddles and DFT matrices (host f64,
    stored complex64)."""
    nn = 2 * n - 1
    N1, N2 = _pick_factors(nn, n1)
    N = N1 * N2

    rows_in = (n + N2 - 1) // N2  # input rows covered by n samples

    k1 = np.arange(N1)
    # forward DFT matrix over the slow axis, pruned to input rows
    W1 = np.exp(-2j * np.pi * np.outer(k1, np.arange(rows_in)) / N1)
    # twiddle W_N^(k1 * n2)
    T = np.exp(-2j * np.pi * np.outer(k1, np.arange(N2)) / N)

    # output rows covered by the circular lag gather:
    # fftshifted lag index i in [index_min, index_max) lives at circular
    # index (i - (n-1)) mod N; that index range maps to row range(s)
    z = n - 1
    segs = []
    if index_max <= z:
        segs.append((N + index_min - z, N + index_max - z))
    elif index_min >= z:
        segs.append((index_min - z, index_max - z))
    else:
        segs.append((N + index_min - z, N))
        segs.append((0, index_max - z))
    row_lo = min(s[0] // N2 for s in segs)
    row_hi = max((s[1] - 1) // N2 for s in segs) + 1
    # contiguity: the negative-lag segment sits at the very top rows and
    # the positive at the bottom; handle both by computing the union of
    # two row ranges when split
    if len(segs) == 2:
        rows_sets = [(segs[0][0] // N2, N1),
                     (0, (segs[1][1] - 1) // N2 + 1)]
    else:
        rows_sets = [(row_lo, row_hi)]

    out_rows = []
    for lo, hi in rows_sets:
        out_rows.extend(range(lo, hi))
    out_rows = np.asarray(sorted(set(out_rows)), dtype=np.int64)

    # pruned inverse DFT matrix: rows n1 in out_rows only. jnp.fft.ifft
    # on the fast axis already contributes 1/N2, so 1/N1 completes 1/N.
    W1inv = np.exp(+2j * np.pi * np.outer(out_rows, k1) / N1) / N1

    # map requested lag indices into the pruned (row, col) layout
    # circular index c = row * N2 + col; pruned row position p(row)
    row_pos = {r: i for i, r in enumerate(out_rows)}
    gather = np.empty(index_max - index_min, dtype=np.int64)
    for j, i in enumerate(range(index_min, index_max)):
        c = (i - z) % N
        gather[j] = row_pos[c // N2] * N2 + (c % N2)

    # each circular segment is CONTIGUOUS in the pruned flat layout
    # (consecutive lag -> consecutive circular index -> next pruned row
    # starts exactly where the previous ended), so the lag window is a
    # concat of static slices — no 1.6M-element gather op on device
    segs_flat = []
    for lo, hi in segs:
        start = row_pos[lo // N2] * N2 + (lo % N2)
        segs_flat.append((start, hi - lo))
    # plan-time invariant check (ValueError, not assert: this guards
    # output correctness and must survive python -O)
    if not np.array_equal(
            np.concatenate([np.arange(s, s + ln) for s, ln in segs_flat]),
            gather):
        raise ValueError("pruned lag window is not slice-contiguous "
                         "for this geometry")

    return {
        "N1": N1, "N2": N2, "N": N, "rows_in": rows_in,
        "W1": W1.astype(np.complex64),
        "T": T.astype(np.complex64),
        "W1inv": W1inv.astype(np.complex64),
        "out_rows": out_rows,
        "gather": gather,
        "segs_flat": tuple(segs_flat),
    }


def _finish_ccf(out_flat, x, y, segs_flat, normalize):
    """Shared correlation epilogue: static-slice lag-window extraction,
    optional norm division (zero tails in pre-padded inputs do not
    change the norms), output dtype. One definition — every plan's corr
    closure must apply the identical epilogue."""
    r = _take_lag_window(out_flat, segs_flat)
    if normalize:
        nx = jnp.linalg.norm(x, axis=-1, keepdims=True)
        ny = jnp.linalg.norm(y, axis=-1, keepdims=True)
        denom = nx * ny
        r = r / jnp.where(denom == 0, 1.0, denom)
    return r.astype(x.dtype)


def _take_lag_window(out_flat, segs_flat):
    """Static-slice extraction of the lag window from the pruned flat
    correlation rows (see ``segs_flat`` in :func:`_plan`)."""
    parts = [jax.lax.slice_in_dim(out_flat, s, s + ln, axis=1)
             for s, ln in segs_flat]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _freq_reverse2(Z):
    """Frequency reversal Z(-k) in the permuted (k1, k2) layout.

    k = k2*N1 + k1, so -k mod N maps to k1' = (-k1) % N1 with a carry
    into the fast axis: k2' = (-k2) % N2 when k1 == 0 but
    (-k2 - 1) % N2 when k1 > 0 — the reversal is NOT independent per
    axis. Row-reverse first, then: row 0 gets the head-fixed column
    reversal, rows 1.. get the plain flip (b -> N2-1-b = -b-1 mod N2).
    """
    def rev_headfix(a, axis):
        head = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        tail = jnp.flip(jax.lax.slice_in_dim(a, 1, a.shape[axis],
                                             axis=axis), axis=axis)
        return jnp.concatenate([head, tail], axis=axis)

    R = rev_headfix(Z, -2)  # rows: a -> (-a) % N1
    row0 = rev_headfix(jax.lax.slice_in_dim(R, 0, 1, axis=-2), -1)
    rest = jnp.flip(jax.lax.slice_in_dim(R, 1, R.shape[-2], axis=-2),
                    axis=-1)
    return jnp.concatenate([row0, rest], axis=-2)


@lru_cache(maxsize=32)
def plan_correlate4(n: int, index_min: int = None, index_max: int = None,
                    n1: int = None, normalize: bool = True,
                    packed: bool = False, stageb: str = "fft",
                    precision: str = "high", pre_padded: bool = False,
                    mesh=None, mesh_axes=("batch", "seq")):
    """Build the jitted four-step correlation ``f(x, y) -> ccf``.

    x, y: (B, n) float32. Output: (B, index_max - index_min) float32 in
    fftshifted lag order, identical (to f32 tolerance) to
    :func:`ops.cc.correlate`.

    ``pre_padded=True`` expects ``(B, padded_len(n))`` inputs whose tail
    beyond ``n`` is zero and skips the zero-extension pass (a full
    read+write of each window — ~8 ms/batch at B=80 day scale — that the
    traffic model never counted because the pruned stage-A reads padded
    geometry natively). Normalization is unaffected: the zero tail does
    not change the norms.

    ``packed=True`` runs ONE complex forward transform of ``x + i y`` and
    recovers the cross-spectrum via the Hermitian split
    ``S = (i/4)(|Z|^2 - |Z(-k)|^2) + (1/2) Im(Z * Z(-k))``. Measured on
    v5e it is NOT a win (the frequency-reversal pass costs what the saved
    transform gains, and |Z|^2 differencing loses ~1e-4 accuracy), so the
    default stays False; a fused Pallas reversal could revisit this.

    ``stageb='matmul'`` replaces the fast-axis XLA FFT by a second
    Cooley-Tukey split N2 = P x Q executed as two more MXU matmuls (a
    fully matmul "six-step" transform). The spectrum's fast-axis order is
    then doubly permuted; the inverse runs the exact adjoint, so the
    correlation is unaffected.

    ``mesh``: a :class:`jax.sharding.Mesh` enabling **sequence-parallel**
    execution (SURVEY.md §2.8 P6 — the one intra-op sharding worth
    building: single windows whose four-step working set exceeds one
    chip's HBM). The ``(B, N1, N2)`` spectral planes shard over
    ``mesh_axes = (batch_axis, seq_axis)``: the batch axis over windows
    and the **k1 (slow DFT) axis over seq devices** — stage A's output
    rows split cleanly because k1 is a *free* einsum index, the twiddle /
    stage-B / spectral multiply / inverse stage-B are all row-local, and
    the pruned inverse DFT contracts over k1, which GSPMD lowers to a
    ``reduce-scatter``/``all-reduce`` riding ICI. Either entry of
    ``mesh_axes`` may be ``None`` (axis unsharded); axis names absent
    from the mesh are treated as ``None``. Only the XLA paths
    (``stageb='fft' | 'matmul'``) support a mesh; the fused single-chip
    Pallas kernel and the ``packed`` Hermitian trick (whose frequency
    reversal permutes across rows) raise ``ValueError``. On virtual
    **CPU** meshes use ``stageb='matmul'``: XLA's host fft thunk
    RET_CHECKs on the non-dim0-major layouts sharding induces
    (``fft_thunk.cc: IsMonotonicWithDim0Major``), while the all-matmul
    six-step has no FFT op to trip it.

    Swept on v5e at day scale: n1=576 -> 17.9 pair-days/s, 1024 -> 17.3,
    1152/2304 -> 16.2, 512 -> 16.4, 256 -> 11.5 (monolithic: 4.8).
    ``stageb='pallas'`` (the accelerator default via :mod:`ops.cc`) runs
    the whole stage-B chain in one kernel launch: 55.5 pair-days/s at
    ``precision='high'`` (max err 6e-8 vs a f64 oracle), 83.9 at
    ``'default'`` (bf16 MXU rounding, max err 1e-5 — off the 1e-6
    oracle bar, so 'high' is the default; see ops.pallas_fft).
    """
    if n1 is None:
        # per-path defaults from the v5e day-scale sweeps. The fused
        # pallas kernel wants N2 = 16384 = 128 x 128: with P = Q = 128
        # every matmul and twiddle tile is lane/sublane-native (n1=528 ->
        # 31.6 ms/batch vs 768/P=96 -> 36.2, 576/P=120 -> 38.5, 1152/P=60
        # -> 65; 384 fails to compile). The XLA-FFT paths peak at 576.
        n1 = 528 if stageb == "pallas" else 576
    if packed and stageb != "fft":
        raise ValueError("packed Hermitian split assumes natural fast-axis "
                         "frequency order; use stageb='fft' with packed")
    nn = 2 * n - 1
    index_min = 0 if index_min is None else index_min
    index_max = nn if index_max is None else index_max
    p = _plan(n, index_min, index_max, n1)
    N1, N2, N, rows_in = p["N1"], p["N2"], p["N"], p["rows_in"]

    if mesh is not None:
        if stageb == "pallas":
            raise ValueError(
                "sequence-parallel meshes need the XLA four-step "
                "(stageb='fft' or 'matmul'); the fused Pallas kernel is "
                "single-chip")
        if packed:
            raise ValueError(
                "packed Hermitian split frequency-reverses across k1 "
                "rows (an all-to-all under a seq-sharded layout); use "
                "packed=False with mesh")
        batch_ax, seq_ax = mesh_axes
        live = set(mesh.axis_names)
        batch_ax = batch_ax if batch_ax in live else None
        seq_ax = seq_ax if seq_ax in live else None
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P
        _in_s = NamedSharding(mesh, _P(batch_ax, None))
        _plane_s = NamedSharding(mesh, _P(batch_ax, seq_ax, None))
        _out_s = NamedSharding(mesh, _P(batch_ax, None))

        def _shard_in(a):
            return jax.lax.with_sharding_constraint(a, _in_s)

        def _shard_plane(a):
            return jax.lax.with_sharding_constraint(a, _plane_s)

        def _shard_out(a):
            return jax.lax.with_sharding_constraint(a, _out_s)
    else:
        def _shard_in(a):
            return a

        def _shard_plane(a):
            return a

        def _shard_out(a):
            return a

    if stageb == "pallas":
        return _build_pallas_corr(n, index_min, index_max, p, normalize,
                                  precision, pre_padded)

    # complex einsums: XLA's native 3-pass HIGH (no bf16-split form for
    # complex operands; these paths have no pallas-layout interaction)
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "high3": jax.lax.Precision.HIGH,  # kernel-only alias
            "highest": jax.lax.Precision.HIGHEST}[precision]

    # constants stay host-side as float32 pairs: some PJRT backends
    # (axon tunnel) cannot transfer complex arrays in either direction,
    # so the complex twiddles/DFT matrices are formed on device inside
    # the traced function
    W1_re, W1_im = p["W1"].real.copy(), p["W1"].imag.copy()
    T_re, T_im = p["T"].real.copy(), p["T"].imag.copy()
    Wi_re, Wi_im = p["W1inv"].real.copy(), p["W1inv"].imag.copy()
    segs_flat = p["segs_flat"]

    if stageb == "matmul":
        P, Q = _split_pq(N2)
        WP = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(P))
                    / P).astype(np.complex64)
        WQ = np.exp(-2j * np.pi * np.outer(np.arange(Q), np.arange(Q))
                    / Q).astype(np.complex64)
        # inner twiddle W_{N2}^(q * k_p), laid out (k_p=P, q=Q)
        T2 = np.exp(-2j * np.pi * np.outer(np.arange(P), np.arange(Q))
                    / N2).astype(np.complex64)
        _consts2 = {
            "WP": (WP.real.copy(), WP.imag.copy()),
            "WQ": (WQ.real.copy(), WQ.imag.copy()),
            "T2": (T2.real.copy(), T2.imag.copy()),
        }

        def load2():
            c = {k: jax.lax.complex(jnp.asarray(re), jnp.asarray(im))
                 for k, (re, im) in _consts2.items()}
            return c["WP"], c["WQ"], c["T2"]

        def fwd2(a):
            # DFT over the last axis (length N2) as two matmuls; output
            # in permuted (k_p, k_q) layout flattened to N2
            WPj, WQj, T2j = load2()
            shp = a.shape[:-1]
            A = a.reshape(shp + (P, Q))          # n2 = p*Q + q
            A = jnp.einsum("kp,...pq->...kq", WPj, A,
                          precision=prec)  # over p
            A = A * T2j
            A = jnp.einsum("lq,...kq->...kl", WQj, A,
                          precision=prec)  # over q
            return A.reshape(shp + (N2,))        # (k_p, k_q) flattened

        def inv2(s):
            # exact adjoint/N2 of fwd2: back to natural time order
            WPj, WQj, T2j = load2()
            shp = s.shape[:-1]
            S2 = s.reshape(shp + (P, Q))         # (k_p, k_q)
            S2 = jnp.einsum("lq,...kl->...kq", jnp.conj(WQj), S2,
                            precision=prec) / Q
            S2 = S2 * jnp.conj(T2j)
            S2 = jnp.einsum("kp,...kq->...pq", jnp.conj(WPj), S2,
                            precision=prec) / P
            return S2.reshape(shp + (N2,))       # n2 = p*Q + q
    else:
        def fwd2(a):
            return jnp.fft.fft(a, axis=-1)

        def inv2(s):
            return jnp.fft.ifft(s, axis=-1)

    def forward(v, W1, T):
        # (B, n) real -> (B, N1, N2) spectrum in permuted layout
        if pre_padded:
            A = v.reshape(v.shape[0], rows_in, N2)
        else:
            pad = rows_in * N2 - n
            A = jnp.pad(v, ((0, 0), (0, pad))).reshape(
                v.shape[0], rows_in, N2)
        A = A.astype(jnp.complex64)
        Ah = jnp.einsum("kr,brj->bkj", W1, A,
                        precision=prec)  # MXU stage (k1 a free index:
        Ah = _shard_plane(Ah)            # rows split over seq devices)
        Ah = Ah * T
        return fwd2(Ah)                          # stage B (row-local)

    @jax.jit
    def corr(x, y):
        x, y = _shard_in(x), _shard_in(y)
        W1 = jax.lax.complex(jnp.asarray(W1_re), jnp.asarray(W1_im))
        T = jax.lax.complex(jnp.asarray(T_re), jnp.asarray(T_im))
        W1inv = jax.lax.complex(jnp.asarray(Wi_re), jnp.asarray(Wi_im))
        Tc = jnp.conj(T)
        if packed:
            Z = forward(jax.lax.complex(x, y), W1, T)
            Zr = _freq_reverse2(Z)
            mag = Z.real * Z.real + Z.imag * Z.imag
            mag_r = _freq_reverse2(mag)
            prod_im = (Z * Zr).imag
            S = jax.lax.complex(0.5 * prod_im, 0.25 * (mag - mag_r))
        else:
            Fx = forward(x.astype(jnp.complex64), W1, T)
            Fy = forward(y.astype(jnp.complex64), W1, T)
            S = Fx * jnp.conj(Fy)
        S = _shard_plane(S)
        C = inv2(S)                               # (B, N1, N2) row-local
        C = C * Tc
        # contraction over the seq-sharded k1 axis -> GSPMD inserts the
        # cross-device reduction (reduce-scatter/all-reduce over ICI)
        out = jnp.einsum("rk,bkj->brj", W1inv, C,
                         precision=prec)  # pruned MXU stage
        out = _shard_out(out.real.reshape(x.shape[0], -1))
        return _finish_ccf(out, x, y, segs_flat, normalize)

    return corr


def _precision(name):
    """XLA-side einsum precision. XLA's native 3-pass HIGH is the right
    tool here — a hand-split bf16x3 einsum does NOT survive XLA's
    algebraic simplifier, which merges shared-operand dots back together
    (dot(m,vh)+dot(m,vl) -> dot(m,vh+vl) in bf16), silently dropping the
    lo parts (measured: error identical to 1-pass bf16). Inside Mosaic
    kernels the situation is inverted — no such rewrite, but no native
    HIGH lowering either — hence ops.pallas_fft's manual expansion."""
    return {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "high3": jax.lax.Precision.HIGH,       # kernel tags; the
            "high_block": jax.lax.Precision.HIGH,  # XLA side runs HIGH
            "highest": jax.lax.Precision.HIGHEST}[name]


def _einsum(sub, m, v, prec):
    return jnp.einsum(sub, m, v, precision=prec)


def _build_pallas_corr(n, index_min, index_max, p, normalize, precision,
                       pre_padded=False):
    """Four-step correlation with the whole stage-B chain fused into ONE
    Pallas launch (:func:`ops.pallas_fft.plan_fused_corr`): everything is
    real-valued at the XLA level (x is real and only Re(output) is
    needed), so stage-A costs 2 real MXU matmuls per signal and the
    pruned inverse costs 2; the intermediate spectra never reach HBM.

    **Hermitian half-row pruning**: x and y are real, so the slow-axis
    spectrum rows pair as ``S(N1-k1, k2) = conj(S(k1, (-k2-1) % N2))``
    and — after the row-local inverse transform and conjugate twiddle —
    the time-domain rows pair as simply ``C(N1-k1) = conj(C(k1))``.
    Stage-A, the fused kernel, and all its DFT matmuls therefore run on
    only the first ``ceil((N1/2+1)/8)*8`` k1 rows; the mirror rows fold
    into the pruned inverse constants as the classic real-ifft weights
    ``Re(sum_k w(k) W1inv[r,k] C(k))`` with w = 2 except w(0) =
    w(N1/2) = 1. Exact (no approximation); halves compute and HBM
    traffic of every stage up to the inverse einsum."""
    from .pallas_fft import ROWS, plan_fused_corr

    N1, N2, N, rows_in = p["N1"], p["N2"], p["N"], p["rows_in"]
    if N1 % 2 == 0:
        # clamp: for small even N1 (< 2*ROWS-2) the ROWS-rounded half
        # exceeds N1, which would desync W1[:half] from the kernel plan
        half = min(((N1 // 2 + 1) + ROWS - 1) // ROWS * ROWS, N1)
    else:  # odd N1: no self-paired Nyquist row; keep it simple, run full
        half = N1
    # packed (2, half, rows_in) stage-A matrix: ONE einsum per signal
    # produces re+im stacked, so the padded input is read once (not
    # twice) and the (B, 2, half, N2) output feeds the Pallas kernel
    # directly — no row-flattening relayout copies
    W1cat = np.stack([p["W1"].real[:half], p["W1"].imag[:half]])
    # real-ifft fold weights over the retained k1 columns
    if half == N1:  # full fallback: every row contributes once
        w = np.ones(half)
    else:
        w = np.zeros(half)
        w[: N1 // 2 + 1] = 2.0
        w[0] = 1.0
        w[N1 // 2] = 1.0
    Wi = p["W1inv"][:, :half] * w[None, :]
    # Re(sum_k w(k) W1inv[r,k] C(k)) = Wi_re·cr - Wi_im·ci as ONE
    # einsum over the packed axis: [0] = Wi_re, [1] = -Wi_im
    Wicat = np.stack([Wi.real, -Wi.imag])      # (2, rows_out, half)
    rows_out = Wicat.shape[1]
    # XCORR_FFT4_EINSUM='batched' selects batch-dim dot_generals: with
    # the constants broadcast over b, the natural output order
    # (b, lhs free, rhs free) matches the kernel's packed layout with
    # no transpose copies. Same-session A/B (v5e-1, round 3): +2.5% at
    # B=16 (19.96 vs 20.48 ms), a wash at B=80 (82.8 vs 82.6) — XLA
    # overlaps the legacy form's relayout copies at large B — and the
    # batched dot COMPILES pathologically at B>=64 (~40 min through the
    # AOT tunnel vs 160 s legacy, observed twice). Legacy is therefore
    # the default; the batched form is kept for future A/B.
    W1flat = W1cat.reshape(2 * half, rows_in)
    Wiflat = Wicat.transpose(1, 0, 2).reshape(rows_out, 2 * half)
    segs_flat = p["segs_flat"]
    corr2 = plan_fused_corr(half, N2, N, precision)
    prec = _precision(precision)
    import os
    batched = os.environ.get("XCORR_FFT4_EINSUM", "legacy") == "batched"

    if batched:
        def stage_a(v, w1b):
            B = v.shape[0]
            if pre_padded:
                A = v.reshape(B, rows_in, N2)
            else:
                pad = rows_in * N2 - n
                A = jnp.pad(v, ((0, 0), (0, pad))).reshape(B, rows_in, N2)
            out = _einsum("bpr,brj->bpj", w1b, A, prec)
            return out.reshape(B, 2, half, N2)

        @jax.jit
        def corr(x, y):
            B = x.shape[0]
            w1b = jnp.broadcast_to(
                jnp.asarray(W1flat.astype(np.float32))[None],
                (B, 2 * half, rows_in))
            wib = jnp.broadcast_to(
                jnp.asarray(Wiflat.astype(np.float32))[None],
                (B, rows_out, 2 * half))
            ccat = corr2(stage_a(x, w1b), stage_a(y, w1b))
            out = _einsum("brq,bqj->brj", wib,
                          ccat.reshape(B, 2 * half, N2), prec)
            return _finish_ccf(out.reshape(B, -1), x, y, segs_flat,
                               normalize)
    elif os.environ.get("XCORR_FFT4_FULL", "0") == "1" \
            and rows_in % ROWS == 0 \
            and (-(-rows_out // ROWS) * ROWS) * N2 * 4 <= (8 << 20):
        # XCORR_FFT4_FULL=1: the WHOLE four-step in one kernel launch
        # (stage-A + stage-B + multiply + inverse + pruned inverse; see
        # plan_fused_corr_full). The XLA side only hi/lo-splits the
        # padded input to bf16 (the same expansion XLA's 3-pass HIGH
        # performs internally, so accuracy matches) and applies the lag
        # window + normalization.
        from .pallas_fft import _host_split_bf16, plan_fused_corr_full
        rows_out_pad = -(-rows_out // ROWS) * ROWS
        w_h, w_l = _host_split_bf16(W1cat)      # (2, half, rows_in) each
        W1stk = np.stack([w_h, w_h, w_l])       # terms vs [Ah, Al, Ah]
        WiT = np.zeros((2, half, rows_out_pad), dtype=np.float32)
        WiT[:, :, :rows_out] = Wicat.astype(np.float32).transpose(0, 2, 1)
        corr_full = plan_fused_corr_full(half, N2, N, rows_in,
                                         rows_out_pad, precision)

        def split_hl(v):
            B = v.shape[0]
            if pre_padded:
                A = v.reshape(B, rows_in, N2)
            else:
                pad = rows_in * N2 - n
                A = jnp.pad(v, ((0, 0), (0, pad))).reshape(B, rows_in, N2)
            hi = A.astype(jnp.bfloat16)
            lo = (A - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.stack([hi, lo], axis=1)

        @jax.jit
        def corr(x, y):
            B = x.shape[0]
            acc = corr_full(split_hl(x), split_hl(y),
                            jnp.asarray(W1stk), jnp.asarray(WiT))
            out = acc[:, :rows_out]
            return _finish_ccf(out.reshape(B, -1), x, y, segs_flat,
                               normalize)
    else:  # legacy one-einsum-per-signal forms (A/B reference)
        # XCORR_FFT4_FUSED_INV=1 folds the pruned inverse einsum INTO
        # the Pallas kernel as cross-block accumulation (the full
        # (N1, N2) correlation plane never reaches HBM; see
        # plan_fused_corr_acc). Gated on the accumulator block fitting
        # VMEM — falls back to the two-stage form otherwise.
        from .pallas_fft import plan_fused_corr_acc
        rows_out_pad = -(-rows_out // ROWS) * ROWS
        fuse_inv = (os.environ.get("XCORR_FFT4_FUSED_INV", "0") == "1"
                    and rows_out_pad * N2 * 4 <= (8 << 20))
        if fuse_inv:
            corr_acc = plan_fused_corr_acc(half, N2, N, rows_out_pad,
                                           precision)
            # (2, k1, rows_out_pad): k1 on the sublane axis (Mosaic
            # cannot lane-block the ROWS=8 k1 sweep; see
            # plan_fused_corr_acc)
            WiT = np.zeros((2, half, rows_out_pad), dtype=np.float32)
            WiT[:, :, :rows_out] = \
                Wicat.astype(np.float32).transpose(0, 2, 1)

        def stage_a(v, w1cat):
            if pre_padded:
                A = v.reshape(v.shape[0], rows_in, N2)
            else:
                pad = rows_in * N2 - n
                A = jnp.pad(v, ((0, 0), (0, pad))).reshape(
                    v.shape[0], rows_in, N2)
            return _einsum("pkr,brj->bpkj", w1cat, A, prec)

        @jax.jit
        def corr(x, y):
            w1 = jnp.asarray(W1cat.astype(np.float32))
            B = x.shape[0]
            if fuse_inv:
                acc = corr_acc(stage_a(x, w1), stage_a(y, w1),
                               jnp.asarray(WiT))
                out = acc[:, :rows_out]
            else:
                wi = jnp.asarray(Wicat.astype(np.float32))
                ccat = corr2(stage_a(x, w1), stage_a(y, w1))
                out = _einsum("prk,bpkj->brj", wi, ccat, prec)
            return _finish_ccf(out.reshape(B, -1), x, y, segs_flat,
                               normalize)

    return corr


def correlate4(x, y, index_min: int = None, index_max: int = None,
               normalize: bool = True, n1: int = 512, stageb: str = "fft"):
    """One-shot four-step correlation (plans and jits per shape)."""
    fn = plan_correlate4(x.shape[-1], index_min, index_max, n1=n1,
                         normalize=normalize, stageb=stageb)
    return fn(x, y)


def traffic_model(n: int, index_min: int = None, index_max: int = None,
                  n1: int = None, batch: int = 16):
    """HBM traffic (bytes) of one fused-pallas correlation batch.

    Counts each tensor once per producing/consuming pass: stage-A reads
    the padded inputs and writes 4 f32 planes (re/im x 2 signals); the
    fused kernel reads those and writes the 2 correlation planes; the
    pruned inverse einsums read both planes and write the out_rows
    block; the lag-window slices copy the result. Used for %-of-roofline
    reporting (v5e-1 peak HBM ~819 GB/s).
    """
    nn = 2 * n - 1
    index_min = 0 if index_min is None else index_min
    index_max = nn if index_max is None else index_max
    if n1 is None:
        # MUST match the geometry the dispatch actually runs
        # (plan_correlate4 defaults: pallas 528, fft 576) — a larger n1
        # inflates the modeled bytes and overstates %-of-roofline
        # (768 modeled 6.4% more traffic than the 528 plan measured)
        from .pallas_fft import fused_available
        n1 = 528 if fused_available() else 576
    from .pallas_fft import ROWS
    p = _plan(n, index_min, index_max, n1)
    N1, N2, rows_in = p["N1"], p["N2"], p["rows_in"]
    # Hermitian half-row pruning (see _build_pallas_corr)
    half = min(((N1 // 2 + 1) + ROWS - 1) // ROWS * ROWS, N1) \
        if N1 % 2 == 0 else N1
    f = 4  # float32
    plane = half * N2 * f
    stage_a = 2 * (rows_in * N2 * f + 2 * plane)   # read A, write re+im
    kernel = 4 * plane + 2 * plane                 # read 4, write 2
    rows_out = len(p["out_rows"])
    inverse = 2 * plane + rows_out * N2 * f
    window = 2 * (index_max - index_min) * f
    return batch * (stage_a + kernel + inverse + window)
