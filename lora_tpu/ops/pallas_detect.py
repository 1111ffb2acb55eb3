"""Fused dechirp + DFT + peak-search Pallas TPU kernel.

One kernel replaces the reference's entire per-symbol receive math —
dechirp multiply (LoRaDemod.cpp:157-166), kissfft transform
(LoRaDetector.hpp:32, kissfft.hh:77-116), argmax/power scan
(LoRaDetector.hpp:36-54) and fractional-bin interpolation (:56-61) — for a
tile of TW windows at a time, keeping every intermediate in VMEM:

    HBM reads : window samples (planar) + DFT matrix tiles
    compute   : dechirp+derotate on the VPU, DFT as 4 real [TW,N]x[N,N]
                MXU matmuls, |.|^2 + masked reductions on the VPU
    HBM writes: 4 scalars per window

The DFT runs as a direct matrix for N <= 256 (contraction 128/256 is
already MXU-shaped) and as the four-step Cooley-Tukey factorization
N = 128 * n2 for N in [512, 4096] — the same factorization as the XLA path
(ops/fft.py) but with the inter-stage corner-turns staying in VMEM instead
of materializing transposed copies in HBM, which is where the XLA path
spends most of its time.

The fine-CFO derotator exp(-2j*pi*ferr*n/N) is evaluated analytically on
the VPU inside the kernel (the reference's N x 128 phasor table,
LoRaDemod.cpp:108-116, never exists in memory).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cplx
from .chirp import _dechirp_table_np
from .cplx import IQ

MAX_DIRECT_N = 256
# bf16 mode MAY run the DENSE DFT up to this bound: one wide [M, N] x
# [N, N] bf16 contraction instead of the four-step's stage-1 VPU
# accumulation + narrow stage-2 matmul.  Measured on the v5e (roll-free
# kernels, SF10/B=2048): the dense path reaches ~43 real TFLOP/s but does
# N/(n1+n2) ~ 7.5x the four-step's FLOPs and LOSES (payload 6.5 vs 8.4
# Gsamp/s) — so the default keeps the four-step everywhere above
# MAX_DIRECT_N.  Env knob retained for re-tuning on other parts.
MAX_DENSE_BF16_N = int(os.environ.get("LORA_MAX_DENSE_BF16_N", "0")) \
    or MAX_DIRECT_N
MAX_N = 4096
_LOG10 = float(np.log(10.0))


def _tile_windows(N: int) -> int:
    # keep ~6-8 [TW, N] f32 temporaries + double-buffered input tiles
    # comfortably under the ~16 MB VMEM budget (N=4096 measured 116 KB over
    # the scoped limit at TW=32 under vmap batching, hence the lower cap)
    if N <= 256:
        # measured on the v5e (tools/tune_kernels.py --detect, M=512k):
        # N=128 runs 6.1 Gsamp/s at TW=128 but 8.4-8.8 at TW=256-1024 in
        # both f32 and bf16 — the [TW, N] matmul is too short at 128 rows
        # to hide the grid-step overhead.  256 keeps the pad waste of
        # small banks bounded (M rounds up to TW).
        return 256
    if N == 2048:
        # round-5 --bigN sweep: TW=32 wins in BOTH modes (f32 6.64 vs
        # 2.28 Gsamp/s at the old TW=64; bf16 5.17 vs 4.95) — the wide
        # tile's four-step temps spill at n2=16
        return 32
    tw = max(8, min(128, (1 << 19) // (N * 4)))
    return min(tw, 16) if N >= 4096 else tw


def _finish_vals(mag2, bins, N, want_findex=True):
    """Shared peak-search epilogue over mag2 with a bin-index map `bins`
    (any trailing layout; reductions collapse every axis but the first).
    Returns (value, power_db, noise_db, findex) as [M, 1] values.
    want_findex=False (static) skips the fractional-bin interpolation — a
    full-array sqrt plus two masked reductions — for consumers that only
    read value/power/noise (the demodulator's coarse and payload stages)."""
    axes = tuple(range(1, mag2.ndim))

    def red(op, v):
        for ax in sorted(axes, reverse=True):
            v = op(v, axis=ax, keepdims=True)
        return v.reshape(v.shape[0], 1)

    peak2 = red(jnp.max, mag2)
    total = red(jnp.sum, mag2)
    pk = peak2.reshape(peak2.shape[0], *([1] * (mag2.ndim - 1)))
    val = red(jnp.min, jnp.where(mag2 == pk, bins, N))
    fund = jnp.sqrt(peak2)
    noise_amp = jnp.sqrt(jnp.maximum(total - peak2, 0.0))
    scale = jnp.float32(20.0 * np.log10(N))
    db = lambda a: (20.0 / _LOG10) * jnp.log(jnp.maximum(a, 1e-20)) - scale
    if not want_findex:
        return val, db(fund), db(noise_amp), jnp.zeros_like(fund)
    lbin = jnp.where(val == 0, N - 1, val - 1)
    rbin = jnp.where(val == N - 1, 0, val + 1)
    lb = lbin.reshape(pk.shape)
    rb = rbin.reshape(pk.shape)
    mag = jnp.sqrt(mag2)
    left = red(jnp.sum, jnp.where(bins == lb, mag, 0.0))
    right = red(jnp.sum, jnp.where(bins == rb, mag, 0.0))
    denom = 2.0 * fund - right - left
    fidx = jnp.where(denom == 0.0, 0.0, 0.5 * (right - left) / denom)
    return val, db(fund), db(noise_amp), fidx


def _finish(mag2, bins, N, value, power, noise, findex, want_findex=True):
    val, pwr, nse, fidx = _finish_vals(mag2, bins, N, want_findex)
    value[:] = val
    power[:] = pwr
    noise[:] = nse
    findex[:] = fidx


def dechirp_derotate_vals(xr, xi, cr, ci, fe):
    """Dechirp multiply + optional analytic fine-CFO derotation, on values:
    xr/xi [TW, N] window samples, cr/ci [1, N] chirp table rows, fe [TW, 1]
    fine CFO in bins or None (skips 2N transcendentals/window)."""
    TW, N = xr.shape
    yr = xr * cr - xi * ci
    yi = xr * ci + xi * cr
    if fe is None:
        return yr, yi
    n = jax.lax.broadcasted_iota(jnp.int32, (TW, N), 1).astype(jnp.float32)
    ang = (-2.0 * np.pi / N) * fe * n
    rr = jnp.cos(ang)
    ri = jnp.sin(ang)
    return yr * rr - yi * ri, yr * ri + yi * rr


def _dechirp_derotate(xr, xi, cr, ci, fe, has_ferr):
    return dechirp_derotate_vals(
        xr[:], xi[:], cr[:], ci[:], fe[:] if has_ferr else None
    )


def _mxu_dot(bf16: bool):
    """MXU contraction with f32 accumulation.  bf16=True casts the operands
    to bfloat16 first: the v5e MXU is bf16-native, so f32 inputs cost ~3-6
    array passes while bf16 costs one.  Detection decisions survive the cast
    (unit-scale samples, 8-bit mantissa -> ~0.4% peak-power error vs the
    >= 10 dB peak/sidelobe margins at the squelch threshold); power/noise dB
    outputs move by < 0.05 dB.  Validated in tests/test_pallas_demod.py."""
    if not bf16:
        return lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return lambda a, b: jnp.dot(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def direct_vals(zr, zi, fr, fi, want_findex=True, bf16=False,
                want_mag2=False):
    """Direct-DFT detect (N <= 256) on dechirped values zr/zi [TW, N] with
    DFT matrix values fr/fi [N, N]: S = Z @ F, one MXU matmul pair.
    Returns (value, power, noise, findex) as [TW, 1] values;
    want_mag2=True appends the |FFT|^2 block [TW, N] (natural bin order)
    — the soft-decision path's evidence (models/softdec)."""
    TW, N = zr.shape
    dot = _mxu_dot(bf16)
    sr = dot(zr, fr) - dot(zi, fi)
    si = dot(zr, fi) + dot(zi, fr)
    mag2 = sr * sr + si * si
    bins = jax.lax.broadcasted_iota(jnp.int32, (TW, N), 1)
    out = _finish_vals(mag2, bins, N, want_findex)
    return (*out, mag2) if want_mag2 else out


def detect_bin_order(N: int, bf16: bool = False):
    """Lane position of DFT bin b in the kernels' mag2 output, as int32
    [N] numpy, or None when the output is already in natural bin order.

    The four-step detect (N > MAX_DIRECT_N) keeps the spectrum in
    group-major layout — group k2 = bin % n2 occupies lanes
    [k2*n1, (k2+1)*n1) with k1 = bin // n2 inside — because interleaving
    to natural order in-kernel would be a stride-n2 lane scatter (a shape
    Mosaic handles badly).  Consumers restore natural order with one
    static XLA gather: natural = permuted[..., detect_bin_order(N)]."""
    if N <= MAX_DIRECT_N or (bf16 and N <= MAX_DENSE_BF16_N):
        return None
    n1 = 128
    n2 = N // n1
    b = np.arange(N)
    return ((b % n2) * n1 + b // n2).astype(np.int32)


def _kernel(xr, xi, cr, ci, fe, fr, fi, value, power, noise, findex,
            *, has_ferr=True, want_findex=True, bf16=False):
    """Direct-DFT variant (N <= 256): S = Z @ F, one MXU matmul pair."""
    zr, zi = _dechirp_derotate(xr, xi, cr, ci, fe, has_ferr)
    val, pwr, nse, fidx = direct_vals(zr, zi, fr[:], fi[:], want_findex, bf16)
    value[:] = val
    power[:] = pwr
    noise[:] = nse
    findex[:] = fidx


def four_step_vals(zr, zi, f1r, f1i, twr, twi, w2, want_findex=True,
                   bf16=False, want_mag2=False):
    """Four-step detect (512 <= N <= 4096) on dechirped values zr/zi
    [TW, N]: N = n1*n2, n1 = 128 minor.  f1r/f1i [n1, n1] DFT matrix
    values, twr/twi [n2, n1] twiddle rows, w2 = (w2r, w2i) numpy [n2, n2].
    Returns (value, power, noise, findex) as [TW, 1] values;
    want_mag2=True appends the |FFT|^2 block [TW, N] in GROUP-MAJOR lane
    order (see detect_bin_order) — restored to natural bin order by one
    static gather outside the kernel.

    Decimation x[j2*n1 + j1] = A[j2, j1]:
        X[k1*n2 + k2] = sum_j1 Wn1[j1,k1] * tw[j1,k2] * G[j1,k2],
        G[j1,k2]      = sum_j2 A[j2,j1] * Wn2[j2,k2].
    Mosaic has no minor-dim-splitting reshapes or 3D contractions, so the
    kernel stays strictly 2D: for each output group k2 (static unroll),
    stage 1 is an n2-term scalar-weighted accumulation of the contiguous
    [TW, 128] sample slices (VPU), and stage 2 is one [TW,128] x [128,128]
    complex matmul (MXU).  Group k2 holds bins k1*n2 + k2; the peak search
    combines across groups without ever materializing the spectrum in HBM.
    """
    TW, N = zr.shape
    n1 = 128
    n2 = N // n1
    w2r, w2i = w2  # [n2, n2] numpy: stage-1 weights become python constants
    dot = _mxu_dot(bf16)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (TW, n1), 1)

    # stage 1 (VPU): per output group k2, G = sum_j2 w2[j2,k2] * A_j2,
    # then the twiddle multiply
    hrs, his = [], []
    for k2 in range(n2):
        gr = jnp.zeros((TW, n1), jnp.float32)
        gi = jnp.zeros((TW, n1), jnp.float32)
        for j2 in range(n2):
            ar = zr[:, j2 * n1 : (j2 + 1) * n1]
            ai = zi[:, j2 * n1 : (j2 + 1) * n1]
            wr = float(w2r[j2, k2])
            wi = float(w2i[j2, k2])
            gr = gr + (ar * wr - ai * wi)
            gi = gi + (ar * wi + ai * wr)
        # twiddle row tw[:, k2] (passed as [n2, n1] table rows)
        tr = twr[k2, :][None, :]
        ti = twi[k2, :][None, :]
        hrs.append(gr * tr - gi * ti)
        his.append(gr * ti + gi * tr)

    # stage 2 (MXU): ONE tall [n2*TW, n1] x [n1, n1] matmul per operand
    # pair instead of n2 separate [TW, n1] dots — n2 small dots re-load
    # the DFT weights into the systolic array every group and leave it
    # ~half idle on the f32 passes; the row-concat is tile-aligned (TW is
    # a multiple of 8) and numerics are identical per row
    hr = jnp.concatenate(hrs, axis=0)
    hi = jnp.concatenate(his, axis=0)
    sr = dot(hr, f1r) - dot(hi, f1i)
    si = dot(hr, f1i) + dot(hi, f1r)
    m2_all = sr * sr + si * si

    mags = []
    peak2 = jnp.full((TW, 1), -1.0, jnp.float32)
    total = jnp.zeros((TW, 1), jnp.float32)
    for k2 in range(n2):
        m2 = m2_all[k2 * TW : (k2 + 1) * TW]
        mags.append(m2)
        peak2 = jnp.maximum(peak2, jnp.max(m2, axis=1, keepdims=True))
        total = total + jnp.sum(m2, axis=1, keepdims=True)

    val = jnp.full((TW, 1), N, jnp.int32)
    for k2 in range(n2):
        bins_g = k1 * n2 + k2
        val = jnp.minimum(
            val,
            jnp.min(
                jnp.where(mags[k2] == peak2, bins_g, N), axis=1, keepdims=True
            ),
        )
    fund = jnp.sqrt(peak2)
    noise_amp = jnp.sqrt(jnp.maximum(total - peak2, 0.0))
    scale = jnp.float32(20.0 * np.log10(N))
    db = lambda a: (20.0 / _LOG10) * jnp.log(jnp.maximum(a, 1e-20)) - scale
    pwr = db(fund)
    nse = db(noise_amp)
    # group-major spectrum: lane k2*n1 + k1 holds bin k1*n2 + k2 (a
    # tile-aligned lane concat; natural interleave would be a lane scatter)
    m2_out = jnp.concatenate(mags, axis=1) if want_mag2 else None
    if not want_findex:
        out = (val, pwr, nse, jnp.zeros_like(fund))
        return (*out, m2_out) if want_mag2 else out
    lbin = jnp.where(val == 0, N - 1, val - 1)
    rbin = jnp.where(val == N - 1, 0, val + 1)
    left = jnp.zeros((TW, 1), jnp.float32)
    right = jnp.zeros((TW, 1), jnp.float32)
    for k2 in range(n2):
        bins_g = k1 * n2 + k2
        mag = jnp.sqrt(mags[k2])
        left = left + jnp.sum(
            jnp.where(bins_g == lbin, mag, 0.0), axis=1, keepdims=True
        )
        right = right + jnp.sum(
            jnp.where(bins_g == rbin, mag, 0.0), axis=1, keepdims=True
        )
    denom = 2.0 * fund - right - left
    fidx = jnp.where(denom == 0.0, 0.0, 0.5 * (right - left) / denom)
    out = (val, pwr, nse, fidx)
    return (*out, m2_out) if want_mag2 else out


def _kernel4(
    xr, xi, cr, ci, fe, f1r, f1i, twr, twi,
    value, power, noise, findex, *, w2, has_ferr=True, want_findex=True,
    bf16=False,
):
    """Four-step variant (512 <= N <= 4096); see four_step_vals."""
    zr, zi = _dechirp_derotate(xr, xi, cr, ci, fe, has_ferr)
    val, pwr, nse, fidx = four_step_vals(
        zr, zi, f1r[:], f1i[:], twr[:], twi[:], w2, want_findex, bf16
    )
    value[:] = val
    power[:] = pwr
    noise[:] = nse
    findex[:] = fidx


@functools.partial(jax.jit, static_argnames=("down", "interpret", "has_ferr",
                                              "want_findex", "bf16", "tw"))
def _detect_flat(x: IQ, ferr: jax.Array, down: bool, interpret: bool,
                 has_ferr: bool = True, want_findex: bool = True,
                 bf16: bool = False, tw: int | None = None):
    """x: IQ [M, N] dechirp windows, ferr: f32 [M]; M % TW == 0."""
    M, N = x.shape
    TW = tw or _tile_windows(N)
    cre, cim = _dechirp_table_np(N, down)
    from .fft import _dft_matrix_np, _twiddle_np

    grid = (M // TW,)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    cspec = lambda shape: pl.BlockSpec(
        shape, const, memory_space=pltpu.VMEM
    )
    common_in = [
        pl.BlockSpec((TW, N), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((TW, N), row, memory_space=pltpu.VMEM),
        cspec((1, N)),
        cspec((1, N)),
        pl.BlockSpec((TW, 1), row, memory_space=pltpu.VMEM),
    ]
    common_args = [
        x.re,
        x.im,
        jnp.asarray(cre)[None],
        jnp.asarray(cim)[None],
        ferr[:, None].astype(jnp.float32),
    ]
    if N <= MAX_DIRECT_N or (bf16 and N <= MAX_DENSE_BF16_N):
        kernel = functools.partial(
            _kernel, has_ferr=has_ferr, want_findex=want_findex, bf16=bf16
        )
        fre, fim = _dft_matrix_np(N)
        dt = jnp.bfloat16 if (bf16 and N > MAX_DIRECT_N) else jnp.float32
        in_specs = common_in + [cspec((N, N)), cspec((N, N))]
        args = common_args + [jnp.asarray(fre, dt), jnp.asarray(fim, dt)]
        flops = 4 * 2 * M * N * N
    else:
        n1 = 128
        n2 = N // n1
        f1re, f1im = _dft_matrix_np(n1)
        kernel = functools.partial(
            _kernel4, w2=_dft_matrix_np(n2), has_ferr=has_ferr,
            want_findex=want_findex, bf16=bf16,
        )
        twre, twim = _twiddle_np(n2, n1)  # T[k2, j1] = exp(-2pi i j1 k2 / N)
        in_specs = common_in + [
            cspec((n1, n1)),
            cspec((n1, n1)),
            cspec((n2, n1)),
            cspec((n2, n1)),
        ]
        args = common_args + [
            jnp.asarray(f1re),
            jnp.asarray(f1im),
            jnp.asarray(twre),
            jnp.asarray(twim),
        ]
        flops = 4 * 2 * M * N * (n1 + n2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TW, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(24 if (
                bf16 and MAX_DIRECT_N < N <= MAX_DENSE_BF16_N
            ) else 14) * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=M * N * 8 + M * 16,
            transcendentals=3 * M * N,
        ),
        interpret=interpret,
    )(*args)
    return out


def supported(N: int) -> bool:
    return N <= MAX_N and (N & (N - 1)) == 0 and (N <= 256 or N >= 512)


def dechirp_detect_pallas(
    x, down: bool = False, ferr=None, interpret: bool = False,
    want_findex: bool = True, bf16: bool = False, tw: int | None = None,
):
    """Fused dechirp+detect over windows [..., N] (drop-in for
    detect.dechirp_detect, minus debug mag2).  Power-of-two N up to
    MAX_N = 4096 (direct DFT to 256, four-step from 512).  tw overrides
    the windows-per-grid-cell tile (tuning sweeps; default
    _tile_windows(N))."""
    from .detect import DetectResult

    x = cplx.as_iq(x)
    *lead, N = x.shape
    if not supported(N):
        raise ValueError(f"pallas detector supports pow2 N<={MAX_N}, got {N}")
    M = int(np.prod(lead)) if lead else 1
    xf = x.reshape(M, N)
    has_ferr = ferr is not None
    if ferr is None:
        fe = jnp.zeros((M,), jnp.float32)
    else:
        fe = jnp.broadcast_to(
            jnp.asarray(ferr, jnp.float32), tuple(lead) if lead else ()
        ).reshape(M)
    TW = tw or _tile_windows(N)
    pad = (-M) % TW
    if pad:
        xf = cplx.pad(xf, ((0, pad), (0, 0)))
        fe = jnp.pad(fe, (0, pad))
    value, power, noise, findex = _detect_flat(
        xf, fe, down, interpret, has_ferr, want_findex, bf16, tw
    )

    def shp(a):
        a = a[:M, 0]
        return a.reshape(*lead) if lead else a[0]

    return DetectResult(
        value=shp(value),
        power=shp(power),
        noise=shp(noise),
        f_index=shp(findex),
    )
