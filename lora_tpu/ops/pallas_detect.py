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

The DFT is a single direct matrix per window tile (N <= 1024): ~N/log N
more FLOPs than an FFT but perfectly MXU-shaped, and the arithmetic
intensity (~N flops/byte) keeps it compute-bound far above the HBM
roofline a split-radix implementation would also hit.  For SF 11/12
(N = 2048/4096) the XLA four-step matmul path (ops/fft.py) is used instead.

The fine-CFO derotator exp(-2j*pi*ferr*n/N) is evaluated analytically on
the VPU inside the kernel (the reference's N x 128 phasor table,
LoRaDemod.cpp:108-116, never exists in memory).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cplx
from .chirp import _dechirp_table_np
from .cplx import IQ

MAX_DIRECT_N = 1024
_LOG10 = float(np.log(10.0))


def _tile_windows(N: int) -> int:
    return max(8, min(128, (1 << 20) // (N * 4)))


def _kernel(xr, xi, cr, ci, fe, fr, fi, value, power, noise, findex):
    TW, N = xr.shape
    # --- dechirp multiply (VPU) ------------------------------------------
    yr = xr[:] * cr[:] - xi[:] * ci[:]
    yi = xr[:] * ci[:] + xi[:] * cr[:]
    # --- fine-CFO derotator, analytic ------------------------------------
    n = jax.lax.broadcasted_iota(jnp.int32, (TW, N), 1).astype(jnp.float32)
    ang = (-2.0 * np.pi / N) * fe[:] * n
    rr = jnp.cos(ang)
    ri = jnp.sin(ang)
    zr = yr * rr - yi * ri
    zi = yr * ri + yi * rr
    # --- DFT via MXU: S = Z @ F (complex = 4 real matmuls) ----------------
    sr = jnp.dot(zr, fr[:], preferred_element_type=jnp.float32) - jnp.dot(
        zi, fi[:], preferred_element_type=jnp.float32
    )
    si = jnp.dot(zr, fi[:], preferred_element_type=jnp.float32) + jnp.dot(
        zi, fr[:], preferred_element_type=jnp.float32
    )
    mag2 = sr * sr + si * si
    # --- peak search + power accounting (VPU reductions) ------------------
    peak2 = jnp.max(mag2, axis=1, keepdims=True)
    total = jnp.sum(mag2, axis=1, keepdims=True)
    bins = jax.lax.broadcasted_iota(jnp.int32, (TW, N), 1)
    val = jnp.min(
        jnp.where(mag2 == peak2, bins, N), axis=1, keepdims=True
    )  # first max, as the reference's scan (LoRaDetector.hpp:36-48)
    lbin = jnp.where(val == 0, N - 1, val - 1)
    rbin = jnp.where(val == N - 1, 0, val + 1)
    mag = jnp.sqrt(mag2)
    left = jnp.sum(jnp.where(bins == lbin, mag, 0.0), axis=1, keepdims=True)
    right = jnp.sum(jnp.where(bins == rbin, mag, 0.0), axis=1, keepdims=True)

    fund = jnp.sqrt(peak2)
    noise_amp = jnp.sqrt(jnp.maximum(total - peak2, 0.0))
    scale = jnp.float32(20.0 * np.log10(N))
    db = lambda a: (20.0 / _LOG10) * jnp.log(jnp.maximum(a, 1e-20)) - scale
    denom = 2.0 * fund - right - left
    value[:] = val
    power[:] = db(fund)
    noise[:] = db(noise_amp)
    findex[:] = jnp.where(denom == 0.0, 0.0, 0.5 * (right - left) / denom)


@functools.partial(jax.jit, static_argnames=("down", "interpret"))
def _detect_flat(x: IQ, ferr: jax.Array, down: bool, interpret: bool):
    """x: IQ [M, N] dechirp windows, ferr: f32 [M]; M % TW == 0."""
    M, N = x.shape
    TW = _tile_windows(N)
    cre, cim = _dechirp_table_np(N, down)
    from .fft import _dft_matrix_np

    fre, fim = _dft_matrix_np(N)
    grid = (M // TW,)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TW, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), const, memory_space=pltpu.VMEM),
        ],
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
            vmem_limit_bytes=14 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * M * N * N,
            bytes_accessed=M * N * 8 + (M // TW) * N * N * 8 + M * 16,
            transcendentals=3 * M * N,
        ),
        interpret=interpret,
    )(
        x.re,
        x.im,
        jnp.asarray(cre)[None],
        jnp.asarray(cim)[None],
        ferr[:, None].astype(jnp.float32),
        jnp.asarray(fre),
        jnp.asarray(fim),
    )
    return out


def supported(N: int) -> bool:
    return N <= MAX_DIRECT_N and (N & (N - 1)) == 0


def dechirp_detect_pallas(
    x, down: bool = False, ferr=None, interpret: bool = False
):
    """Fused dechirp+detect over windows [..., N] (drop-in for
    detect.dechirp_detect, minus debug mag2).  N <= 1024."""
    from .detect import DetectResult

    x = cplx.as_iq(x)
    *lead, N = x.shape
    if not supported(N):
        raise ValueError(f"pallas detector supports N<=1024 pow2, got {N}")
    M = int(np.prod(lead)) if lead else 1
    xf = x.reshape(M, N)
    if ferr is None:
        fe = jnp.zeros((M,), jnp.float32)
    else:
        fe = jnp.broadcast_to(
            jnp.asarray(ferr, jnp.float32), tuple(lead) if lead else ()
        ).reshape(M)
    TW = _tile_windows(N)
    pad = (-M) % TW
    if pad:
        xf = cplx.pad(xf, ((0, pad), (0, 0)))
        fe = jnp.pad(fe, (0, pad))
    value, power, noise, findex = _detect_flat(xf, fe, down, interpret)

    def shp(a):
        a = a[:M, 0]
        return a.reshape(*lead) if lead else a[0]

    return DetectResult(
        value=shp(value),
        power=shp(power),
        noise=shp(noise),
        f_index=shp(findex),
    )
