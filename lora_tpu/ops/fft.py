"""FFT strategies for the dechirp detector (planar complex).

The reference uses a scalar recursive kissfft (kissfft.hh:61-307) — one
transform per symbol.  On TPU the detector runs over O(10^4) windows at a
time and complex dtypes don't exist on device (see ops/cplx.py), so the
transform is reformulated for the hardware:

  - impl="matmul": four-step Cooley-Tukey N = N1*N2 — DFT over columns
    (one [N1,N1] matmul), twiddle, DFT over rows (one [N2,N2] matmul),
    transpose.  Complex arithmetic = 4 real matmuls per stage; all batch
    over windows and run on the MXU; for N <= 256 a single direct DFT
    matrix is used.  This trades ~20x FLOPs for MXU throughput and fusion
    with the dechirp multiply.
  - impl="xla": jnp.fft.fft via complex reconstruction (CPU only — the
    TPU runtime has no complex buffers; used for cross-checks in tests).
  - impl="auto": matmul on TPU, xla elsewhere.

Factor choice keeps each DFT matrix <= 128 wide (MXU tile) and >= 8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from .cplx import IQ


@functools.lru_cache(maxsize=None)
def _dft_matrix_np(n: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n)
    ang = -2 * np.pi / n * np.outer(k, k)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddle_np(n1: int, n2: int) -> tuple[np.ndarray, np.ndarray]:
    k1 = np.arange(n1)[:, None]
    n2i = np.arange(n2)[None, :]
    ang = -2 * np.pi / (n1 * n2) * (k1 * n2i)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _dft_matrix(n: int) -> IQ:
    re, im = _dft_matrix_np(n)
    return IQ(jnp.asarray(re), jnp.asarray(im))


def _twiddle(n1: int, n2: int) -> IQ:
    re, im = _twiddle_np(n1, n2)
    return IQ(jnp.asarray(re), jnp.asarray(im))


def _split(n: int) -> tuple[int, int]:
    """n = n1*n2 with n1 = 128 where possible: the first-stage DFT
    contraction matches the MXU's 128-wide systolic dimension exactly, and
    the second stage (n2 <= 32) carries ~n1/n2 x fewer FLOPs, so its
    smaller contraction is cheap.  Both factors are kept >= 8 (module
    header contract), so 512 factors as 64 x 8 rather than 128 x 4."""
    n1 = min(128, n)
    if 0 < n // n1 < 8:
        n1 = n // 8
    return n1, n // n1


def fft_matmul(x: IQ, precision=jax.lax.Precision.HIGHEST) -> IQ:
    """Batched complex FFT over the last axis via MXU matmuls (planar).

    Decimation x[j2*n1 + j1] = A[j2, j1] keeps j1 (the n1 = 128 factor)
    on the minor axis throughout, so the dominant-FLOP stage — the n1-deep
    DFT contraction — produces a 128-lane-wide result.  The transposed
    layout (contracting n1 first with the small n2 factor minor) ran the
    MXU at ~1/4 rate: its n1-deep stage emitted an n2 (<= 32)-wide minor
    axis.  Same two-stage math as the fused kernel
    (ops/pallas_detect.four_step_vals):

        G[k2, j1] = sum_j2 A[j2, j1] * Wn2[j2, k2]     (n2-deep, wide out)
        X[k1*n2 + k2] = sum_j1 G[k2, j1]*tw[k2, j1] * Wn1[j1, k1]
    """
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError("power-of-two sizes only")
    if n <= 256:
        return cplx.matmul(x, _dft_matrix(n), precision=precision)
    n1, n2 = _split(n)
    a = x.reshape(*x.shape[:-1], n2, n1)  # A[j2, j1]
    g = cplx.einsum("...ji,jk->...ki", a, _dft_matrix(n2), precision=precision)
    g = cplx.mul(g, cplx.broadcast_to(_twiddle(n2, n1), g.shape))
    d = cplx.einsum("...ki,il->...kl", g, _dft_matrix(n1), precision=precision)
    # X[k1*n2 + k2] = D[k2, k1]
    d = IQ(jnp.swapaxes(d.re, -1, -2), jnp.swapaxes(d.im, -1, -2))
    return d.reshape(*x.shape[:-1], n)


def fft(x: IQ, impl: str = "auto") -> IQ:
    x = cplx.as_iq(x)
    if impl == "auto":
        impl = "matmul" if jax.default_backend() in ("tpu", "axon") else "xla"
    if impl == "matmul":
        return fft_matmul(x)
    if impl == "xla":
        spec = jnp.fft.fft(jax.lax.complex(x.re, x.im))
        return IQ(jnp.real(spec), jnp.imag(spec))
    raise ValueError(f"unknown fft impl {impl!r}")
