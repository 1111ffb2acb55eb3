"""FFT strategies for the dechirp detector.

The reference uses a scalar recursive kissfft (kissfft.hh:61-307) — one
transform per symbol.  On TPU the detector runs over O(10^4) windows at a
time, so the transform is reformulated for the hardware:

  - impl="matmul": four-step Cooley-Tukey N = N1*N2 — DFT over columns
    (one [N1,N1] matmul), twiddle, DFT over rows (one [N2,N2] matmul),
    transpose.  Both matmuls batch over all windows and run on the MXU;
    for N <= 256 a single direct DFT matrix is used.  This trades ~20x
    FLOPs for MXU throughput and fusion with the dechirp multiply.
  - impl="xla": jnp.fft.fft (XLA's native FFT).
  - impl="auto": matmul on TPU, xla elsewhere.

Factor choice keeps each DFT matrix <= 128 wide (MXU tile) and >= 8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_matrix_np(n: int) -> np.ndarray:
    k = np.arange(n)
    w = np.exp(-2j * np.pi / n * np.outer(k, k))
    return w.astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _twiddle_np(n1: int, n2: int) -> np.ndarray:
    k1 = np.arange(n1)[:, None]
    n2i = np.arange(n2)[None, :]
    return np.exp(-2j * np.pi / (n1 * n2) * (k1 * n2i)).astype(np.complex64)


def _split(n: int) -> tuple[int, int]:
    """n = n1*n2 with n1 the larger power-of-two factor <= 128."""
    n1 = 1
    while n1 * n1 < n:
        n1 *= 2
    n1 = min(n1, 128)
    return n1, n // n1


def fft_matmul(x: jax.Array, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Batched complex FFT over the last axis via MXU matmuls."""
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError("power-of-two sizes only")
    if n <= 256:
        w = jnp.asarray(_dft_matrix_np(n))
        return jnp.matmul(x, w, precision=precision)
    n1, n2 = _split(n)
    a = x.reshape(*x.shape[:-1], n1, n2)
    f1 = jnp.asarray(_dft_matrix_np(n1))
    # DFT over the n1 axis: B[k1, n2] = sum_n1 A[n1, n2] W^{n1 k1}
    b = jnp.einsum("...ij,ik->...kj", a, f1, precision=precision)
    b = b * jnp.asarray(_twiddle_np(n1, n2))
    f2 = jnp.asarray(_dft_matrix_np(n2))
    d = jnp.einsum("...kj,jl->...kl", b, f2, precision=precision)
    # X[k1 + n1*k2] = D[k1, k2]
    return jnp.swapaxes(d, -1, -2).reshape(*x.shape[:-1], n)


def fft(x: jax.Array, impl: str = "auto") -> jax.Array:
    if impl == "auto":
        impl = "matmul" if jax.default_backend() in ("tpu", "axon") else "xla"
    if impl == "matmul":
        return fft_matmul(x)
    if impl == "xla":
        return jnp.fft.fft(x)
    raise ValueError(f"unknown fft impl {impl!r}")
