"""Batched dechirp + FFT + argmax symbol detection (planar complex).

Reformulates the reference's per-symbol scalar path — dechirp multiply loop
(LoRaDemod.cpp:157-166) feeding kissfft + argmax/power scan + fractional-bin
interpolation (LoRaDetector.hpp:29-64) — as one fused batched array op over
[..., W, N] sample windows.  The fine-CFO rotator table of N*128 phasors
(LoRaDemod.cpp:108-116) becomes the analytic rotator exp(-2j*pi*ferr*n/N)
folded into the dechirp multiply (a constant per-window phase does not
affect |FFT|, so no cross-window rotator continuity is needed).

All complex data is planar (ops/cplx.py) — the TPU runtime has no complex
buffers.  The FFT runs through MXU matmuls (ops/fft.py) or, on TPU, the
whole dechirp+FFT+argmax chain runs as one fused Pallas kernel
(ops/pallas_detect.py) that keeps every intermediate in VMEM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from . import fft as fft_ops
from .chirp import dechirp_table
from .cplx import IQ


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DetectResult:
    """Per-window detector outputs (shape [...] = input batch/window axes)."""

    value: jax.Array      # int32 argmax bin (the symbol measurement)
    power: jax.Array      # float32 peak power, dB (scaled by 20*log10(N))
    noise: jax.Array      # float32 residual power, dB (total minus peak)
    f_index: jax.Array    # float32 fractional-bin offset of the peak
    mag2: Optional[jax.Array] = None  # float32 [..., N] |FFT|^2 (debug tap)


def rotator(ferr, N: int) -> IQ:
    """Fine-CFO derotator exp(-2j*pi*ferr*n/N); ferr in (fractional) bins,
    traced or static, broadcasting over leading axes."""
    n = jnp.arange(N, dtype=jnp.float32)
    ang = (-2 * np.pi / N) * jnp.asarray(ferr, jnp.float32)[..., None] * n
    return IQ(jnp.cos(ang), jnp.sin(ang))


def dechirp(x, down: bool = False, ferr=None) -> IQ:
    """Multiply sample windows [..., N] by the dechirp table (and optional
    fine-CFO derotator)."""
    x = cplx.as_iq(x)
    N = x.shape[-1]
    d = cplx.mul(x, cplx.broadcast_to(dechirp_table(N, down), x.shape))
    if ferr is not None:
        r = rotator(ferr, N)
        d = cplx.mul(d, cplx.broadcast_to(r, d.shape))
    return d


def _from_mag2(mag2: jax.Array, want_mag2: bool) -> DetectResult:
    """Reductions of |FFT|^2 windows [..., N] into detector outputs."""
    N = mag2.shape[-1]
    value = jnp.argmax(mag2, axis=-1).astype(jnp.int32)
    peak2 = jnp.max(mag2, axis=-1)
    total = jnp.sum(mag2, axis=-1)

    power_scale = jnp.float32(20.0 * np.log10(N))
    fundamental = jnp.sqrt(peak2)
    noise_amp = jnp.sqrt(jnp.maximum(total - peak2, 0.0))
    power = 20.0 * jnp.log10(jnp.maximum(fundamental, 1e-20)) - power_scale
    noise = 20.0 * jnp.log10(jnp.maximum(noise_amp, 1e-20)) - power_scale

    left_i = (value - 1) % N
    right_i = (value + 1) % N
    mag = jnp.sqrt(mag2)
    left = jnp.take_along_axis(mag, left_i[..., None], axis=-1)[..., 0]
    right = jnp.take_along_axis(mag, right_i[..., None], axis=-1)[..., 0]
    denom = 2.0 * fundamental - right - left
    f_index = jnp.where(denom == 0.0, 0.0, 0.5 * (right - left) / denom)

    return DetectResult(
        value=value,
        power=power,
        noise=noise,
        f_index=f_index,
        mag2=mag2 if want_mag2 else None,
    )


def detect(
    dechirped,
    want_mag2: bool = False,
    fft_impl: str = "auto",
) -> DetectResult:
    """argmax(|FFT|^2) detection over dechirped windows [..., N].

    Returns bin index, peak/noise powers in dB (normalized by 20*log10(N),
    LoRaDetector.hpp:18,50-54) and the 3-point fractional-bin interpolation
    (LoRaDetector.hpp:56-61).
    """
    dechirped = cplx.as_iq(dechirped)
    spectrum = fft_ops.fft(dechirped, impl=fft_impl)
    return _from_mag2(cplx.mag2(spectrum), want_mag2)


def dechirp_detect(
    x,
    down: bool = False,
    ferr=None,
    want_mag2: bool = False,
    fft_impl: str = "auto",
    want_f_index: bool = True,
    bf16: bool = False,
) -> DetectResult:
    """Fused dechirp + detect over sample windows [..., N].

    On TPU, batched window stacks route to the fused Pallas kernel
    (ops/pallas_detect.py, ~2x the XLA matmul path); single windows (the
    demodulator's sequential sync scan) and debug taps stay on XLA.
    bf16=True casts the Pallas kernel's DFT matmul operands to bfloat16
    with f32 accumulation (ops/pallas_detect._mxu_dot); it only affects
    the Pallas route — the XLA fallback stays f32.
    """
    x = cplx.as_iq(x)
    if fft_impl in ("auto", "pallas") and not want_mag2:
        from . import pallas_detect

        # Batched window stacks only: single-window calls (the demodulator's
        # sequential sync scan, vmapped over channels with a per-channel
        # traced ferr) measured both slower and incorrectly batched through
        # pallas_call's vmap rule — they stay on the XLA path.
        use = fft_impl == "pallas" or (
            jax.default_backend() == "tpu"
            and x.ndim >= 2
            and pallas_detect.supported(x.shape[-1])
        )
        if use:
            return pallas_detect.dechirp_detect_pallas(
                x, down, ferr, want_findex=want_f_index, bf16=bf16
            )
    return detect(dechirp(x, down, ferr), want_mag2=want_mag2, fft_impl=fft_impl)
