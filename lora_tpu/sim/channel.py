"""Channel impairment models (test/simulation fabric).

Replaces the reference's Pothos comms blocks used as the loopback channel:
/comms/noise_source NORMAL + /comms/arithmetic ADD (TestLoopback.cpp:75-76,
97-99) and /comms/rotate (lora_simulation.pth, phase pi/1.2345), plus CFO
and integer sample timing offset injection for receiver-recovery tests.
All functions are pure, batched, and jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def awgn(key: jax.Array, x: jax.Array, amplitude: float = 1.0) -> jax.Array:
    """Complex white Gaussian noise, matching the Pothos noise source's
    NORMAL waveform convention: `amplitude` scales a unit-variance complex
    normal (std 1 per I/Q leg)."""
    kr, ki = jax.random.split(key)
    n = jax.lax.complex(
        jax.random.normal(kr, x.shape, jnp.float32),
        jax.random.normal(ki, x.shape, jnp.float32),
    )
    return x + amplitude * n


def rotate(x: jax.Array, phase: float) -> jax.Array:
    """Static phase rotation (the simulation topology's /comms/rotate with
    phase pi/1.2345)."""
    r = jnp.exp(1j * jnp.float32(phase)).astype(x.dtype)
    return x * r


def cfo(x: jax.Array, offset_bins: float, N: int) -> jax.Array:
    """Carrier frequency offset of `offset_bins` FFT bins (at symbol size N):
    multiply by exp(2j*pi*offset*n/N)."""
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    ang = (2 * np.pi / N) * jnp.float32(offset_bins) * n
    return x * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def time_offset(x: jax.Array, samples: int) -> jax.Array:
    """Delay the stream by prepending `samples` zeros (static shift)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(samples, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1] + samples]
