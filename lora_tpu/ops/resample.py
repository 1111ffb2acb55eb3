"""Arbitrary-ratio polyphase resampler (capture-rate -> channel-rate).

The reference's capture harness resamples SDR captures to the LoRa
bandwidth with scipy (RN2483Capture.py:80-84); real front-ends need
non-integer ratios (e.g. 2.048 Msps -> 500 kHz = 4.096).  TPU-native
formulation: a windowed-sinc interpolation filter bank of NPHASE
fractional-delay subfilters (TAPS taps each, Kaiser design, built once on
the host); each output sample gathers TAPS neighbouring inputs and dots
them with its phase's subfilter — one [M, TAPS] gather + one small matmul-
like weighted sum, batched over channels, no sequential state.

Anti-aliasing: for decimation (ratio > 1) the prototype cutoff scales by
1/ratio, so the same bank low-passes and interpolates in one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from .cplx import IQ

NPHASE = 128
TAPS = 8


@functools.lru_cache(maxsize=None)
def _bank(cutoff_num: int, cutoff_den: int, taps: int, beta: float = 8.0) -> np.ndarray:
    """[NPHASE, taps] fractional-delay lowpass bank: one long windowed-sinc
    prototype (length NPHASE*taps, cutoff = num/den of the input Nyquist)
    polyphase-decomposed; subfilter p interpolates at delay p/NPHASE.
    Unit DC gain per phase.  For decimation the caller widens `taps` by the
    ratio so the anti-alias footprint covers ratio*TAPS input samples."""
    cutoff = min(1.0, cutoff_num / cutoff_den)
    L = NPHASE * taps
    n = np.arange(L) - L / 2  # integer-centred: phase 0 is an exact delta
    proto = np.sinc(cutoff * n / NPHASE) * np.kaiser(L, beta)
    h = np.zeros((NPHASE, taps), np.float64)
    for p in range(NPHASE):
        sub = proto[p::NPHASE][:taps]
        h[p, : sub.shape[0]] = sub / max(sub.sum(), 1e-9)
    return h.astype(np.float32)


def resample(x, ratio: float, out_len: int | None = None) -> IQ:
    """Resample IQ [..., T] by `ratio` input samples per output sample
    (ratio > 1 decimates).  Returns IQ [..., M]."""
    x = cplx.as_iq(x)
    T = x.shape[-1]
    taps_eff = int(np.ceil(TAPS * ratio)) if ratio > 1 else TAPS
    if out_len is None:
        # keep every output's (possibly ratio-widened) tap window inside
        # the input
        out_len = int((T - taps_eff) / ratio)
    M = out_len
    # output m draws from input position m*ratio; subfilter p of the bank
    # realizes a delay of -p/NPHASE from the *next* integer sample
    pos = np.arange(M) * ratio
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    p = (frac * NPHASE).round().astype(np.int64)  # in [0, NPHASE]
    base = base + (p > 0)
    phase = (NPHASE - p) % NPHASE
    # decimation: anti-alias cutoff 1/ratio and footprint ratio*TAPS inputs
    num, den = (1000, int(round(1000 * ratio))) if ratio > 1 else (1, 1)
    taps = taps_eff
    center = taps // 2
    idx = base[:, None] + (np.arange(taps)[None, :] - center)  # [M, taps]
    idx = np.clip(idx, 0, T - 1)
    bank = _bank(num, den, taps)
    w = jnp.asarray(bank[phase])          # [M, TAPS] static weights
    ii = jnp.asarray(idx)

    def one(row):  # [..., T] -> [..., M]
        g = row[..., ii]                  # [..., M, TAPS] gather
        return jnp.sum(g * w, axis=-1)

    return IQ(one(x.re), one(x.im))
