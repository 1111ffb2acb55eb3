"""Arbitrary-ratio polyphase resampler: tone fidelity and a LoRa frame
round-trip through a 4.096x capture-rate front-end (the reference's
RN2483Capture 2.048 Msps -> 500 kHz use case)."""

import numpy as np
import jax.numpy as jnp

from lora_tpu import api
from lora_tpu.config import LoRaConfig
from lora_tpu.ops import cplx, resample


def test_tone_fidelity_interpolate_and_decimate():
    T = 8192
    f = 0.031
    x = cplx.from_complex(
        np.exp(2j * np.pi * f * np.arange(T)).astype(np.complex64)
    )
    for ratio in (4.096, 2.0, 0.37):
        y = cplx.to_complex(resample.resample(x, ratio))
        m = np.arange(y.shape[-1])
        sl = slice(8, y.shape[-1] - 8)
        want = np.exp(2j * np.pi * f * ratio * m)
        # constant phase/delay offset allowed; shape must match closely
        rot = np.vdot(want[sl], y[sl])
        rot /= abs(rot)
        err = np.abs(y[sl] - rot * want[sl]).max()
        assert err < 5e-3, (ratio, err)


def test_decimation_antialiases():
    # a tone above the output Nyquist must be strongly attenuated
    T = 8192
    ratio = 4.0
    f = 0.9 * 0.5  # near input Nyquist, far outside output band
    x = cplx.from_complex(
        np.exp(2j * np.pi * f * np.arange(T)).astype(np.complex64)
    )
    y = cplx.to_complex(resample.resample(x, ratio))
    assert np.abs(y[8:-8]).mean() < 0.02  # > 34 dB rejection


def test_lora_frame_through_fractional_frontend(rng):
    """Simulate a 4.096x capture: interpolate the baseband frame up, then
    resample down to 1 sample/chip and decode byte-exact."""
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(8) + 2)
    payload = rng.integers(0, 256, size=(1, 8)).astype(np.uint8)
    nb = api.modulate(api.encode(jnp.asarray(payload), cfg), cfg)[0]
    nb = cplx.pad(nb, ((64, 512),))
    ratio = 4.096
    wide = resample.resample(nb, 1.0 / ratio)     # capture-rate samples
    back = resample.resample(wide, ratio)         # channel-rate again
    dem = api.demodulate(back.reshape(1, -1), cfg)
    assert bool(np.asarray(dem.found)[0])
    dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
    assert api.extract_payloads(dec)[0] == bytes(payload[0].tolist())


def test_replay_fractional_capture_rate(tmp_path, rng):
    """File replay at a non-integer capture rate (4.096x the channel rate)."""
    from lora_tpu.hw.capture import replay_file
    from lora_tpu.runtime import iqio

    cfg = LoRaConfig(sf=7, cr="4/6", ampl=0.8)
    cfg = cfg.replace(mtu=cfg.num_symbols(6) + 2)
    payload = np.frombuffer(b"fracRs", np.uint8)
    nb = api.modulate(api.encode(jnp.asarray(payload[None]), cfg), cfg)[0]
    nb = cplx.pad(nb, ((300, 2000),))
    wide = resample.resample(nb, 1.0 / 4.096)  # simulate 4.096x capture
    inter = iqio.interleave_cf32(np.asarray(wide.re), np.asarray(wide.im))
    f = tmp_path / "cap.cf32"
    f.write_bytes(inter.tobytes())
    frames = replay_file(
        str(f), "cf32", cfg, capture_rate=4.096e5, channel_rate=1e5
    )
    assert len(frames) == 1 and frames[0].payload == b"fracRs"
