"""DC blocker (ops/dcblock): the reference RX topology's dc_removal stage
(/root/reference/examples/rx_RN2483.pth) as a streaming associative-scan
high-pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu import api
from lora_tpu.config import LoRaConfig
from lora_tpu.ops import cplx, dcblock
from lora_tpu.ops.cplx import IQ
from lora_tpu.sim import channel as ch


def test_dc_suppressed_tone_passes():
    """A DC offset is driven to ~0 while an in-band tone keeps its
    amplitude (steady state, after the 1/(1-alpha) settling prefix)."""
    n = np.arange(1 << 14, dtype=np.float32)
    tone = IQ(
        np.cos(2 * np.pi * 0.01 * n).astype(np.float32),
        np.sin(2 * np.pi * 0.01 * n).astype(np.float32),
    )
    x = IQ(tone.re + 2.5, tone.im - 1.5)
    y, _ = dcblock.dcblock(x)
    tail_re = np.asarray(y.re)[8192:]
    tail_im = np.asarray(y.im)[8192:]
    # residual mean ~0 (DC gone), RMS ~ the tone's 1/sqrt(2) per leg
    assert abs(tail_re.mean()) < 0.02 and abs(tail_im.mean()) < 0.02
    assert np.sqrt((tail_re**2).mean()) == pytest.approx(0.707, rel=0.05)


def test_chunked_matches_oneshot():
    """Carrying DcState across chunk seams reproduces the one-shot result
    (float tolerance: associative_scan regroups the recurrence)."""
    rng = np.random.default_rng(3)
    T = 10_000
    x = IQ(
        (rng.standard_normal(T) + 0.7).astype(np.float32),
        (rng.standard_normal(T) - 0.2).astype(np.float32),
    )
    y_full, _ = dcblock.dcblock(x)
    state = None
    parts = []
    for a, b in [(0, 1234), (1234, 5000), (5000, 7777), (7777, T)]:
        yc, state = dcblock.dcblock(x[a:b], state=state)
        parts.append(yc)
    y_chunk = cplx.concatenate(parts, axis=-1)
    np.testing.assert_allclose(
        np.asarray(y_chunk.re), np.asarray(y_full.re), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(y_chunk.im), np.asarray(y_full.im), atol=1e-4
    )


def test_dc_spike_blocked_end_to_end():
    """A zero-IF DC spike 30x the signal amplitude blinds the raw demod
    (the dechirped spike floods the noise estimate); through the DC
    blocker the frame decodes byte-exact."""
    from lora_tpu.models.demodulator import demodulate, required_samples

    cfg = LoRaConfig(sf=8, ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(16) + 4)
    payload = np.frombuffer(bytes(range(16)), np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(payload[None]), cfg), cfg)
    need = -(-(required_samples(cfg) + 256) // 4096) * 4096
    iq = cplx.pad(iq, ((0, 0), (0, need - iq.shape[-1])))
    iq = ch.time_offset(iq, 256)[..., :need]
    iq = ch.awgn(jax.random.PRNGKey(0), iq, 0.05)
    xd = IQ(iq.re + np.float32(30.0), iq.im + np.float32(15.0))

    raw = demodulate(xd, cfg)
    assert not bool(raw.found[0])

    y, _ = dcblock.dcblock(xd)
    dem = demodulate(y, cfg)
    assert bool(dem.found[0])
    dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
    assert api.extract_payloads(dec) == [payload.tobytes()]


def test_replay_dc_block_flag(tmp_path):
    """replay_file(dc_block=True) recovers a capture whose tuner DC spike
    dwarfs the burst (the rx_RN2483 use case, chunked so the blocker
    state crosses a seam inside the frame)."""
    from lora_tpu.hw.capture import replay_file
    from lora_tpu.models.decoder import OK

    cfg = LoRaConfig(sf=8, cr="4/6", ampl=0.5)
    cfg = cfg.replace(mtu=cfg.num_symbols(6) + 2)
    payload = np.frombuffer(b"dcspke", np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(payload[None]), cfg), cfg)
    re = np.concatenate([np.zeros(777, np.float32), np.asarray(iq.re[0]),
                         np.zeros(9000, np.float32)]) + np.float32(15.0)
    im = np.concatenate([np.zeros(777, np.float32), np.asarray(iq.im[0]),
                         np.zeros(9000, np.float32)]) - np.float32(7.5)
    inter = np.empty(re.size * 2, np.float32)
    inter[0::2], inter[1::2] = re, im
    f = tmp_path / "cap.cf32"
    f.write_bytes(inter.tobytes())
    base = replay_file(str(f), "cf32", cfg, chunk=8192)
    assert not any(fr.status == OK for fr in base)
    frames = replay_file(str(f), "cf32", cfg, chunk=8192, dc_block=True)
    assert len(frames) == 1 and frames[0].payload == b"dcspke"
