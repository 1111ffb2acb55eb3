"""Full PHY loopback: encode -> modulate -> channel -> demodulate -> decode.

Mirrors the reference's test_loopback (TestLoopback.cpp:66-133): SF10 with
CR 4/7 and 4/8, TX amplitude 1.0 against NORMAL noise of amplitude 4.0,
byte-exact payload recovery — plus receiver-recovery cases the reference
only exercises via its GUI topologies: sample delay, static phase rotation
(pi/1.2345 from lora_simulation.pth), and CFO.
"""

import numpy as np
import pytest

from lora_tpu import api
from lora_tpu.config import LoRaConfig


def mtu_for(cfg, payload_len):
    return cfg.num_symbols(payload_len) + 4


@pytest.mark.parametrize("sf", [6, 7, 8, 9, 10, 11, 12])
def test_clean_loopback_all_sf(sf, rng):
    payload = rng.integers(0, 256, size=(2, 16)).astype(np.uint8)
    cfg = LoRaConfig(sf=sf, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=mtu_for(cfg, 16))
    dec, dem = api.loopback(payload, cfg)
    assert np.all(np.asarray(dem.found))
    got = api.extract_payloads(dec)
    assert got == [bytes(p.tolist()) for p in payload]


def test_noisy_loopback_reference_operating_point(rng):
    # TestLoopback.cpp:93-101: SF10, signal 1.0 vs NORMAL noise 4.0.
    # The demod program is keyed on (cfg, T) and is the suite's most
    # expensive compile, so share one mtu (sized for the longest
    # reference length) across all three lengths: 2 compiles (one per
    # CR), still both CRs x all three reference payload lengths.
    cfg64 = LoRaConfig(sf=10, cr="4/8", ampl=1.0)
    mtu64 = mtu_for(cfg64, 64)
    for i, (cr, L) in enumerate([("4/8", 8), ("4/7", 33), ("4/8", 64)]):
        cfg = LoRaConfig(sf=10, cr=cr, ampl=1.0)
        payload = rng.integers(0, 256, size=(2, L)).astype(np.uint8)
        c = cfg.replace(mtu=mtu64)
        dec, dem = api.loopback(payload, c, noise_amplitude=4.0, seed=i)
        assert np.all(np.asarray(dem.found)), f"{cr} len {L}"
        got = api.extract_payloads(dec)
        assert got == [bytes(p.tolist()) for p in payload], f"{cr} len {L}"


def test_loopback_with_timing_offset(rng):
    payload = rng.integers(0, 256, size=(1, 24)).astype(np.uint8)
    cfg = LoRaConfig(sf=8, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=mtu_for(cfg, 24))
    for delay in (1, 97, 777, 2048):
        dec, dem = api.loopback(payload, cfg, delay=delay)
        assert bool(np.asarray(dem.found)[0]), f"delay {delay}"
        assert api.extract_payloads(dec)[0] == bytes(payload[0].tolist())


def test_loopback_with_clock_drift(rng):
    """TX/RX sample-clock offset (sim.channel.clock_drift): +-50 ppm —
    beyond a worst-case crystal pair — decodes byte-exact at SF7 (the
    preamble retiming absorbs the accumulated sub-sample drift; neither
    side of the reference's shared-clock loopback models this)."""
    from lora_tpu.models.demodulator import demodulate, required_samples
    from lora_tpu.models.modulator import modulate
    from lora_tpu.ops import cplx
    from lora_tpu.sim import channel as ch

    payload = rng.integers(0, 256, size=(1, 16)).astype(np.uint8)
    cfg = LoRaConfig(sf=7, ampl=1.0)
    cfg = cfg.replace(mtu=mtu_for(cfg, 16))
    iq = modulate(api.encode(payload, cfg), cfg)
    need = -(-(required_samples(cfg) + 300) // 4096) * 4096
    iq = cplx.pad(iq, ((0, 0), (0, need - iq.shape[-1])))
    iq = ch.time_offset(iq, 300)[..., :need]
    for ppm in (-50.0, 50.0):
        drifted = ch.clock_drift(iq, ppm)
        dem = demodulate(drifted, cfg)
        assert bool(np.asarray(dem.found)[0]), f"ppm {ppm}"
        dec = api.decode(dem.symbols.astype(np.int32), cfg)
        assert api.extract_payloads(dec)[0] == bytes(payload[0].tolist()), ppm


def test_loopback_with_phase_rotation(rng):
    # the simulation topology's /comms/rotate impairment (pi/1.2345)
    payload = rng.integers(0, 256, size=(1, 24)).astype(np.uint8)
    cfg = LoRaConfig(sf=8, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=mtu_for(cfg, 24))
    dec, dem = api.loopback(payload, cfg, phase=np.pi / 1.2345)
    assert api.extract_payloads(dec)[0] == bytes(payload[0].tolist())


def test_loopback_with_cfo(rng):
    payload = rng.integers(0, 256, size=(1, 24)).astype(np.uint8)
    cfg = LoRaConfig(sf=8, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=mtu_for(cfg, 24))
    for cfo in (-2.0, -0.4, 0.4, 2.3):
        dec, dem = api.loopback(payload, cfg, cfo_bins=cfo, delay=55)
        assert bool(np.asarray(dem.found)[0]), f"cfo {cfo}"
        assert api.extract_payloads(dec)[0] == bytes(payload[0].tolist()), cfo
        # the coarse CFO estimate reads ~2x the injected offset (downchirp
        # sees time+freq jointly; the demod halves it, LoRaDemod.cpp:278-279)
        if abs(cfo) >= 1:
            assert abs(int(dem.freq_error[0]) - round(2 * cfo)) <= 1


def test_loopback_alternate_sync_word(rng):
    payload = rng.integers(0, 256, size=(1, 16)).astype(np.uint8)
    cfg = LoRaConfig(sf=9, cr="4/6", ampl=1.0, sync=0x3C)
    cfg = cfg.replace(mtu=mtu_for(cfg, 16))
    dec, dem = api.loopback(payload, cfg, delay=300)
    assert api.extract_payloads(dec)[0] == bytes(payload[0].tolist())
    # a demod configured for a different sync word must NOT sync
    from lora_tpu.models import demodulator, encoder, modulator
    import jax.numpy as jnp

    sym = encoder.encode(jnp.asarray(payload), cfg)
    from lora_tpu.ops import cplx

    iq = modulator.modulate(sym, cfg)
    iq = cplx.pad(iq, ((0, 0), (0, demodulator.required_samples(cfg))))
    other = cfg.replace(sync=0x4E)
    dem2 = demodulator.demodulate(iq, other)
    assert not bool(np.asarray(dem2.found)[0])


def test_loopback_reduced_symbol_set(rng):
    # relay/client topology config: PPM = SF-2 (lora_sdr_relay.pth globals)
    payload = rng.integers(0, 256, size=(1, 20)).astype(np.uint8)
    cfg = LoRaConfig(sf=11, ppm=9, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=mtu_for(cfg, 20))
    dec, dem = api.loopback(payload, cfg, noise_amplitude=1.0)
    assert api.extract_payloads(dec)[0] == bytes(payload[0].tolist())


def test_demod_squelch_on_pure_noise(rng):
    # no frame present: the demodulator must not report a packet
    import jax, jax.numpy as jnp
    from lora_tpu.models import demodulator

    cfg = LoRaConfig(sf=8, ampl=1.0, mtu=16, thresh=-18.0)
    T = demodulator.required_samples(cfg)
    noise = (rng.normal(size=(1, T)) + 1j * rng.normal(size=(1, T))).astype(
        np.complex64
    )
    dem = demodulator.demodulate(jnp.asarray(noise), cfg)
    assert int(dem.count[0]) == 0


@pytest.mark.parametrize("pre", [6, 80])
def test_loopback_configurable_preamble_length(pre, rng):
    """The reference modulator hardcodes 10 preamble symbols; real radios
    use 6..65535.  The run-end alignment search must lock regardless.
    The extremes (minimum legal, far past the scan budget) carry the
    coverage; each preamble length is a fresh demod compile."""
    payload = rng.integers(0, 256, size=(1, 12)).astype(np.uint8)
    cfg = LoRaConfig(sf=8, cr="4/7", ampl=1.0, preamble_symbols=pre)
    cfg = cfg.replace(mtu=mtu_for(cfg, 12))
    dec, dem = api.loopback(payload, cfg, delay=431, noise_amplitude=1.0)
    assert bool(np.asarray(dem.found)[0]), pre
    assert api.extract_payloads(dec)[0] == bytes(payload[0].tolist())
    # sync lands preamble_symbols after the (delayed) frame start
    assert abs(int(dem.t_sync[0]) - (431 + pre * cfg.N)) <= 1


def test_demod_debug_taps(rng):
    """debug=True carries the dechirped payload windows and spectra (the
    reference's dec/fft debug ports, LoRaDemod.cpp:81-83)."""
    import jax.numpy as jnp
    from lora_tpu.models import demodulator

    payload = rng.integers(0, 256, size=(1, 8)).astype(np.uint8)
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=mtu_for(cfg, 8))
    iq = api.modulate(api.encode(jnp.asarray(payload), cfg), cfg)
    dem = demodulator.demodulate(iq, cfg, debug=True)
    assert dem.dec is not None and dem.fft_mag2 is not None
    assert dem.dec.re.shape == (1, cfg.mtu, cfg.N)
    assert dem.fft_mag2.shape == (1, cfg.mtu, cfg.N)
    # spectra peak at the detected symbol bins
    peaks = np.argmax(np.asarray(dem.fft_mag2[0]), axis=-1)
    np.testing.assert_array_equal(
        peaks[: int(dem.count[0])], np.asarray(dem.symbols[0, : int(dem.count[0])])
    )
    assert bool(np.asarray(dem.found)[0])


def test_multi_frame_demodulate(rng):
    """max_frames > 1: several frames in one buffer recovered in one call."""
    import jax.numpy as jnp
    from lora_tpu.ops import cplx
    from lora_tpu.models import demodulator

    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(4) + 2)
    p = rng.integers(0, 256, size=(3, 4)).astype(np.uint8)
    frames = api.modulate(api.encode(jnp.asarray(p), cfg), cfg)
    FL = frames.shape[-1]
    gaps = [300, 900, 150]
    T = sum(gaps) + 3 * FL + demodulator.required_samples(cfg)
    buf = np.zeros((1, T), np.complex64)
    pos, starts = 0, []
    fr = cplx.to_complex(frames)
    for i, g in enumerate(gaps):
        pos += g
        starts.append(pos)
        buf[0, pos : pos + FL] = fr[i]
        pos += FL
    dem = demodulator.demodulate(jnp.asarray(buf), cfg, max_frames=4)
    found = np.asarray(dem.found)[0]
    assert found.tolist() == [True, True, True, False]
    t_syncs = np.asarray(dem.t_sync)[0]
    for k, s in enumerate(starts):
        assert abs(int(t_syncs[k]) - (s + 10 * cfg.N)) <= 1
    # all three decode byte-exact
    dec = api.decode(np.asarray(dem.symbols)[0, :3].astype(np.int32), cfg)
    assert api.extract_payloads(dec) == [bytes(x.tolist()) for x in p]
