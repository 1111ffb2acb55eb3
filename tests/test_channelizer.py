"""Polyphase channelizer: tone binning, aliasing rejection, streaming
state continuity, and LoRa frame recovery through the full
upconvert -> wideband -> channelize -> demod -> decode chain
(BASELINE.json config 3 on a small grid).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lora_tpu import api
from lora_tpu.config import LoRaConfig
from lora_tpu.models.demodulator import required_samples
from lora_tpu.ops import channelizer as chz
from lora_tpu.ops import cplx


def test_tone_lands_in_its_channel():
    K, M = 64, 256
    T = K * M
    k0, delta = 11, 0.21
    x = chz.synthesize_tone(T, (k0 + delta) / K)
    y, _ = chz.channelize(x, K)
    yc = cplx.to_complex(y)[:, 16:]  # [K, M], filter warm-up skipped
    power = np.mean(np.abs(yc) ** 2, axis=-1)
    assert int(np.argmax(power)) == k0
    # neighbours suppressed by the prototype stopband
    others = np.delete(power, k0)
    assert 10 * np.log10(power[k0] / others.max()) > 40.0
    # recovered baseband frequency == delta (cycles per channel-rate sample)
    spec = np.abs(np.fft.fft(yc[k0][-M // 2 :]))
    fhat = np.fft.fftfreq(M // 2)[int(np.argmax(spec))]
    assert abs(fhat - delta / 1.0) < 2.0 / (M // 2)


def test_negative_frequency_channel():
    K, M = 32, 128
    x = chz.synthesize_tone(K * M, -3.0 / K)  # channel K-3
    y, _ = chz.channelize(x, K)
    power = np.mean(np.abs(cplx.to_complex(y)[:, 16:]) ** 2, axis=-1)
    assert int(np.argmax(power)) == K - 3


def test_streaming_state_continuity():
    K, M = 16, 64
    rng = np.random.default_rng(3)
    x = cplx.IQ(
        jnp.asarray(rng.standard_normal(K * M), jnp.float32),
        jnp.asarray(rng.standard_normal(K * M), jnp.float32),
    )
    y_full, _ = chz.channelize(x, K)
    half = K * M // 2
    y1, st = chz.channelize(x[..., :half], K)
    y2, _ = chz.channelize(x[..., half:], K, state=st)
    y_cat = np.concatenate(
        [cplx.to_complex(y1), cplx.to_complex(y2)], axis=-1
    )
    np.testing.assert_allclose(cplx.to_complex(y_full), y_cat, atol=1e-5)


def test_group_width_invariance():
    # the output-group width G is a pure performance knob of the
    # block-Toeplitz contraction (tools/tune_kernels.py sweeps it on
    # hardware): every legal G must produce the same channels
    K, M = 16, 64
    rng = np.random.default_rng(5)
    x = cplx.IQ(
        jnp.asarray(rng.standard_normal((2, K * M)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, K * M)), jnp.float32),
    )
    ref, _ = chz.channelize(x, K)
    for g in (1, 2, 16, 32, 64):
        y, _ = chz.channelize(x, K, group=g)
        np.testing.assert_allclose(
            cplx.to_complex(y), cplx.to_complex(ref), atol=2e-5,
            err_msg=f"group={g}",
        )
    with pytest.raises(ValueError):
        chz.channelize(x, K, group=7)


@pytest.mark.parametrize("chan", [3, 13])
def test_lora_frame_through_channelizer(chan, rng):
    K = 16
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(8) + 2)
    payload = rng.integers(0, 256, size=(1, 8)).astype(np.uint8)
    nb = api.modulate(api.encode(jnp.asarray(payload), cfg), cfg)[0]
    need = required_samples(cfg) + 64
    nb = cplx.pad(nb, ((32, need - nb.shape[-1] - 32),))  # offset + tail
    wide = chz.upconvert(nb, K, chan)
    T = (wide.shape[-1] // K) * K
    # a realistic noise floor: far above the -60 dB stopband leakage (which,
    # being a perfect frame replica, the dechirp gain would otherwise
    # re-acquire in a noiseless sim), far below the in-channel signal
    nz = 1e-2 * (rng.standard_normal((2, T))).astype(np.float32)
    wide = cplx.IQ(wide.re[..., :T] + nz[0], wide.im[..., :T] + nz[1])
    y, _ = chz.channelize(wide, K)
    dem = api.demodulate(y[chan], cfg)
    assert bool(np.asarray(dem.found))
    dec = api.decode(dem.symbols.astype(jnp.int32)[None], cfg)
    assert api.extract_payloads(dec)[0] == bytes(payload[0].tolist())
    # adjacent channel: leakage is below the noise floor => no sync
    dem_adj = api.demodulate(y[(chan + 2) % K], cfg)
    assert not bool(np.asarray(dem_adj.found))


def test_channelize_stream_sharded_matches_local(rng):
    """Time-sharded channelizer + all_to_all corner-turn == one-shot result
    (8-device CPU mesh, 4 time shards x 2 channel shards)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lora_tpu.parallel import make_mesh, channelize_stream

    K, n_time = 16, 4
    mesh = make_mesh(time=n_time)
    T = K * 64 * n_time
    B = 4
    x = cplx.IQ(
        jnp.asarray(rng.standard_normal((B, T)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, T)), jnp.float32),
    )
    want, _ = chz.channelize(x, K)
    xs = jax.device_put(x, NamedSharding(mesh, P("channel", "time")))
    got = channelize_stream(xs, K, mesh)
    np.testing.assert_allclose(
        cplx.to_complex(got), cplx.to_complex(want), atol=1e-5
    )


def test_channelized_demodulate_api(rng):
    """One-program wideband front-end + demod bank (BASELINE config 3)."""
    K = 16
    cfg = LoRaConfig(sf=7, cr="4/6", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(6) + 2)
    chans = [2, 7, 13]
    payloads = {c: rng.integers(0, 256, 6).astype(np.uint8) for c in chans}
    from lora_tpu.models.demodulator import required_samples

    need = required_samples(cfg) + 64
    wide = None
    for c, p in payloads.items():
        nb = api.modulate(api.encode(jnp.asarray(p[None]), cfg), cfg)[0]
        nb = cplx.pad(nb, ((40 * c, need - nb.shape[-1] - 40 * c),))
        up = chz.upconvert(nb, K, c)
        wide = up if wide is None else cplx.IQ(
            wide.re + up.re, wide.im + up.im
        )
    T = (wide.shape[-1] // K) * K
    nz = 1e-2 * rng.standard_normal((2, T)).astype(np.float32)
    wide = cplx.IQ(wide.re[:T] + nz[0], wide.im[:T] + nz[1])

    dem, _state = api.channelized_demodulate(wide, K, cfg)
    found = np.asarray(dem.found)  # [K]
    assert all(found[c] for c in chans)
    dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
    got = api.extract_payloads(dec)
    for c in range(K):
        if c in chans:
            assert got[c] == bytes(payloads[c].tolist()), c
        else:
            # non-synced channels decode their zero symbols to an empty
            # packet; a neighbour may even recover the TX interpolator's
            # faint frame replica in this nearly noiseless sim — it must
            # never produce some *other* payload
            allowed = {None, b""} | {
                bytes(payloads[n].tolist())
                for n in (c - 1, c + 1)
                if n in payloads
            }
            assert got[c] in allowed, (c, got[c])


def test_channelized_demodulate_streaming_state(rng):
    """Chunked wideband processing: the channelizer state passthrough keeps
    the filter history continuous, so a frame in the second chunk decodes
    identically to one-shot processing."""
    K = 16
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(5) + 2)
    from lora_tpu.models.demodulator import required_samples

    payload = rng.integers(0, 256, 5).astype(np.uint8)
    nb = api.modulate(api.encode(jnp.asarray(payload[None]), cfg), cfg)[0]
    lead = required_samples(cfg)  # frame sits in the 2nd half
    need = 2 * lead + 2048
    nb = cplx.pad(nb, ((lead + 300, need - nb.shape[-1] - lead - 300),))
    wide = chz.upconvert(nb, K, 5)
    T = (wide.shape[-1] // (2 * K)) * (2 * K)
    wide = wide[..., :T]

    half = T // 2
    d1, st = api.channelized_demodulate(wide[..., :half], K, cfg)
    d2, _ = api.channelized_demodulate(wide[..., half:], K, cfg, state=st)
    assert bool(np.asarray(d2.found)[5])
    dec = api.decode(d2.symbols.astype(jnp.int32), cfg)
    assert api.extract_payloads(dec)[5] == bytes(payload.tolist())


# ---------------------------------------------------------------------------
# synthesis filterbank (TX combiner)
# ---------------------------------------------------------------------------


def test_synthesize_matches_upconvert_single_channel(rng):
    """Loading one channel of the synthesis bank reproduces upconvert's
    zero-stuff -> interpolate -> mix chain (same prototype): equal up to
    the uncompensated group delay d = (L*K-1)//2 and the constant carrier
    phase e^{2 pi i c d / K} that upconvert's delay slice re-references."""
    K, M, L, c = 16, 96, 8, 5
    u1 = cplx.IQ(
        jnp.asarray(rng.standard_normal(M), jnp.float32),
        jnp.asarray(rng.standard_normal(M), jnp.float32),
    )
    u = cplx.zeros((K, M))
    u = cplx.IQ(u.re.at[c].set(u1.re), u.im.at[c].set(u1.im))
    x, _ = chz.synthesize(u)
    xc = np.asarray(cplx.to_complex(x))
    up = np.asarray(cplx.to_complex(chz.upconvert(u1, K, c)))
    d = (L * K - 1) // 2
    phase = np.exp(2j * np.pi * c * d / K)
    n = min(len(up), len(xc) - d)
    np.testing.assert_allclose(
        xc[d : d + n], up[:n] * phase, atol=2e-4
    )


def test_synthesize_channelize_roundtrip_tones(rng):
    """Near-perfect reconstruction: tones placed on several channels come
    back on the same channels with the right baseband frequency."""
    K, M = 32, 256
    tones = {3: 0.21, 17: -0.10, 30: 0.05}
    u = cplx.zeros((K, M))
    for c, f in tones.items():
        t = chz.synthesize_tone(M, f, ampl=1.0)
        u = cplx.IQ(u.re.at[c].set(t.re), u.im.at[c].set(t.im))
    x, _ = chz.synthesize(u)
    y, _ = chz.channelize(x, K)
    yc = np.asarray(cplx.to_complex(y))[:, 24:]  # skip both filter warmups
    power = np.mean(np.abs(yc) ** 2, axis=-1)
    for c, f in tones.items():
        others = np.delete(power, list(tones))
        assert power[c] > 0.5, (c, power[c])
        assert 10 * np.log10(power[c] / max(others.max(), 1e-12)) > 35.0
        spec = np.abs(np.fft.fft(yc[c]))
        fhat = np.fft.fftfreq(yc.shape[-1])[int(np.argmax(spec))]
        assert abs(fhat - f) < 2.0 / yc.shape[-1], (c, fhat, f)


def test_synthesize_streaming_state_continuity(rng):
    """Chunked synthesize with carried state == one-shot (causal output,
    so chunks concatenate exactly)."""
    K, M = 16, 64
    u = cplx.IQ(
        jnp.asarray(rng.standard_normal((K, M)), jnp.float32),
        jnp.asarray(rng.standard_normal((K, M)), jnp.float32),
    )
    x_full, _ = chz.synthesize(u)
    state = None
    outs = []
    for lo in (0, M // 2):
        xi, state = chz.synthesize(u[..., lo : lo + M // 2], state=state)
        outs.append(np.asarray(cplx.to_complex(xi)))
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(x_full)),
        np.concatenate(outs, axis=-1),
        atol=1e-5,
    )


def test_synthesize_lora_tx_rx_end_to_end(rng):
    """The real config-3 TX story: LoRa frames on several channels merged
    by the synthesis bank, recovered byte-exact through the analysis bank
    + demod + decode."""
    K = 16
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(5) + 2)
    from lora_tpu.models.demodulator import required_samples

    need = required_samples(cfg)
    chans = [2, 9, 14]
    payloads = {c: rng.integers(0, 256, 5).astype(np.uint8) for c in chans}
    u = cplx.zeros((K, need))
    for c, p in payloads.items():
        nb = api.modulate(api.encode(jnp.asarray(p[None]), cfg), cfg)[0]
        d0 = 16 * c
        nb = cplx.pad(nb, ((d0, need - nb.shape[-1] - d0),))
        u = cplx.IQ(u.re.at[c].set(nb.re), u.im.at[c].set(nb.im))
    x, _ = chz.synthesize(u)
    dem, _ = api.channelized_demodulate(x, K, cfg)
    dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
    got = api.extract_payloads(dec)
    found = np.asarray(dem.found)
    for c in chans:
        assert found[c], c
        assert got[c] == bytes(payloads[c].tolist()), c

def test_channelized_demodulate_soft_spectra(rng):
    """Wideband soft RX (round-5): channelized_demodulate(spectra=True)
    carries per-channel payload spectra; decode_soft over the occupied
    channel reproduces the payload."""
    import numpy as np

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import required_samples
    from lora_tpu.ops import cplx

    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(5) + 2)
    p = rng.integers(0, 256, (1, 5)).astype(np.uint8)
    nb = api.modulate(api.encode(jnp.asarray(p), cfg), cfg)[0]
    need = required_samples(cfg)
    nb = cplx.pad(nb, ((48, need + 64 - nb.shape[-1] - 48),))
    K, chan = 8, 3
    wide = chz.upconvert(nb, K, chan)  # returns exactly M*K samples
    dem, _ = api.channelized_demodulate(wide, K, cfg, spectra=True)
    assert dem.fft_mag2 is not None
    assert dem.fft_mag2.shape == (K, cfg.mtu, cfg.N)
    assert bool(np.asarray(dem.found)[chan])
    dec = api.decode_soft(dem.fft_mag2, cfg)
    assert api.extract_payloads(dec)[chan] == bytes(p[0].tolist())
