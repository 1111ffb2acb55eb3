"""Streaming runtime: multi-frame recovery over long captures, native IQ
ingest conversions, and the SPSC ring buffer."""

import numpy as np
import pytest
import jax.numpy as jnp

from lora_tpu import api
from lora_tpu.config import LoRaConfig
from lora_tpu.ops import cplx
from lora_tpu.runtime import StreamDemodulator, decode_frames, iqio


def _make_stream(cfg, payloads, gaps, rng, noise=0.0):
    """One channel: frames at increasing offsets separated by `gaps`."""
    chunks = []
    pos = 0
    starts = []
    for p, g in zip(payloads, gaps):
        iq = api.modulate(api.encode(jnp.asarray(p[None]), cfg), cfg)[0]
        chunks.append(np.zeros(g, np.complex64))
        pos += g
        starts.append(pos)
        chunks.append(cplx.to_complex(iq))
        pos += iq.shape[-1]
    chunks.append(np.zeros(4 * cfg.N, np.complex64))
    x = np.concatenate(chunks)
    if noise:
        x = x + noise * (
            rng.standard_normal(x.size) + 1j * rng.standard_normal(x.size)
        ).astype(np.complex64)
    return x, starts


def test_stream_recovers_multiple_frames(rng):
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(8) + 2)
    payloads = [rng.integers(0, 256, 8).astype(np.uint8) for _ in range(4)]
    gaps = [700, 1500, 333, 2048]
    x, starts = _make_stream(cfg, payloads, gaps, rng, noise=0.05)

    sd = StreamDemodulator(cfg, channels=1)
    frames = []
    # feed in awkward chunk sizes to exercise buffering
    for i in range(0, x.size, 5000):
        sd.feed(x[None, i : i + 5000])
        frames.extend(sd.run())
    frames.extend(sd.flush())
    assert len(frames) == 4, [f.t_start for f in frames]
    for f, want in zip(frames, starts):
        assert abs(f.t_start - want) <= 1
    decode_frames(frames, cfg)
    for f, p in zip(frames, payloads):
        assert f.status == 0
        assert f.payload == bytes(p.tolist())


def test_stream_channels_diverge(rng):
    """Channels with different frame timing advance independently."""
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(4) + 2)
    p0 = rng.integers(0, 256, 4).astype(np.uint8)
    p1 = rng.integers(0, 256, 4).astype(np.uint8)
    x0, _ = _make_stream(cfg, [p0, p0], [100, 4000], rng)
    x1, _ = _make_stream(cfg, [p1], [9000], rng)
    T = max(x0.size, x1.size)
    bank = np.zeros((2, T), np.complex64)
    bank[0, : x0.size] = x0
    bank[1, : x1.size] = x1

    sd = StreamDemodulator(cfg, channels=2)
    sd.feed(bank)
    frames = list(sd.run()) + sd.flush()
    n0 = sum(1 for f in frames if f.channel == 0)
    n1 = sum(1 for f in frames if f.channel == 1)
    assert n0 == 2 and n1 == 1
    decode_frames(frames, cfg)
    assert all(f.status == 0 for f in frames)


def test_iq_convert_formats():
    n = 64
    rng = np.random.default_rng(5)
    for fmt, dtype, scale in [
        ("cs8", np.int8, 1 / 128),
        ("cu8", np.uint8, 1 / 128),
        ("cs16", np.int16, 1 / 32768),
        ("cf32", np.float32, 1.0),
    ]:
        if fmt == "cu8":
            raw = rng.integers(0, 256, 2 * n).astype(dtype)
            want = (raw.astype(np.float32) - 127.5) * scale
        elif fmt == "cf32":
            raw = rng.standard_normal(2 * n).astype(dtype)
            want = raw.astype(np.float32)
        else:
            info = np.iinfo(dtype)
            raw = rng.integers(info.min, info.max, 2 * n).astype(dtype)
            want = raw.astype(np.float32) * scale
        re, im = iqio.convert(raw.tobytes(), fmt)
        np.testing.assert_allclose(re, want[0::2], rtol=1e-6)
        np.testing.assert_allclose(im, want[1::2], rtol=1e-6)
    # round-trip planar -> interleaved
    re = np.arange(8, dtype=np.float32)
    im = -re
    inter = iqio.interleave_cf32(re, im)
    r2, i2 = iqio.convert(inter.tobytes(), "cf32")
    np.testing.assert_array_equal(r2, re)
    np.testing.assert_array_equal(i2, im)


def test_iq_ring_wraparound():
    ring = iqio.IqRing(100)
    wrote = ring.write(np.arange(60, dtype=np.float32), np.zeros(60, np.float32))
    assert wrote == 60
    re, _ = ring.read(50)
    np.testing.assert_array_equal(re, np.arange(50, dtype=np.float32))
    # wrap: head at 60, tail at 50, write 80 -> fits 90? capacity 100 - 10 = 90
    wrote = ring.write(
        np.arange(60, 140, dtype=np.float32), np.zeros(80, np.float32)
    )
    assert wrote == 80
    assert ring.available == 90
    re, _ = ring.read(90)
    np.testing.assert_array_equal(re, np.arange(50, 140, dtype=np.float32))
    # overrun accounting
    ring2 = iqio.IqRing(10)
    w = ring2.write(np.ones(25, np.float32), np.ones(25, np.float32))
    assert w == 10 and ring2.dropped == 15


def test_stream_multi_frame_per_step(rng):
    """max_frames > 1 recovers several frames per device step."""
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(4) + 2)
    payloads = [rng.integers(0, 256, 4).astype(np.uint8) for _ in range(5)]
    gaps = [200, 150, 400, 120, 300]
    x, starts = _make_stream(cfg, payloads, gaps, rng, noise=0.02)

    sd = StreamDemodulator(cfg, channels=1, max_frames=3)
    sd.feed(x[None])
    steps = 0
    frames = []
    while sd.ready():
        frames.extend(sd.step())
        steps += 1
    frames.extend(sd.flush())
    assert len(frames) == 5, [f.t_start for f in frames]
    for f, want in zip(frames, starts):
        assert abs(f.t_start - want) <= 1
    decode_frames(frames, cfg)
    assert [f.payload for f in frames] == [bytes(p.tolist()) for p in payloads]
    # frames are dense (~5300 samples apart, window ~5900): multi-frame
    # tracking must beat one-frame-per-step
    assert steps <= 4, steps


def test_stream_soak_random_traffic(rng):
    """Seeded soak: many frames, random payload sizes, random gaps (including
    back-to-back), noise — every frame must be recovered exactly once and
    decode byte-exact.  Guards the re-aim / overshoot / candidate-slot
    interactions as a unit."""
    cfg = LoRaConfig(sf=7, cr="4/7", ampl=1.0)
    max_len = 12
    cfg = cfg.replace(mtu=cfg.num_symbols(max_len) + 2)
    n_frames = 18
    payloads = [
        rng.integers(0, 256, int(rng.integers(1, max_len + 1))).astype(np.uint8)
        for _ in range(n_frames)
    ]
    # gap after frame i must exceed the mtu overshoot past its payload
    # (without a squelch gap the receiver emits mtu symbols and eats the
    # next preamble — the reference FSM behaves identically,
    # LoRaDemod.cpp:286-301), so pad each random gap by that overshoot
    overshoot = [
        (cfg.mtu - cfg.num_symbols(len(p))) * cfg.N + cfg.N for p in payloads
    ]
    base = rng.integers(0, 4000, n_frames)
    gaps = [int(b) + (overshoot[i - 1] if i else 0)
            for i, b in enumerate(base)]
    chunks, pos, starts = [], 0, []
    for p, g in zip(payloads, gaps):
        iq = api.modulate(api.encode(jnp.asarray(p[None]), cfg), cfg)[0]
        chunks.append(np.zeros(g, np.complex64))
        pos += g
        starts.append(pos)
        x = cplx.to_complex(iq)
        chunks.append(x)
        pos += x.size
    chunks.append(np.zeros(2048, np.complex64))
    stream = np.concatenate(chunks)
    stream += 0.05 * (
        rng.standard_normal(stream.size) + 1j * rng.standard_normal(stream.size)
    ).astype(np.complex64)

    sd = StreamDemodulator(cfg, channels=1, max_frames=2)
    frames = []
    for i in range(0, stream.size, 40000):
        sd.feed(stream[None, i : i + 40000])
        frames.extend(sd.run())
    frames.extend(sd.flush())
    assert len(frames) == n_frames, (
        len(frames), starts, [f.t_start for f in frames]
    )
    decode_frames(frames, cfg)
    for f, p, s in zip(frames, payloads, starts):
        assert abs(f.t_start - s) <= 1
        assert f.status == 0 and f.payload == bytes(p.tolist()), (s, f.status)


def test_stream_exact_advance_back_to_back(rng):
    """exact_advance decodes in-step and advances by the true frame length,
    recovering back-to-back frames the reference's mtu-consumption loses."""
    cfg = LoRaConfig(sf=7, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(12) + 8)  # generous mtu padding
    payloads = [rng.integers(0, 256, 4).astype(np.uint8) for _ in range(6)]
    gaps = [40, 0, 3, 0, 17, 1]  # essentially back-to-back
    x, starts = _make_stream(cfg, payloads, gaps, rng, noise=0.02)

    sd = StreamDemodulator(cfg, channels=1, max_frames=2, exact_advance=True)
    sd.feed(x[None])
    frames = list(sd.run()) + sd.flush()
    assert len(frames) == 6, [f.t_start for f in frames]
    for f, p, s in zip(frames, payloads, starts):
        assert abs(f.t_start - s) <= 1
        assert f.status == 0 and f.payload == bytes(p.tolist())


def test_ring_matches_flat_buffer(rng):
    """_Ring append/view/gather vs a flat concatenated array, across
    growth and many wraparounds."""
    from lora_tpu.runtime.stream import _Ring

    B = 3
    ring = _Ring(B, 64)  # tiny: forces both growth and wraps
    flat = np.zeros((B, 0), np.float32)
    base = 0
    for _ in range(40):
        n = int(rng.integers(1, 200))
        re = rng.standard_normal((B, n)).astype(np.float32)
        im = rng.standard_normal((B, n)).astype(np.float32)
        flat = np.concatenate([flat, re], axis=1)
        ring.append(re, im)
        # consumer lags randomly behind
        base = max(base, ring.end - int(rng.integers(1, 300)))
        ring.trim(base)
        assert ring.base >= base or ring.base == base
        W = min(37, ring.end - ring.base)
        if W > 0:
            offs = np.full(B, ring.end - W, np.int64)
            gre, _ = ring.gather(offs, W)
            np.testing.assert_array_equal(gre, flat[:, ring.end - W : ring.end])
            vre, _ = ring.view(ring.end - W, W)
            np.testing.assert_array_equal(vre, flat[:, ring.end - W : ring.end])


def test_pump_pipeline_matches_run(rng):
    """pump() (ingest overlapped with the dispatched device step) must
    recover exactly the frames of the feed/run loop."""
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(6) + 2)
    payloads = [rng.integers(0, 256, 6).astype(np.uint8) for _ in range(3)]
    gaps = [500, 2200, 900]
    x, starts = _make_stream(cfg, payloads, gaps, rng, noise=0.05)

    def frames_of(sd, drive):
        fr = drive(sd)
        fr.extend(sd.flush())
        decode_frames(fr, cfg)
        return [(f.t_start, f.payload, f.status) for f in fr]

    def run_loop(sd):
        out = []
        for i in range(0, x.size, 4000):
            sd.feed(x[None, i : i + 4000])
            out.extend(sd.run())
        return out

    def pump_loop(sd):
        blocks = (x[None, i : i + 4000] for i in range(0, x.size, 4000))
        return list(sd.pump(blocks))

    a = frames_of(StreamDemodulator(cfg, channels=1), run_loop)
    b = frames_of(StreamDemodulator(cfg, channels=1), pump_loop)
    assert a == b and len(a) == 3
    assert [t for t, _, _ in a] == pytest.approx(starts, abs=1)
    assert all(s == 0 for _, _, s in a)


def test_slab_bank_matches_single_dispatch(rng):
    """demodulate_bank (slab-pipelined) must equal one whole-bank dispatch,
    including a zero-padded tail slab."""
    from lora_tpu.runtime import demodulate_bank

    cfg = LoRaConfig(sf=7, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(5) + 2)
    from lora_tpu.models.demodulator import demodulate, required_samples

    B, T = 11, required_samples(cfg)
    payload = rng.integers(0, 256, (B, 5)).astype(np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(payload), cfg), cfg)
    re = np.zeros((B, T), np.float32)
    im = np.zeros((B, T), np.float32)
    re[:, : iq.shape[-1]] = np.asarray(iq.re)[:, :T]
    im[:, : iq.shape[-1]] = np.asarray(iq.im)[:, :T]
    re += 0.03 * rng.standard_normal((B, T)).astype(np.float32)
    im += 0.03 * rng.standard_normal((B, T)).astype(np.float32)
    # kill one channel so not-found rows are exercised too
    re[7] = 0.001 * re[7]
    im[7] = 0.001 * im[7]

    whole = demodulate(cplx.IQ(jnp.asarray(re), jnp.asarray(im)), cfg)
    slabbed = demodulate_bank(re, im, cfg, slab=4)  # 3 slabs, padded tail
    for name in ("found", "symbols", "count", "t_sync", "freq_error"):
        np.testing.assert_array_equal(
            np.asarray(getattr(slabbed, name)),
            np.asarray(getattr(whole, name)),
            err_msg=name,
        )


def test_live_tap_view_observer():
    """LiveTapView (the reference GUI plotters' headless analogue) attaches
    to StreamDemodulator via the observer hook: per-step dashboard carries
    SNR sparklines and the frame event with symbols/CFO; repaints once per
    device step."""
    import io

    from lora_tpu import api
    from lora_tpu.runtime.stream import StreamDemodulator, decode_frames
    from lora_tpu.utils.live import LiveTapView

    from lora_tpu.models.demodulator import required_samples

    cfg = LoRaConfig(sf=7, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(8) + 4)
    msg = np.frombuffer(b"liveview", np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(msg[None]), cfg), cfg)
    T = 2 * required_samples(cfg)
    re = np.zeros((2, T), np.float32)
    im = np.zeros((2, T), np.float32)
    L = iq.shape[-1]
    re[0, 100 : 100 + L] = np.asarray(iq.re)[0]
    im[0, 100 : 100 + L] = np.asarray(iq.im)[0]
    # channel 1: pure (weak) noise — stays frameless in the dashboard
    rng = np.random.default_rng(4)
    re[1] = 0.05 * rng.standard_normal(T).astype(np.float32)
    im[1] = 0.05 * rng.standard_normal(T).astype(np.float32)

    out = io.StringIO()
    view = LiveTapView(channels=2, out=out)
    sd = StreamDemodulator(cfg, channels=2, observer=view)
    sd.feed(cplx.IQ(re, im))
    frames = list(sd.run()) + sd.flush()
    decode_frames(frames, cfg)
    assert [f.payload for f in frames if f.channel == 0] == [b"liveview"]
    assert view.steps >= 1 and view.total_frames == len(frames)
    text = view.render(sd.offsets)
    assert "frame@100" in text            # channel 0's frame event
    assert f"frames {len(frames)}" in text
    assert "sym[" in text
    lines = text.splitlines()
    assert len(lines) == 2 + 2            # header x2 + one row per channel
    assert out.getvalue().count("live taps") == view.steps  # one paint/step

def test_pump_consumer_abandons_early(rng):
    """Round-5 review finding: an abandoned pump() generator (early
    break) must release its ingest worker — a plain bounded q.put would
    block the thread forever on the full queue."""
    import threading
    import time as _time

    from lora_tpu.runtime import StreamDemodulator

    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(4) + 2)
    B = 2
    p = rng.integers(0, 256, (B, 4)).astype(np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(p), cfg), cfg)
    wire = (np.asarray(iq.re) + 1j * np.asarray(iq.im)).astype(np.complex64)
    T = wire.shape[-1] + 60000
    bank = np.zeros((B, T), np.complex64)
    bank[:, 500: 500 + wire.shape[-1]] = wire

    def blocks():
        for i in range(0, T, 4096):
            yield bank[:, i: i + 4096]

    before = threading.active_count()
    sd = StreamDemodulator(cfg, channels=B)
    for _f in sd.pump(blocks()):
        break  # abandon after the first frame
    # the worker must drain out within its put timeout
    deadline = _time.monotonic() + 5.0
    while threading.active_count() > before and _time.monotonic() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= before, "pump worker leaked"
