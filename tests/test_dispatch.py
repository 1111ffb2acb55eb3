"""Heterogeneous channel dispatcher + stream checkpoint/resume."""

import numpy as np
import jax.numpy as jnp
import pytest

from lora_tpu import api
from lora_tpu.config import LoRaConfig
from lora_tpu.ops import cplx
from lora_tpu.parallel import ChannelDispatcher


def _frame(cfg, payload, lead=0, tail=256):
    iq = api.modulate(api.encode(jnp.asarray(payload[None]), cfg), cfg)[0]
    x = cplx.to_complex(iq)
    return np.concatenate(
        [np.zeros(lead, np.complex64), x, np.zeros(tail, np.complex64)]
    )


def test_mixed_sf_channel_groups(rng):
    cfgs = []
    streams = []
    payloads = []
    plan = [(7, "4/8", 0), (9, "4/5", 133), (7, "4/8", 57), (8, "4/7", 301),
            (9, "4/5", 12), (7, "4/8", 999)]
    for sf, cr, lead in plan:
        cfg = LoRaConfig(sf=sf, cr=cr, ampl=1.0)
        cfg = cfg.replace(mtu=cfg.num_symbols(6) + 2)
        p = rng.integers(0, 256, 6).astype(np.uint8)
        cfgs.append(cfg)
        payloads.append(p)
        streams.append(_frame(cfg, p, lead=lead))
    disp = ChannelDispatcher(cfgs)
    assert len(disp.groups) == 3  # three distinct configs
    res = disp.run(streams)
    assert [r.channel for r in res] == list(range(6))
    for r, p in zip(res, payloads):
        assert r.found and r.status == 0
        assert r.payload == bytes(p.tolist())


def test_stream_checkpoint_resume(tmp_path, rng):
    from lora_tpu.runtime import StreamDemodulator, decode_frames

    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(4) + 2)
    p = rng.integers(0, 256, 4).astype(np.uint8)
    x = _frame(cfg, p, lead=5000, tail=8000)

    # run A: feed half, checkpoint, feed rest
    a = StreamDemodulator(cfg, channels=1)
    a.feed(x[None, : x.size // 2])
    frames_a = list(a.run())
    ck = tmp_path / "state.npz"
    a.save_state(str(ck))

    b = StreamDemodulator(cfg, channels=1)
    b.load_state(str(ck))
    b.feed(x[None, x.size // 2 :])
    frames_b = frames_a + list(b.run()) + b.flush()
    decode_frames(frames_b, cfg)
    assert len(frames_b) == 1
    assert frames_b[0].payload == bytes(p.tolist())
    assert abs(frames_b[0].t_start - 5000) <= 1


def test_dispatcher_soft_mode_recovers_weak_channel():
    """ChannelDispatcher(soft=True): the soft-decision path threads through
    per-config group programs — a weak channel the hard path syncs but
    cannot decode comes back byte-exact, clean channels are unaffected."""
    import lora_tpu
    from lora_tpu import api
    from lora_tpu.parallel.dispatch import ChannelDispatcher
    from lora_tpu.ops import cplx

    cfgs = [lora_tpu.LoRaConfig(sf=7, cr="4/8", ampl=1.0),
            lora_tpu.LoRaConfig(sf=8, cr="4/7", ampl=1.0)]
    cfgs = [c.replace(mtu=c.num_symbols(16) + 4) for c in cfgs]
    msgs = [b"dispatch soft A!", b"dispatch soft B!"]
    streams = []
    # seed retuned when required_samples gained the direct-kernel row-grid
    # padding (longer buffers shift the noise draw; the old seed left the
    # weak frame exactly on the recovery cliff)
    rng = np.random.default_rng(1)
    for cfg, m in zip(cfgs, msgs):
        iq = api.modulate(
            api.encode(jnp.asarray(np.frombuffer(m, np.uint8)[None]), cfg),
            cfg,
        )
        T = lora_tpu.required_samples(cfg)
        re = np.zeros(T, np.float32)
        im = np.zeros(T, np.float32)
        k = min(iq.shape[-1], T)
        re[:k] = np.asarray(iq.re)[0][:k]
        im[:k] = np.asarray(iq.im)[0][:k]
        noise = 2.2 if cfg.sf == 7 else 0.1
        re += noise * rng.standard_normal(T).astype(np.float32)
        im += noise * rng.standard_normal(T).astype(np.float32)
        streams.append(cplx.IQ(re, im))
    hard = ChannelDispatcher(cfgs).run(streams)
    soft = ChannelDispatcher(cfgs, soft=True).run(streams)
    assert hard[0].found and hard[0].payload is None  # weak: hard drops it
    assert soft[0].payload == msgs[0]
    assert hard[1].payload == msgs[1] and soft[1].payload == msgs[1]

def test_dispatcher_mesh_soft_combination(rng):
    """mesh + soft together: each expert group demodulates sharded over
    the virtual mesh in spectra mode, soft-decodes, and the CRC-less
    false-positive guard still applies (round-5: the mesh route fetches
    sharded results to host before the guard's numpy work)."""
    import jax

    from lora_tpu.parallel import make_mesh

    mesh = make_mesh()  # all 8 virtual CPU devices on the channel axis
    plan = [(7, "4/8"), (8, "4/7"), (7, "4/8"), (8, "4/7"), (7, "4/8")]
    cfgs, streams, payloads = [], [], []
    for i, (sf, cr) in enumerate(plan):
        cfg = LoRaConfig(sf=sf, cr=cr, ampl=1.0)
        cfg = cfg.replace(mtu=cfg.num_symbols(5) + 2)
        p = rng.integers(0, 256, 5).astype(np.uint8)
        cfgs.append(cfg)
        payloads.append(p)
        streams.append(_frame(cfg, p, lead=31 * i))
    disp = ChannelDispatcher(cfgs, soft=True, mesh=mesh)
    res = disp.run(streams)
    for r, p in zip(res, payloads):
        assert r.found and r.status == 0
        assert r.payload == bytes(p.tolist())
