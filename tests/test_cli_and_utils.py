"""CLI applications (loopback / tx / replay / ber-sweep), packet sources,
and the capture-replay path — the reference's topology + generator-block
surface, headless."""

import json
import subprocess
import sys

import numpy as np
import pytest

from lora_tpu.utils import TestGen, BlockGen


def test_testgen_counter_packets():
    g = TestGen()
    assert bytes(next(g)) == b"0"
    assert bytes(next(g)) == b"1"
    b = g.batch(3, pad_to=4)
    assert b.shape == (3, 4)
    assert bytes(b[0]).rstrip() == b"2"


def test_blockgen_word_sizes():
    g = BlockGen([0x1234, 0xBEEF], word_bits=16)
    pkt = g.next()
    assert pkt is not None and pkt.tolist() == [0x34, 0x12, 0xEF, 0xBE]
    assert g.next() is None  # disarmed after one packet
    g.trigger()
    assert g.next().tolist() == [0x34, 0x12, 0xEF, 0xBE]
    g8 = BlockGen([1, 2, 255], word_bits=8)
    assert g8.next().tolist() == [1, 2, 255]


def _run_cli(*args):
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    return subprocess.run(
        [sys.executable, "-m", "lora_tpu.cli", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd="/tmp",
        timeout=500,
    )


def test_cli_loopback_noisy():
    # CLI wiring under noise at SF7 (cheap fresh-process compile); the
    # reference's SF10/noise-4.0 operating point itself is covered
    # in-process by test_noisy_loopback_reference_operating_point
    r = _run_cli(
        "loopback", "--sf", "7", "--noise", "1.5", "--packets", "3",
        "--length", "16",
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["byte_exact"] == 3 and out["decoded_ok"] == 3


def test_cli_tx_then_replay(tmp_path):
    f = tmp_path / "frame.cf32"
    r = _run_cli(
        "tx", "--sf", "7", "--payload", "48656c6c6f", "--out", str(f),
        "--lead-in", "500", "--lead-out", "8000",
    )
    assert r.returncode == 0, r.stderr[-800:]
    r = _run_cli("replay", "--file", str(f), "--fmt", "cf32", "--sf", "7",
                 "--length", "5")
    assert r.returncode == 0, r.stderr[-800:]
    lines = [json.loads(l) for l in r.stdout.strip().splitlines()]
    assert lines[-1]["frames"] == 1
    assert lines[0]["payload"] == "48656c6c6f" and lines[0]["status"] == 0


def test_replay_cs16_format(tmp_path):
    """Capture replay from a 16-bit wire-format file (the native converter
    path), as an RTL/Lime capture would produce."""
    import jax.numpy as jnp
    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.hw.capture import replay_file
    from lora_tpu.ops import cplx

    cfg = LoRaConfig(sf=8, cr="4/6", ampl=0.5)
    cfg = cfg.replace(mtu=cfg.num_symbols(6) + 2)
    payload = np.frombuffer(b"replay", np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(payload[None]), cfg), cfg)
    re = np.concatenate([np.zeros(777, np.float32), np.asarray(iq.re[0]),
                         np.zeros(9000, np.float32)])
    im = np.concatenate([np.zeros(777, np.float32), np.asarray(iq.im[0]),
                         np.zeros(9000, np.float32)])
    inter = np.empty(re.size * 2, np.int16)
    inter[0::2] = np.round(re * 32767 * 0.9).astype(np.int16)
    inter[1::2] = np.round(im * 32767 * 0.9).astype(np.int16)
    f = tmp_path / "cap.cs16"
    f.write_bytes(inter.tobytes())
    frames = replay_file(str(f), "cs16", cfg)
    assert len(frames) == 1 and frames[0].payload == b"replay"


def test_burst_bounds():
    from lora_tpu.hw.capture import burst_bounds

    rng = np.random.default_rng(9)
    re = 0.01 * rng.standard_normal(64 * 1024).astype(np.float32)
    im = 0.01 * rng.standard_normal(64 * 1024).astype(np.float32)
    re[20000:30000] += 1.0
    a, b = burst_bounds(re, im)
    assert a <= 20000 < 30000 <= b
    assert b - a < 15000
