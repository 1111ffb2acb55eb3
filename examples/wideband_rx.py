"""Wideband multi-channel receive — BASELINE config 3 as a runnable demo:
a 16-channel grid carrying frames on several channels, channelized and
demodulated in one program, then batch-decoded.

    JAX_PLATFORMS=cpu PYTHONPATH=. python examples/wideband_rx.py
"""

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from lora_tpu import api  # noqa: E402
from lora_tpu.config import LoRaConfig  # noqa: E402
from lora_tpu.models.demodulator import required_samples  # noqa: E402
from lora_tpu.ops import channelizer as chz  # noqa: E402
from lora_tpu.ops import cplx  # noqa: E402
from lora_tpu.utils.trace import frame_events  # noqa: E402


def main() -> int:
    K = 16
    cfg = LoRaConfig(sf=7, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(11) + 4)
    rng = np.random.default_rng(42)

    messages = {3: b"hello ch 3", 8: b"greetings 8", 12: b"twelve here"}
    # buffer must hold the demod window *after* the latest frame offset
    need = required_samples(cfg) + 100 * max(messages) + 256
    wide = None
    print(f"TX: {len(messages)} frames on a {K}-channel grid")
    for c, msg in messages.items():
        p = np.frombuffer(msg.ljust(11), np.uint8)
        nb = api.modulate(api.encode(jnp.asarray(p[None]), cfg), cfg)[0]
        nb = cplx.pad(nb, ((100 * c, need - nb.shape[-1] - 100 * c),))
        up = chz.upconvert(nb, K, c)
        wide = up if wide is None else cplx.IQ(wide.re + up.re, wide.im + up.im)
    T = (wide.shape[-1] // K) * K
    nz = 0.05 * rng.standard_normal((2, T)).astype(np.float32)
    wide = cplx.IQ(wide.re[:T] + nz[0], wide.im[:T] + nz[1])
    print(f"    wideband capture: {T} samples at {K}x channel rate")

    dem, _ = api.channelized_demodulate(wide, K, cfg)
    dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
    got = api.extract_payloads(dec)
    for ev in frame_events(dem, cfg):
        c = ev["channel"]
        print(
            f"RX: ch {c:2d}  t_sync {ev['t_sync']:6d}  snr {ev['snr_db']:6.1f} dB"
            f"  payload {got[c]!r}"
        )
    ok = all(got[c] is not None and got[c].rstrip() == m
             for c, m in messages.items())
    print("byte-exact:", ok)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
