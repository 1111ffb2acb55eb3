"""Receive-only SDR chain — the headless equivalent of the reference's
rx_RN2483.pth topology: SDR source at 500 kHz BW -> DC removal -> demod,
printing every decoded frame (use an RN2483 as the golden transmitter,
lora_tpu.hw.rn2483 CLI).

    PYTHONPATH=. python examples/rx_rn2483.py --driver lime --freq 863.1e6
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
from lora_tpu.config import LoRaConfig  # noqa: E402
from lora_tpu.hw.capture import SoapyCapture  # noqa: E402
from lora_tpu.ops import dcblock  # noqa: E402
from lora_tpu.ops.cplx import IQ  # noqa: E402
from lora_tpu.runtime import StreamDemodulator, decode_frames  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--driver", default="lime")
    ap.add_argument("--freq", type=float, default=863.1e6)
    ap.add_argument("--rate", type=float, default=500e3)
    ap.add_argument("--gain", type=float, default=50.0)
    ap.add_argument("--sf", type=int, default=11)
    ap.add_argument("--sync", type=lambda s: int(s, 0), default=0x12)
    ap.add_argument("--seconds", type=float, default=2.0)
    args = ap.parse_args()

    cfg = LoRaConfig(sf=args.sf, cr="4/7", sync=args.sync, ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(64) + 4)
    sdr = SoapyCapture(driver=args.driver, rate=args.rate, freq=args.freq,
                       gain=args.gain)
    sd = StreamDemodulator(cfg, channels=1)
    print(f"listening on {args.freq/1e6:.3f} MHz, SF{args.sf}, "
          f"sync 0x{args.sync:02x} ... Ctrl-C to stop")
    dstate = None
    try:
        while True:
            re, im = sdr.record(args.seconds)
            # DC removal (the topology's dc_removal block): streaming
            # one-pole blocker, state carried across record() blocks
            y, dstate = dcblock.dcblock(IQ(re, im), state=dstate)
            sd.feed(IQ(np.asarray(y.re)[None], np.asarray(y.im)[None]))
            for f in decode_frames(list(sd.run()), cfg):
                print(f"t={f.t_start} snr={f.snr:.1f} dB cfo={f.freq_error} "
                      f"status={f.status} payload={f.payload!r}")
    except KeyboardInterrupt:
        return 0


if __name__ == "__main__":
    raise SystemExit(main())
