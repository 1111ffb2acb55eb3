"""Full modem simulation loopback — the headless equivalent of the
reference's lora_simulation.pth GUI topology (encoder -> mod -> AWGN +
phase rotate channel -> demod -> decoder, with live noise control and
error/power/SNR displays).

Type a message, watch it cross the simulated channel.  Live controls (the
topology's sliders/globals, /root/reference/examples/lora_simulation.pth):

    /noise X    AWGN amplitude (slider)
    /sf N       spreading factor 7-12 (global; recompiles on next TX)
    /cr 4/7     coding rate 4/4..4/8 (global)
    /sync 0x8e  sync word (global)
    /show       print the current configuration

Config changes re-jit the modem for the new static shape on the next
message (the GUI topology restarts its blocks on a global change the same
way); repeated messages at one config reuse the jit cache.

    JAX_PLATFORMS=cpu PYTHONPATH=. python examples/lora_simulation.py
"""

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from lora_tpu import api  # noqa: E402
from lora_tpu.config import LoRaConfig  # noqa: E402
from lora_tpu.parallel import aggregate_metrics  # noqa: E402

# lora_simulation.pth globals: SF10, MTU 20, sync 0x8e, CR 4/8, rotate pi/1.2345
SF, SYNC, CR, MTU_BYTES = 10, 0x8E, "4/8", 20
ROTATE = np.pi / 1.2345


def main() -> int:
    noise = 4.0
    sf, sync, cr = SF, SYNC, CR
    print(f"LoRa simulation: SF{sf} {cr} sync 0x{sync:02x}, noise={noise}")
    print("type text to transmit; /noise X, /sf N, /cr 4/7, /sync 0x8e,"
          " /show; Ctrl-D to exit")
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line.startswith("/"):
            try:
                cmd, *rest = line.split()
                if cmd == "/noise":
                    noise = float(rest[0])
                elif cmd == "/sf":
                    want = int(rest[0])
                    if not 7 <= want <= 12:
                        raise ValueError("sf must be 7..12")
                    sf = want
                elif cmd == "/cr":
                    want_cr = rest[0]
                    LoRaConfig(sf=sf, cr=want_cr)  # validate now, not at TX
                    cr = want_cr  # state mutates only on success
                elif cmd == "/sync":
                    sync = int(rest[0], 0) & 0xFF
                elif cmd != "/show":
                    print(f"[unknown command {cmd}]")
                    continue
            except (IndexError, ValueError) as e:
                print(f"[bad command: {e}]")
                continue
            print(f"[SF{sf} {cr} sync 0x{sync:02x} noise={noise}]")
            continue
        data = line.encode()[:MTU_BYTES]
        try:
            cfg = LoRaConfig(sf=sf, cr=cr, sync=sync, ampl=1.0)
        except ValueError as e:
            print(f"[invalid config: {e}]")
            continue
        cfg = cfg.replace(mtu=cfg.num_symbols(len(data)) + 4)
        payload = jnp.asarray(np.frombuffer(data, np.uint8)[None])
        dec, dem = api.loopback(
            payload, cfg, noise_amplitude=noise, phase=ROTATE
        )
        got = api.extract_payloads(dec)[0]
        m = aggregate_metrics(dem, statuses=dec.status)
        print(
            f"  rx: {got.decode(errors='replace') if got else '<dropped>'}"
            f"   snr={float(np.asarray(dem.snr).ravel()[0]):.1f} dB"
            f" power={float(np.asarray(dem.power).ravel()[0]):.1f} dB"
            f" cfo={int(np.asarray(dem.freq_error).ravel()[0])} bins"
            f" dropped={int(np.asarray(m['dropped']))}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
