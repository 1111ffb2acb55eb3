"""Full modem simulation loopback — the headless equivalent of the
reference's lora_simulation.pth GUI topology (encoder -> mod -> AWGN +
phase rotate channel -> demod -> decoder, with live noise control and
error/power/SNR displays).

Type a message, watch it cross the simulated channel; `/noise X` changes
the noise amplitude on the fly (the topology's slider).

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
    print(f"LoRa simulation: SF{SF} {CR} sync 0x{SYNC:02x}, noise={noise}")
    print("type text to transmit, '/noise X' to set noise, Ctrl-D to exit")
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line.startswith("/noise"):
            noise = float(line.split()[1])
            print(f"[noise amplitude = {noise}]")
            continue
        data = line.encode()[:MTU_BYTES]
        cfg = LoRaConfig(sf=SF, cr=CR, sync=SYNC, ampl=1.0)
        cfg = cfg.replace(mtu=cfg.num_symbols(len(data)) + 4)
        payload = jnp.asarray(np.frombuffer(data, np.uint8)[None])
        dec, dem = api.loopback(
            payload, cfg, noise_amplitude=noise, phase=ROTATE
        )
        got = api.extract_payloads(dec)[0]
        m = aggregate_metrics(dem, statuses=dec.status)
        print(
            f"  rx: {got.decode(errors='replace') if got else '<dropped>'}"
            f"   snr={float(np.asarray(dem.snr)):.1f} dB"
            f" power={float(np.asarray(dem.power)):.1f} dB"
            f" cfo={int(np.asarray(dem.freq_error))} bins"
            f" dropped={int(np.asarray(m['dropped']))}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
