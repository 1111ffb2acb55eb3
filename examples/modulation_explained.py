"""The LoRa PHY math, step by step — this framework's equivalent of the
reference's examples/modulation_explained_plots.py (an independent NumPy
model of modulate / dechirp / FFT-argmax used as a cross-check).

Run headless to print each stage; add --plot for matplotlib figures.

    PYTHONPATH=. python examples/modulation_explained.py [--plot]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def numpy_modulate(symbols, N):
    """Pure-NumPy CSS modulation: symbol s = upchirp cyclically shifted by
    s bins; instantaneous frequency sweeps one full bandwidth per symbol.
    The frequency steps *before* each sample is integrated — the reference
    generator's (i+1)*fStep convention (ChirpGenerator.hpp:36)."""
    out = []
    phase = 0.0
    for s in symbols:
        f = ((s + 1 + np.arange(N)) % N) / N - 0.5  # cycles/sample
        phase = phase + 2 * np.pi * np.cumsum(f)
        out.append(np.exp(1j * phase))
        phase = phase[-1]
    return np.concatenate(out)


def numpy_demodulate(x, N):
    """Dechirp by the conjugate base chirp, FFT, argmax."""
    f0 = ((1 + np.arange(N)) % N) / N - 0.5
    down = np.exp(-2j * np.pi * np.cumsum(f0))
    syms = []
    for i in range(len(x) // N):
        spec = np.fft.fft(x[i * N : (i + 1) * N] * down)
        syms.append(int(np.argmax(np.abs(spec))))
    return syms


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--sf", type=int, default=8)
    args = ap.parse_args()
    N = 1 << args.sf

    symbols = [0, 37, 200, N - 1]
    print(f"1. modulate symbols {symbols} at SF{args.sf} (N={N} chips)")
    x = numpy_modulate(symbols, N)
    print(f"   -> {x.size} complex samples, |x|=1 (constant envelope)")

    print("2. dechirp x conj(base upchirp): each symbol becomes a pure tone")
    got = numpy_demodulate(x, N)
    print(f"3. FFT argmax per window -> {got}")
    assert got == symbols, "numpy model must round-trip"

    # cross-check the framework against the independent model
    from lora_tpu.ops import cplx, detect

    win = cplx.from_complex(np.stack([x[i * N : (i + 1) * N] for i in range(4)]))
    res = detect.dechirp_detect(win)
    print(f"4. lora_tpu detector on the numpy waveform -> {list(np.asarray(res.value))}")
    assert list(np.asarray(res.value)) == symbols

    if args.plot:
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(3, 1, figsize=(10, 8))
        axes[0].plot(x.real[: 2 * N])
        axes[0].set_title("baseband (real), two symbols")
        inst_f = np.angle(x[1:] * np.conj(x[:-1])) / (2 * np.pi)
        axes[1].plot(inst_f)
        axes[1].set_title("instantaneous frequency: shifted sawtooth per symbol")
        f0 = (np.arange(N) % N) / N - 0.5
        down = np.exp(-2j * np.pi * np.cumsum(f0))
        spec = np.abs(np.fft.fft(x[N : 2 * N] * down))
        axes[2].plot(spec)
        axes[2].set_title(f"dechirped FFT: peak at bin {np.argmax(spec)}")
        fig.tight_layout()
        fig.savefig("modulation_explained.png", dpi=120)
        print("wrote modulation_explained.png")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
