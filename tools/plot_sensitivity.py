"""Render docs/sensitivity_vs_reference.json into
docs/sensitivity_vs_reference.png: paired FER curves (this framework vs
the compiled reference LoRaDemod FSM on identical noisy banks), one panel
per spreading factor.

Usage: python tools/plot_sensitivity.py [in.json] [out.png]
"""

from __future__ import annotations

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OURS = "#2a78d6"
REF = "#eb6834"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "docs/sensitivity_vs_reference.json"
    out = sys.argv[2] if len(sys.argv) > 2 else "docs/sensitivity_vs_reference.png"
    rows = json.load(open(src))
    sfs = sorted({r["sf"] for r in rows})
    fig, axes = plt.subplots(
        1, len(sfs), figsize=(4.2 * len(sfs), 3.4), sharey=True,
        facecolor=SURFACE,
    )
    if len(sfs) == 1:
        axes = [axes]
    for ax, sf in zip(axes, sfs):
        pts = sorted((r for r in rows if r["sf"] == sf),
                     key=lambda r: r["snr_db"])
        x = [r["snr_db"] for r in pts]
        ax.plot(x, [r["fer_ours"] for r in pts], "o-", color=OURS,
                label="lora_tpu", linewidth=1.8, markersize=4)
        ax.plot(x, [r["fer_ref"] for r in pts], "s--", color=REF,
                label="reference FSM", linewidth=1.6, markersize=4)
        if all("fer_soft" in r for r in pts):
            ax.plot(x, [r["fer_soft"] for r in pts], "d-", color="#1baf7a",
                    label="lora_tpu soft-decision", linewidth=1.8,
                    markersize=4)
        ax.set_facecolor(SURFACE)
        ax.set_title(f"SF{sf} · {pts[0]['cr']} · n={pts[0]['n']}/point",
                     color=TEXT, fontsize=10)
        ax.set_xlabel("pre-despread SNR (dB)", color=TEXT2, fontsize=9)
        ax.grid(color=GRID, linewidth=0.7)
        ax.tick_params(colors=TEXT2, labelsize=8)
        for s in ax.spines.values():
            s.set_color(GRID)
    axes[0].set_ylabel("frame error rate", color=TEXT2, fontsize=9)
    axes[0].legend(frameon=False, fontsize=8, labelcolor=TEXT)
    fig.suptitle(
        "RX sensitivity, paired on identical noisy banks "
        "(tools/bench_sensitivity.py)",
        color=TEXT, fontsize=11,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    fig.savefig(out, dpi=150, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
