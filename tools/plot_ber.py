"""Render docs/ber_sweep.json into the committed plot artifact
docs/ber_sweep.png (VERDICT r1 item 8): FER and per-bit BER vs SNR,
small multiples per coding rate, one line per spreading factor.

Usage: python tools/plot_ber.py [in.json] [out.png]
"""

from __future__ import annotations

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# categorical slots 1-6 (validated fixed order; identity = SF)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300"]
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "docs/ber_sweep.json"
    out = sys.argv[2] if len(sys.argv) > 2 else "docs/ber_sweep.png"
    rows = json.load(open(src))
    crs = sorted({r["cr"] for r in rows})
    sfs = sorted({r["sf"] for r in rows})
    color = {sf: SERIES[i % len(SERIES)] for i, sf in enumerate(sfs)}

    fig, axes = plt.subplots(
        2, len(crs), figsize=(3.1 * len(crs), 6.4), sharex=True,
        facecolor=SURFACE,
    )
    if len(crs) == 1:
        axes = axes.reshape(2, 1)
    for j, cr in enumerate(crs):
        for metric, i in (("fer", 0), ("ber", 1)):
            ax = axes[i, j]
            ax.set_facecolor(SURFACE)
            for sf in sfs:
                pts = [
                    (r["snr_db"], r.get(metric))
                    for r in rows
                    if r["cr"] == cr and r["sf"] == sf
                    and r.get(metric) is not None
                ]
                if not pts:
                    continue
                pts.sort()
                xs = [p[0] for p in pts]
                # log-scale floor: plot exact zeros at the measurement floor
                floor = 1e-4 if metric == "fer" else 1e-6
                ys = [max(p[1], floor) for p in pts]
                ax.semilogy(
                    xs, ys, "-o", color=color[sf], linewidth=2,
                    markersize=4, label=f"SF{sf}",
                )
            ax.set_title(
        f"CR {cr}" if i == 0 else "", color=TEXT, fontsize=11
            )
            ax.grid(True, which="major", color=GRID, linewidth=0.6)
            ax.tick_params(colors=TEXT2, labelsize=8)
            for s in ax.spines.values():
                s.set_color(GRID)
            if j == 0:
                ax.set_ylabel(
                    "frame error rate" if metric == "fer"
                    else "bit error rate (synced)",
                    color=TEXT, fontsize=9,
                )
            if i == 1:
                ax.set_xlabel("SNR (dB)", color=TEXT2, fontsize=9)
    handles, labels = axes[0, 0].get_legend_handles_labels()
    fig.legend(
        handles, labels, loc="upper center", ncol=len(sfs), frameon=False,
        bbox_to_anchor=(0.5, 1.0), fontsize=9, labelcolor=TEXT,
    )
    fig.suptitle(
        "LoRa PHY error rates vs SNR (AWGN loopback)",
        color=TEXT, fontsize=12, y=1.04,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    fig.savefig(out, dpi=150, bbox_inches="tight", facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
