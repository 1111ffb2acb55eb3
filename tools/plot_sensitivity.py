"""Render docs/sensitivity_vs_reference.json into
docs/sensitivity_vs_reference.png: paired FER curves (this framework vs
the compiled reference LoRaDemod FSM on identical noisy banks), one panel
per spreading factor, one hue per coding rate (ours solid, reference
dashed; the soft-decision curve is drawn for the headline CR 4/8).
Channel-rotation rows (the pi/1.2345 impairment) live in the JSON and are
summarized in the figure caption rather than plotted as extra curves.

Usage: python tools/plot_sensitivity.py [in.json] [out.png]
"""

from __future__ import annotations

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

CR_COLORS = {"4/8": "#2a78d6", "4/7": "#8a52d6", "4/5": "#b8860b"}
SOFT = "#1baf7a"
REF_DASH = (0, (4, 2))
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "docs/sensitivity_vs_reference.json"
    out = sys.argv[2] if len(sys.argv) > 2 else "docs/sensitivity_vs_reference.png"
    rows = json.load(open(src))
    clean = [r for r in rows if not r.get("rotate")]
    rot = [r for r in rows if r.get("rotate")]
    sfs = sorted({r["sf"] for r in clean})
    fig, axes = plt.subplots(
        1, len(sfs), figsize=(4.2 * len(sfs), 3.6), sharey=True,
        facecolor=SURFACE,
    )
    if len(sfs) == 1:
        axes = [axes]
    for ax, sf in zip(axes, sfs):
        crs = sorted({r["cr"] for r in clean if r["sf"] == sf})
        for cr in crs:
            pts = sorted(
                (r for r in clean if r["sf"] == sf and r["cr"] == cr),
                key=lambda r: r["snr_db"],
            )
            x = [r["snr_db"] for r in pts]
            c = CR_COLORS.get(cr, "#555555")
            ax.plot(x, [r["fer_ours"] for r in pts], "o-", color=c,
                    label=f"lora_tpu {cr}", linewidth=1.8, markersize=4)
            ax.plot(x, [r["fer_ref"] for r in pts], "s", color=c,
                    linestyle=REF_DASH, label=f"reference {cr}",
                    linewidth=1.4, markersize=4, alpha=0.8)
            if cr == "4/8" and all("fer_soft" in r for r in pts):
                ax.plot(x, [r["fer_soft"] for r in pts], "d-", color=SOFT,
                        label="lora_tpu soft 4/8", linewidth=1.8,
                        markersize=4)
        ax.set_facecolor(SURFACE)
        ax.set_title(f"SF{sf}", color=TEXT, fontsize=10)
        ax.set_xlabel("pre-despread SNR (dB)", color=TEXT2, fontsize=9)
        ax.grid(color=GRID, linewidth=0.7)
        ax.tick_params(colors=TEXT2, labelsize=8)
        for s in ax.spines.values():
            s.set_color(GRID)
    axes[0].set_ylabel("frame error rate", color=TEXT2, fontsize=9)
    axes[0].legend(frameon=False, fontsize=7, labelcolor=TEXT)
    n_better = sum(
        1 for r in rot if r["recovered_ours"] > r["recovered_ref"]
    )
    cap = (
        "RX sensitivity, paired on identical noisy banks "
        "(tools/bench_sensitivity.py); "
        f"rotation rows (pi/1.2345): {len(rot)} points, "
        f"{n_better} better / "
        f"{sum(1 for r in rot if r['recovered_ours'] < r['recovered_ref'])}"
        " worse (see JSON)"
    )
    fig.suptitle(cap, color=TEXT, fontsize=10)
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    fig.savefig(out, dpi=150, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
