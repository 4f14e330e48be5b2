#!/usr/bin/env python3
"""Plot memory/time vs problem size n (schema: variant,n,k,time_s,rss_kb).

Two single-axis PDFs: ``<out>_memory.pdf`` and ``<out>_time.pdf`` — the
reference's ``python/plot_scalability.py`` contract.

Usage: plot_scalability.py results/scalability_k500_rho3.csv [out_prefix]
"""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from plot_common import VARIANT_COLORS, VARIANT_LABELS, new_fig, save, style_axes


def main(csv_path: str, out_prefix: str | None = None) -> int:
    df = pd.read_csv(csv_path)
    out_prefix = out_prefix or str(Path(csv_path).with_suffix(""))
    k = int(df["k"].iloc[0])

    for metric, ylabel, suffix, scale in [
        ("rss_kb", "Peak memory (MB)", "memory", 1.0 / 1024),
        ("time_s", "Wall-clock time (s)", "time", 1.0),
    ]:
        fig, ax = new_fig()
        for variant, grp in df.groupby("variant"):
            grp = grp.sort_values("n")
            ax.plot(
                grp["n"],
                grp[metric] * scale,
                marker="o",
                markersize=4,
                linewidth=2,
                color=VARIANT_COLORS.get(variant, "#555"),
                label=VARIANT_LABELS.get(variant, variant),
            )
        style_axes(ax, "Problem dimension n", ylabel,
                   f"{'Memory' if metric == 'rss_kb' else 'Time'} vs n (k={k})")
        ax.legend(frameon=False)
        save(fig, f"{out_prefix}_{suffix}.pdf")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
