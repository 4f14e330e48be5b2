#!/usr/bin/env python3
"""Plot the memory/time vs k trade-off CSVs (schema: variant,k,time_s,rss_kb).

Produces two single-axis PDFs — ``<out>_memory.pdf`` (peak memory MB vs k)
and ``<out>_time.pdf`` (wall-clock s vs k) — the same figure pair as the
reference's ``python/plot_tradeoff.py`` contract.

Usage: plot_tradeoff.py results/tradeoff_arcs500k_rho3.csv [out_prefix]
"""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from plot_common import VARIANT_COLORS, VARIANT_LABELS, new_fig, save, style_axes


def main(csv_path: str, out_prefix: str | None = None) -> int:
    df = pd.read_csv(csv_path)
    out_prefix = out_prefix or str(Path(csv_path).with_suffix(""))

    panels = [
        ("rss_kb", "Peak host memory (MB)", "memory", 1.0 / 1024),
        ("time_s", "Wall-clock time (s)", "time", 1.0),
    ]
    if "device_peak_kb" in df.columns and df["device_peak_kb"].max() > 0:
        # on accelerators the O(nk)/O(n) story lives on the device side
        # (rss_kb is host staging, variant-independent there)
        panels.append(("device_peak_kb", "Peak device memory (MB)",
                       "memory_device", 1.0 / 1024))
    for metric, ylabel, suffix, scale in panels:
        fig, ax = new_fig()
        for variant, grp in df.groupby("variant"):
            grp = grp.sort_values("k")
            ax.plot(
                grp["k"],
                grp[metric] * scale,
                marker="o",
                markersize=4,
                linewidth=2,
                color=VARIANT_COLORS.get(variant, "#555"),
                label=VARIANT_LABELS.get(variant, variant),
            )
        style_axes(ax, "Lanczos iterations k", ylabel,
                   f"{'Memory' if metric == 'rss_kb' else 'Time'} vs k — {Path(csv_path).stem}")
        ax.legend(frameon=False)
        save(fig, f"{out_prefix}_{suffix}.pdf")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
