#!/usr/bin/env python3
"""Plot the dense (compute-bound) trade-off CSV (schema: variant,k,time_s,rss_kb).

Single time plot with the two-pass/one-pass time ratio annotated — the
compute-bound regime should show ≈ 2× (two passes = twice the matvecs,
reference ``tex/report.tex:419``).

Usage: plot_dense_tradeoff.py results/dense_tradeoff.csv [out.pdf]
"""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from plot_common import VARIANT_COLORS, VARIANT_LABELS, new_fig, save, style_axes


def main(csv_path: str, out_path: str | None = None) -> int:
    df = pd.read_csv(csv_path)
    out_path = out_path or str(Path(csv_path).with_suffix(".pdf"))

    fig, ax = new_fig()
    for variant, grp in df.groupby("variant"):
        grp = grp.sort_values("k")
        ax.plot(grp["k"], grp["time_s"], marker="o", markersize=4, linewidth=2,
                color=VARIANT_COLORS.get(variant, "#555"),
                label=VARIANT_LABELS.get(variant, variant))
    style_axes(ax, "Lanczos iterations k", "Wall-clock time (s)",
               "Dense compute-bound trade-off")

    merged = df.pivot_table(index="k", columns="variant", values="time_s")
    if {"standard", "two-pass"} <= set(merged.columns):
        ratio = (merged["two-pass"] / merged["standard"]).mean()
        ax.annotate(f"mean two-pass/one-pass time ratio: {ratio:.2f}x",
                    xy=(0.02, 0.96), xycoords="axes fraction", va="top",
                    fontsize=9, color="#444444")
    ax.legend(frameon=False)
    save(fig, out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
