#!/usr/bin/env python3
"""Plot accuracy vs k (schema:
k,relative_error_standard,relative_error_two_pass,relative_solution_deviation).

Two-panel figure (one y-axis each): relative error of both variants on a log
scale, and the cross-variant solution deviation — the reference's
``python/plot_stability.py`` contract.

Usage: plot_stability.py results/accuracy_exp_well-conditioned.csv [out.pdf]
"""

import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from plot_common import VARIANT_COLORS, VARIANT_LABELS, style_axes


def main(csv_path: str, out_path: str | None = None) -> int:
    df = pd.read_csv(csv_path).sort_values("k")
    out_path = out_path or str(Path(csv_path).with_suffix(".pdf"))

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7.0, 7.5), constrained_layout=True)

    ax1.semilogy(df["k"], df["relative_error_standard"], marker="o", markersize=4,
                 linewidth=2, color=VARIANT_COLORS["standard"],
                 label=VARIANT_LABELS["standard"])
    ax1.semilogy(df["k"], df["relative_error_two_pass"], marker="s", markersize=4,
                 linewidth=2, linestyle="--", color=VARIANT_COLORS["two-pass"],
                 label=VARIANT_LABELS["two-pass"])
    style_axes(ax1, "Lanczos iterations k", "Relative error vs analytic truth",
               Path(csv_path).stem)
    ax1.legend(frameon=False)

    dev = np.maximum(df["relative_solution_deviation"], 1e-18)  # log-plot floor
    ax2.semilogy(df["k"], dev, marker="o", markersize=4, linewidth=2,
                 color="#555555")
    style_axes(ax2, "Lanczos iterations k",
               "Relative deviation one-pass vs two-pass", "")

    fig.savefig(out_path)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
