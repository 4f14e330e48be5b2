#!/usr/bin/env python3
"""Plot the reorthogonalization study (schema:
k,relative_error_plain,relative_error_reorth,ortho_defect_plain,ortho_defect_reorth).

Two stacked log panels from one ``experiments/reorth_study.py`` CSV: the
orthogonality defect max|VᵀV − I| (reorth stays at working precision while
the plain recurrence collapses) and the relative f(A)b error vs analytic
truth (stable in k under reorth, erratic past stagnation without it).
Beyond the reference — it has no reorthogonalization to plot.

Usage: plot_reorth.py results/reorth_inv_ill-conditioned_f32.csv [out.pdf]
"""

import sys
from pathlib import Path

import matplotlib.pyplot as plt
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from plot_common import VARIANT_COLORS, save, style_axes


def main(csv_path: str, out_path: str | None = None) -> int:
    df = pd.read_csv(csv_path).sort_values("k")
    out_path = out_path or str(Path(csv_path).with_suffix(".pdf"))

    fig, (ax_o, ax_e) = plt.subplots(
        2, 1, figsize=(6.4, 6.4), sharex=True, constrained_layout=True)

    ax_o.semilogy(df["k"], df["ortho_defect_plain"], marker="o", markersize=4,
                  linewidth=2, color=VARIANT_COLORS["standard"],
                  label="plain recurrence")
    ax_o.semilogy(df["k"], df["ortho_defect_reorth"], marker="s", markersize=4,
                  linewidth=2, linestyle="--",
                  color=VARIANT_COLORS["two-pass"], label="reorth=True (CGS2)")
    style_axes(ax_o, "", "Orthogonality defect max|VᵀV − I|",
               Path(csv_path).stem)
    ax_o.legend(frameon=False)

    ax_e.semilogy(df["k"], df["relative_error_plain"], marker="o",
                  markersize=4, linewidth=2,
                  color=VARIANT_COLORS["standard"], label="plain recurrence")
    ax_e.semilogy(df["k"], df["relative_error_reorth"], marker="s",
                  markersize=4, linewidth=2, linestyle="--",
                  color=VARIANT_COLORS["two-pass"], label="reorth=True (CGS2)")
    style_axes(ax_e, "Lanczos iterations k", "Relative f(A)b error", "")
    ax_e.legend(frameon=False)

    save(fig, out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
