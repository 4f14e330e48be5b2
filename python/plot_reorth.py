#!/usr/bin/env python3
"""Plot the reorthogonalization study (``experiments/reorth_study.py``
CSV schema; the selective columns are optional for older artifacts).

Two stacked log panels: the orthogonality defect max|VᵀV − I| (full and
selective reorth stay at/near working precision while the plain recurrence
collapses) and the relative f(A)b error vs analytic truth (stable in k
under either reorth mode, erratic past stagnation without). The selective
legend entry carries its cost story: total sweeps fired out of k.
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
    selective = "ortho_defect_selective" in df.columns
    if selective:
        sw = int(df["reorth_steps_selective"].iloc[-1])
        k_last = int(df["k"].iloc[-1])
        sel_label = f"reorth='selective' ({sw}/{k_last} sweeps)"
        ax_o.semilogy(df["k"], df["ortho_defect_selective"], marker="^",
                      markersize=4, linewidth=2, linestyle=":",
                      color="#00855f", label=sel_label)
    style_axes(ax_o, "", "Orthogonality defect max|VᵀV − I|",
               Path(csv_path).stem)
    ax_o.legend(frameon=False)

    ax_e.semilogy(df["k"], df["relative_error_plain"], marker="o",
                  markersize=4, linewidth=2,
                  color=VARIANT_COLORS["standard"], label="plain recurrence")
    ax_e.semilogy(df["k"], df["relative_error_reorth"], marker="s",
                  markersize=4, linewidth=2, linestyle="--",
                  color=VARIANT_COLORS["two-pass"], label="reorth=True (CGS2)")
    if selective:
        ax_e.semilogy(df["k"], df["relative_error_selective"], marker="^",
                      markersize=4, linewidth=2, linestyle=":",
                      color="#00855f", label="reorth='selective'")
    style_axes(ax_e, "Lanczos iterations k", "Relative f(A)b error", "")
    ax_e.legend(frameon=False)

    save(fig, out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
