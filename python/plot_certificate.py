#!/usr/bin/env python3
"""Plot the error-certificate study (``experiments/certificate_study.py``).

One log panel: the rigorous Gauss–Radau bracket (shaded band between the
lower and upper bounds) enclosing the TRUE per-step A-norm error of the
f = inv solve, with the lagged-update *estimate* overlaid — the point of
the figure is that the true error never leaves the band, while the
estimate can dip below it. Beyond the reference — it ships no error
estimator at all.

Usage: plot_certificate.py results/error_certificate_inv_well-conditioned.csv [out.pdf]
"""

import sys
from pathlib import Path

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from plot_common import VARIANT_COLORS, save, style_axes


def main(csv_path: str, out_path: str | None = None) -> int:
    df = pd.read_csv(csv_path).sort_values("j")
    out_path = out_path or str(Path(csv_path).with_suffix(".pdf"))

    fig, ax = plt.subplots(figsize=(6.4, 4.2), constrained_layout=True)
    ax.fill_between(df["j"], df["lower_bound"], df["upper_bound"],
                    alpha=0.25, color=VARIANT_COLORS["two-pass"],
                    label="Gauss–Radau bracket (rigorous)")
    ax.semilogy(df["j"], df["true_error_a_norm"], linewidth=2,
                color=VARIANT_COLORS["standard"], label="true ‖x − x_j‖_A")
    est = df["lagged_update_estimate"].replace(np.inf, np.nan)
    ax.semilogy(df["j"], est, linewidth=1.5, linestyle=":",
                color="#00855f", label="lagged-update estimate")
    style_axes(ax, "Lanczos iterations j", "A-norm error",
               Path(csv_path).stem)
    ax.legend(frameon=False)
    save(fig, out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
