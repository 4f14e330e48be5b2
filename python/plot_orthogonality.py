#!/usr/bin/env python3
"""Plot orthogonality-loss curves (schema:
k,ortho_loss_standard,ortho_loss_regenerated,basis_drift_fro,solution_deviation_l2).

Single-axis log plot of ‖I − VᴴV‖ for the stored and regenerated bases, with
the basis drift annotated (exactly 0.0 under the exact-replay design) — the
reference's ``python/plot_orthogonality.py`` contract.

Usage: plot_orthogonality.py results/orthogonality_inv_ill-conditioned.csv [out.pdf]
"""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from plot_common import VARIANT_COLORS, new_fig, save, style_axes


def main(csv_path: str, out_path: str | None = None) -> int:
    df = pd.read_csv(csv_path).sort_values("k")
    out_path = out_path or str(Path(csv_path).with_suffix(".pdf"))

    fig, ax = new_fig()
    ax.semilogy(df["k"], df["ortho_loss_standard"], marker="o", markersize=4,
                linewidth=2, color=VARIANT_COLORS["standard"],
                label="Stored basis ‖I − VᵀV‖")
    ax.semilogy(df["k"], df["ortho_loss_regenerated"], marker="s", markersize=4,
                linewidth=2, linestyle="--", color=VARIANT_COLORS["two-pass"],
                label="Regenerated basis ‖I − V′ᵀV′‖")
    style_axes(ax, "Lanczos iterations k", "Orthogonality loss (Frobenius)",
               Path(csv_path).stem)
    max_drift = float(df["basis_drift_fro"].max())
    ax.annotate(
        f"max basis drift ‖V − V′‖_F = {max_drift:g}",
        xy=(0.02, 0.96), xycoords="axes fraction", va="top", fontsize=9,
        color="#444444",
    )
    ax.legend(frameon=False)
    save(fig, out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
