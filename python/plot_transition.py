"""Plot the inv/ill-conditioned convergence transition (multi-seed).

Input: results/accuracy_inv_ill_transition_median.csv (built by the
fine-step k ∈ [100, 300] stability sweeps over seeds {7, 42, 101} — see
REPORT.md §"the inv/ill transition"). Output: one PDF showing the three
per-seed standard-variant error curves (thin), their median (heavy), and
the reference's published k=200 value — demonstrating that the headline
CSV's k=200 reading is a seed-dependent phase shift of the erratic
transition, not an accuracy gap.

Usage: python python/plot_transition.py [csv] [outdir]
"""

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))  # plot_common
from plot_common import VARIANT_COLORS, new_fig, save, style_axes  # noqa: E402

REFERENCE_K200 = 6.57e-6  # reference results/accuracy_inv_ill-conditioned.csv


def create_plot(csv_path: Path, outdir: Path) -> None:
    with open(csv_path) as fh:
        rows = list(csv.DictReader(fh))
    ks = [int(r["k"]) for r in rows]
    seed_cols = [c for c in rows[0] if c.startswith("std_seed")]
    fig, ax = new_fig()
    for col in seed_cols:
        ax.semilogy(ks, [float(r[col]) for r in rows], linewidth=0.9,
                    alpha=0.55, color=VARIANT_COLORS["standard"],
                    label=f"seed {col.removeprefix('std_seed')}")
    # neutral dark for the aggregate: the per-variant colors are reserved
    # for the variant entities across all figures (plot_common contract),
    # and every curve here is the STANDARD variant
    ax.semilogy(ks, [float(r["median_relative_error_standard"]) for r in rows],
                linewidth=2.2, color="#333333",
                label="median of 3 seeds")
    ax.plot([200], [REFERENCE_K200], marker="o", markersize=7,
            color="black", linestyle="none",
            label=f"reference @ k=200 ({REFERENCE_K200:.2e})")
    style_axes(ax, "Krylov dimension k", "relative error vs analytic truth",
               "inv / ill-conditioned: the erratic-phase transition "
               "(n=10,000, f64)")
    ax.legend(frameon=False, fontsize=9)
    save(fig, outdir / "transition_inv_ill-conditioned.pdf")


if __name__ == "__main__":
    csv_path = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "results/accuracy_inv_ill_transition_median.csv")
    outdir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("results/images")
    outdir.mkdir(parents=True, exist_ok=True)
    create_plot(csv_path, outdir)
