#!/usr/bin/env python3
"""Memory-growth-rate analysis of a scalability CSV.

Linear regression of the (standard − two-pass) peak-memory difference against
the problem dimension n, reported as MB per 1000 n — validating the basis
storage model ``k · bytes_per_element`` per unit n (the reference measured
4008 B/n against the theoretical k·8 = 4000 B/n at k=500 in f64;
``tex/report.tex:464``).

Column selection: the difference is only physical in the column where the
Krylov basis actually lives. On the CPU-f64 backend that is host VmPeak
(``rss_kb``, the reference's own semantics). On an accelerator the basis is
an HBM slab and host RSS is variant-independent, so the regression runs on
``device_peak_kb`` when that column is present and actually separates the
variants — there the theoretical slope is k·4 B/n (f32).

Usage: calculate_growth_rate.py results/scalability_k500_rho3.csv
"""

import sys

import pandas as pd
from scipy import stats


def pick_column(df: pd.DataFrame) -> str:
    """The column where the O(nk) basis is physical: ``device_peak_kb``
    when present and variant-separating (accelerator artifact), else
    ``rss_kb`` (host/CPU artifact, the reference's semantics)."""
    if "device_peak_kb" in df.columns:
        piv = df.pivot_table(index="n", columns="variant",
                             values="device_peak_kb")
        if (piv.get("standard") is not None
                and (piv["standard"] > 2 * piv["two-pass"]).any()):
            return "device_peak_kb"
    return "rss_kb"


def main(csv_path: str) -> int:
    df = pd.read_csv(csv_path)
    k = int(df["k"].iloc[0])
    col = pick_column(df)
    piv = df.pivot_table(index="n", columns="variant", values=col)
    if not {"standard", "two-pass"} <= set(piv.columns):
        print("need both variants in the CSV", file=sys.stderr)
        return 1
    diff_kb = piv["standard"] - piv["two-pass"]
    n = piv.index.to_numpy(dtype=float)

    res = stats.linregress(n, diff_kb.to_numpy(dtype=float))
    bytes_per_n = res.slope * 1024.0
    mb_per_1000n = res.slope * 1000.0 / 1024.0
    print(f"k = {k}, column = {col}")
    print(f"slope: {mb_per_1000n:.3f} MB per 1000 n  ({bytes_per_n:.1f} B per unit n)")
    print(f"theoretical basis model: k*8 = {k * 8} B/n (f64) or k*4 = {k * 4} B/n (f32)")
    print(f"r^2 = {res.rvalue ** 2:.4f}, intercept = {res.intercept / 1024.0:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
