"""Measure the streaming KKT matvec against its HBM speed-of-light bound.

This records the BASELINE.md per-chip metric ("SpMV >= 70% of
speed-of-light HBM bandwidth"): the dual-sorted streaming matvec
(``ops/kkt_fused.kkt_streaming_matvec``) reads the arc data from HBM once
per matvec, so the HBM byte model applies to it exactly (the fully
VMEM-resident fused path retires the metric — see PERF.md).

Methodology (the tunneled chip has ~25-30 ms dispatch RTT and +-30% noise):

* matvecs are CHAINED inside one jit: ``x <- (s*A) x`` with the static
  ``e_scale`` folded into the kernel constants and ``d`` pre-scaled on the
  host, so the iteration is norm-bounded (Gershgorin: rho(s*A) <= 1) at
  byte-for-byte identical cost to ``A x``;
* per-matvec time = (min-of-reps T(hi) - min-of-reps T(lo)) / (hi - lo),
  which cancels dispatch, readback and loop overhead;
* every sample forces a scalar readback of the result (block_until_ready
  is unreliable through the tunnel).

Usage::

    python scripts/sol_bench.py --arcs 500000 5000000 --reps 5

Prints one JSON line per instance size and a summary against the >=70%
target.
"""

import argparse
import json
import sys

from two_pass_lanczos_tpu.utils.sol_bench import measure_streaming_matvec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arcs", type=int, nargs="+", default=[500_000, 5_000_000])
    ap.add_argument("--rho", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--lo", type=int, default=64)
    ap.add_argument("--hi", type=int, default=None)
    ap.add_argument("--windowed", action="store_true")
    args = ap.parse_args()

    from two_pass_lanczos_tpu.ops.kkt_fused import LANE  # noqa: F401 (import check)

    results = []
    for arcs in args.arcs:
        per, sol_layout, sol_ideal, meta = measure_streaming_matvec(
            arcs, rho=args.rho, reps=args.reps, lo=args.lo, hi=args.hi,
            windowed=args.windowed)
        rec = {
            "metric": f"streaming_kkt_matvec_arcs{arcs}_rho{args.rho}",
            "seconds_per_matvec": round(per, 7),
            "gnnz_per_s": round(sol_layout.achieved_nnz_per_s / 1e9, 3),
            "layout_bytes_per_matvec": sol_layout.bytes_per_matvec,
            "ideal_bytes_per_matvec": sol_ideal.bytes_per_matvec,
            "sol_fraction_layout": round(sol_layout.sol_fraction, 4),
            "sol_fraction_ideal": round(sol_ideal.sol_fraction, 4),
            "effective_gb_per_s": round(
                sol_layout.bytes_per_matvec / per / 1e9, 1),
            "pad_ratio": round(meta["pad_ratio"], 3),
            "windowed": args.windowed,
            "timing": {k: round(v, 5) if isinstance(v, float) else v
                       for k, v in meta.items() if k != "pad_ratio"},
        }
        results.append(rec)
        print(json.dumps(rec))

    best = max(r["sol_fraction_layout"] for r in results)
    print(json.dumps({
        "summary": "BASELINE.md per-chip SpMV SoL target >= 0.70",
        "best_sol_fraction_layout": best,
        "target_met": best >= 0.70,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
