#!/usr/bin/env bash
# Reproduce the reference's published results/ CSVs with this framework.
#
# Accuracy + orthogonality run on CPU in f64 (reference precision,
# tex/report.tex:323); the tradeoff/scalability/dense timing experiments run
# on the default backend — the fused TPU path when a chip is attached.
#
# Usage: scripts/reproduce_results.sh [outdir]   (default: results/)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-results}
mkdir -p "$OUT"
RUN="python -m"

for fn in exp inv; do
  for sc in well ill; do
    $RUN two_pass_lanczos_tpu.experiments.stability \
      --function $fn --scenario ${sc}-conditioned --size 10000 \
      --k-min 10 --k-max 200 --k-step 10 --cpu-f64 \
      --output "$OUT/accuracy_${fn}_${sc}-conditioned.csv"
    # the reference publishes a 100-row (step-10) grid for inv/ill and a
    # 50-row (step-20) grid for the other three scenarios — match both
    if [ "$fn-$sc" = "inv-ill" ]; then OSTEP=10; else OSTEP=20; fi
    $RUN two_pass_lanczos_tpu.experiments.orthogonality \
      --function $fn --scenario ${sc}-conditioned --size 10000 \
      --k-min 20 --k-max 1000 --k-step $OSTEP --cpu-f64 \
      --output "$OUT/orthogonality_${fn}_${sc}-conditioned.csv"
  done
done

# second-seed inv/ill sweep (extended to k=300): pins the rounding-sensitive
# erratic-phase transition as seed-dependent (REPORT.md §1)
$RUN two_pass_lanczos_tpu.experiments.stability \
  --function inv --scenario ill-conditioned --size 10000 \
  --k-min 10 --k-max 300 --k-step 10 --seed 7 --cpu-f64 \
  --output "$OUT/accuracy_inv_ill-conditioned_seed7.csv"

# the definitive transition artifact: k-step 5 over [100, 300] for three
# seeds + the published median curve and plot (REPORT.md §1)
for s in 7 42 101; do
  $RUN two_pass_lanczos_tpu.experiments.stability \
    --function inv --scenario ill-conditioned --size 10000 \
    --k-min 100 --k-max 300 --k-step 5 --seed $s --cpu-f64 \
    --output "$OUT/accuracy_inv_ill_transition_seed${s}.csv"
done
python - "$OUT" <<'PYEOF'
import csv, sys
import numpy as np
out = sys.argv[1]
seeds = [7, 42, 101]
data = {}
for s in seeds:
    rows = list(csv.DictReader(open(f"{out}/accuracy_inv_ill_transition_seed{s}.csv")))
    data[s] = {int(r["k"]): (float(r["relative_error_standard"]),
                             float(r["relative_error_two_pass"])) for r in rows}
ks = sorted(data[seeds[0]])
with open(f"{out}/accuracy_inv_ill_transition_median.csv", "w", newline="") as fh:
    w = csv.writer(fh)
    w.writerow(["k", "median_relative_error_standard",
                "median_relative_error_two_pass"] + [f"std_seed{s}" for s in seeds])
    for k in ks:
        stds = [data[s][k][0] for s in seeds]
        tps = [data[s][k][1] for s in seeds]
        w.writerow([k, float(np.median(stds)), float(np.median(tps))] + stds)
PYEOF
python python/plot_transition.py "$OUT/accuracy_inv_ill_transition_median.csv" "$OUT/images"

# beyond-reference: plain vs fully-reorthogonalized one-pass in f32 (the
# dtype where the instability lives) + plot (REPORT.md §12)
$RUN two_pass_lanczos_tpu.experiments.reorth_study \
  --function inv --scenario ill-conditioned --size 500 \
  --k-min 20 --k-max 500 --k-step 20 \
  --output "$OUT/reorth_inv_ill-conditioned_f32.csv"
python python/plot_reorth.py "$OUT/reorth_inv_ill-conditioned_f32.csv" \
  "$OUT/images/reorth_inv_ill-conditioned_f32.pdf"

# beyond-reference: rigorous Gauss-Radau error certificate vs true error
# on the SPD scenario (REPORT.md §13)
$RUN two_pass_lanczos_tpu.experiments.certificate_study \
  --size 2000 --k 200 --stride 2 \
  --output "$OUT/error_certificate_inv_well-conditioned.csv"
python python/plot_certificate.py \
  "$OUT/error_certificate_inv_well-conditioned.csv" \
  "$OUT/images/error_certificate_inv_well-conditioned.pdf"

for arcs in 5000 50000 500000; do
  name=$(python -c "a=$arcs; print('5k' if a==5000 else '50k' if a==50000 else '500k')")
  $RUN two_pass_lanczos_tpu.experiments.tradeoff \
    --arcs $arcs --rho 3 --k-start 50 --k-end 1000 --k-step 50 \
    --isolate --repeats 5 \
    --output "$OUT/tradeoff_arcs${name}_rho3.csv"
done

# the reference's host-RSS memory story in its own semantics: with the
# CPU-f64 backend the Krylov basis lives in host memory, so isolated
# per-(variant,k) VmPeak orders exactly as the reference's artifact
$RUN two_pass_lanczos_tpu.experiments.tradeoff \
  --arcs 500000 --rho 3 --k-start 500 --k-end 1000 --k-step 500 \
  --isolate --repeats 3 --cpu-f64 \
  --output "$OUT/tradeoff_arcs500k_rho3_cpu_f64.csv"

# reference-class accuracy ON the accelerator via the double-float path:
# all four scenarios at the reference's FULL 20-row grid — the published
# artifacts' schema the integrity suite pins (a partial grid here would
# break tests/test_results_integrity.py::test_df_grid_matches_reference_grid)
bash scripts/run_df_accuracy_grid.sh "$OUT"

$RUN two_pass_lanczos_tpu.experiments.scalability \
  --arcs-start 50000 --arcs-end 500000 --arcs-step 50000 --rho 3 --k 500 \
  --isolate --repeats 5 \
  --output "$OUT/scalability_k500_rho3.csv"

$RUN two_pass_lanczos_tpu.experiments.dense_tradeoff \
  --size 10000 --k-start 100 --k-end 1000 --k-step 100 \
  --isolate --repeats 5 \
  --output "$OUT/dense_tradeoff.csv"

# on-chip capability validation artifact (REPORT §13; pinned by
# tests/test_results_integrity.py::test_capability_onchip_artifact)
python scripts/probe/capability_smoke.py --output "$OUT/capability_onchip.json"

# regenerate the standard figures from the fresh CSVs (the remaining
# figures — transition, reorth, certificate — were produced above)
mkdir -p "$OUT/images"
for fn in exp inv; do
  for sc in well ill; do
    python python/plot_stability.py "$OUT/accuracy_${fn}_${sc}-conditioned.csv" \
      "$OUT/images/accuracy_${fn}_${sc}-conditioned.pdf"
    python python/plot_orthogonality.py "$OUT/orthogonality_${fn}_${sc}-conditioned.csv" \
      "$OUT/images/orthogonality_${fn}_${sc}-conditioned.pdf"
  done
done
for name in 5k 50k 500k; do
  python python/plot_tradeoff.py "$OUT/tradeoff_arcs${name}_rho3.csv" \
    "$OUT/images/tradeoff_arcs${name}_rho3"
done
python python/plot_tradeoff.py "$OUT/tradeoff_arcs500k_rho3_cpu_f64.csv" \
  "$OUT/images/tradeoff_arcs500k_rho3_cpu_f64"
python python/plot_scalability.py "$OUT/scalability_k500_rho3.csv" \
  "$OUT/images/scalability_k500_rho3"
python python/plot_dense_tradeoff.py "$OUT/dense_tradeoff.csv" \
  "$OUT/images/dense_tradeoff.pdf"
python python/plot_df_accuracy.py "$OUT" "$OUT/images/accuracy_df_overlay.pdf"
python python/calculate_growth_rate.py "$OUT/scalability_k500_rho3.csv"

echo "all results written to $OUT/"
