#!/usr/bin/env bash
# Full on-chip double-float accuracy grid (VERDICT r3 item 3): all four
# reference stability scenarios at the reference's 20-row k grid, run
# through the df path on the real TPU. Strictly sequential — two TPU
# client processes deadlock the tunnel.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-results}
for fn in inv exp; do
  for sc in well ill; do
    echo "=== $fn / $sc-conditioned (df, on-chip) ==="
    PYTHONPATH=$PWD:${PYTHONPATH:-} python -m two_pass_lanczos_tpu.experiments.stability \
      --function "$fn" --scenario "$sc-conditioned" --size 10000 \
      --k-min 10 --k-max 200 --k-step 10 --precision df \
      --output "$OUT/accuracy_${fn}_${sc}-conditioned_tpu_df.csv"
  done
done
echo "df accuracy grid complete"
