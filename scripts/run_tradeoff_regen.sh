#!/usr/bin/env bash
# Regenerate the published tradeoff artifacts on the real TPU with
# per-(variant,k) process isolation (single-configuration VmPeak) and
# median-of-5 timing (VERDICT r3 items 6 + 8). Strictly sequential TPU
# workers; the persistent compilation cache keeps the 40-worker sweeps
# from re-paying the Mosaic compile per process.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=${1:-results}
for arcs in 5000 50000 500000; do
  case $arcs in
    5000) name=5k;; 50000) name=50k;; *) name=500k;;
  esac
  echo "=== tradeoff arcs=$arcs (isolated, repeats=5) ==="
  PYTHONPATH=$PWD:${PYTHONPATH:-} python -m two_pass_lanczos_tpu.experiments.tradeoff \
    --arcs "$arcs" --rho 3 --k-start 50 --k-end 1000 --k-step 50 \
    --isolate --repeats 5 \
    --output "$OUT/tradeoff_arcs${name}_rho3.csv"
done
echo "tradeoff regeneration complete"
