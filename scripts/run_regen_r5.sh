#!/usr/bin/env bash
# Round-5 regeneration of every published reference-schema artifact, on the
# real TPU chip, with per-(variant,k) process isolation and median-of-5
# timing (VERDICT r4 item 1). Workers are strictly sequential (the tunneled
# chip deadlocks concurrent clients); the persistent compilation cache keeps
# re-runs from re-paying Mosaic compiles.
#
# Additionally regenerates a CPU-f64 500k tradeoff artifact at k ∈
# {500, 1000}: on an accelerator the Krylov basis lives in HBM so host
# VmPeak cannot carry the O(nk) story (measured: standard 1,295,396 KB vs
# two-pass 1,299,616 KB at k=1000 — equal within noise, device_peak_kb
# 2,390,378 vs 16,878 = 141x); the CPU-f64 run puts the basis in host
# memory, where the reference's rss_kb ordering is physical.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
export PYTHONPATH=$PWD:${PYTHONPATH:-}
OUT=${1:-results}

for arcs in 5000 50000 500000; do
  case $arcs in
    5000) name=5k;; 50000) name=50k;; *) name=500k;;
  esac
  echo "=== [$(date +%H:%M:%S)] tradeoff arcs=$arcs (on-chip, isolated, repeats=5) ==="
  python -m two_pass_lanczos_tpu.experiments.tradeoff \
    --arcs "$arcs" --rho 3 --k-start 50 --k-end 1000 --k-step 50 \
    --isolate --repeats 5 \
    --output "$OUT/tradeoff_arcs${name}_rho3.csv"
done

echo "=== [$(date +%H:%M:%S)] scalability k=500 (on-chip, isolated, repeats=5) ==="
python -m two_pass_lanczos_tpu.experiments.scalability \
  --arcs-start 50000 --arcs-end 500000 --arcs-step 50000 --rho 3 --k 500 \
  --isolate --repeats 5 \
  --output "$OUT/scalability_k500_rho3.csv"

echo "=== [$(date +%H:%M:%S)] dense_tradeoff n=10000 (on-chip, isolated, repeats=5) ==="
python -m two_pass_lanczos_tpu.experiments.dense_tradeoff \
  --size 10000 --k-start 100 --k-end 1000 --k-step 100 \
  --isolate --repeats 5 \
  --output "$OUT/dense_tradeoff.csv"

echo "=== [$(date +%H:%M:%S)] tradeoff 500k CPU-f64 (host-RSS memory story) ==="
python -m two_pass_lanczos_tpu.experiments.tradeoff \
  --arcs 500000 --rho 3 --k-start 500 --k-end 1000 --k-step 500 \
  --isolate --repeats 3 --cpu-f64 \
  --output "$OUT/tradeoff_arcs500k_rho3_cpu_f64.csv"

echo "=== [$(date +%H:%M:%S)] regeneration complete ==="
