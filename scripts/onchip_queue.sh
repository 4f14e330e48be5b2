#!/usr/bin/env bash
# The queued on-chip validation for when the axon tunnel returns (the
# 2026-08-17 outage blocked the round-4 capability layer's hardware leg).
# ONE serialized TPU client per step — never run two TPU processes
# concurrently (the tunnel deadlocks both; CLAUDE.md environment rules).
#
# Usage: bash scripts/onchip_queue.sh [results-dir]
# Exits nonzero on the first failing step.
set -u -o pipefail  # pipefail: `python | tee` must fail when python does
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/onchip_queue}"
mkdir -p "$OUT"

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

echo "== 0. tunnel probe"
if ! probe; then
  echo "tunnel DOWN (probe hung) — nothing to do"; exit 3
fi

echo "== 1. capability smoke (9 legs, f32 on-chip)"
timeout 1800 python scripts/probe/capability_smoke.py \
  | tee "$OUT/capability_smoke.txt" || exit 1
grep -q "9/9" "$OUT/capability_smoke.txt" || exit 1

echo "== 2. headline bench sanity (expects vs_baseline >> 1)"
timeout 2400 python bench.py | tee "$OUT/bench.json" || exit 1

echo "== 3. fused-vs-XLA SLQ A/B at 500k arcs (same-session timing)"
timeout 2400 python scripts/probe/ab_slq.py | tee "$OUT/ab_slq.txt" || exit 1

echo "ALL ON-CHIP QUEUE STEPS PASSED -> $OUT"
