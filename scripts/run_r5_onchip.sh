#!/usr/bin/env bash
# Round-5 on-chip queue: the four chip-gated deliverables that remained
# after the published-artifact regeneration (VERDICT r4 items 2, 5, 6 and
# the bench streaming-leg sanity). ONE serialized TPU client per step —
# never run two TPU processes concurrently (tunnel deadlock; CLAUDE.md).
#
# Usage: bash scripts/run_r5_onchip.sh [out-dir] [wait-hours]
# Waits for the tunnel (probe every 3 min, default up to 8 h), then runs
# the queue; exits 3 if the tunnel never returns, nonzero on first failure.
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r5_onchip}"
WAIT_H="${2:-8}"
mkdir -p "$OUT"

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

echo "== 0. waiting for tunnel (up to ${WAIT_H}h)"
deadline=$(( $(date +%s) + WAIT_H * 3600 ))
until probe; do
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "tunnel DOWN for ${WAIT_H}h — giving up"; exit 3
  fi
  echo "  tunnel down $(date -u +%H:%M:%S), retry in 180s"
  sleep 180
done
echo "tunnel UP $(date -u +%H:%M:%S)"

echo "== 1. capability smoke -> results/capability_onchip.json"
timeout 1800 python scripts/probe/capability_smoke.py \
  --output results/capability_onchip.json \
  | tee "$OUT/capability_smoke.txt" || exit 1
grep -q "9/9" "$OUT/capability_smoke.txt" || exit 1

echo "== 2. headline drift A/B (int16 vs int32 endpoint planes, one session)"
timeout 1800 python scripts/probe/ab_drift.py \
  | tee "$OUT/ab_drift.txt" || exit 1

echo "== 3. plane-merge DMA probe, 5M arcs (floor + full)"
timeout 2400 python scripts/probe/stream_planes.py 5000000 both \
  | tee "$OUT/stream_planes_5m.txt" || exit 1

echo "== 4. plane-merge DMA probe, 500k arcs"
timeout 1800 python scripts/probe/stream_planes.py 500000 both \
  | tee "$OUT/stream_planes_500k.txt" || exit 1

echo "== 5. bench sanity (headline + df + streaming legs)"
timeout 2400 python bench.py | tee "$OUT/bench.json" || exit 1

echo "ALL R5 ON-CHIP STEPS PASSED -> $OUT"
