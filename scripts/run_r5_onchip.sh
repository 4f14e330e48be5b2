#!/usr/bin/env bash
# Round-5 on-chip queue: the four chip-gated deliverables that remained
# after the published-artifact regeneration (VERDICT r4 items 2, 5, 6 and
# the bench streaming-leg sanity). ONE serialized TPU client per step —
# never run two TPU processes concurrently (tunnel deadlock; CLAUDE.md).
# Steps are independent: a failing step is recorded and the queue moves on
# (chip time is scarce; one flaky probe must not starve the rest).
#
# Usage: bash scripts/run_r5_onchip.sh [out-dir] [wait-hours]
# Waits for the tunnel (probe every 3 min, default up to 8 h); exits 3 if
# the tunnel never returns, 1 if any step failed, 0 if all passed.
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r5_onchip}"
WAIT_H="${2:-8}"
mkdir -p "$OUT"
FAILED=0

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

step() {  # step <name> <timeout-s> <log> <cmd...>
  local name="$1" tmo="$2" log="$3"; shift 3
  echo "== $name ($(date -u +%H:%M:%S))"
  if timeout "$tmo" "$@" 2>&1 | tee "$OUT/$log"; then
    echo "-- $name OK"
  else
    echo "-- $name FAILED (see $OUT/$log)"; FAILED=1
  fi
}

step "1. capability smoke -> results/capability_onchip.json" 1800 \
  capability_smoke.txt \
  python scripts/probe/capability_smoke.py \
  --output results/capability_onchip.json
grep -q "9/9" "$OUT/capability_smoke.txt" || FAILED=1

step "2. headline drift A/B (int16 vs int32 endpoint planes)" 1800 \
  ab_drift.txt python scripts/probe/ab_drift.py

step "3. plane-merge DMA probe, 5M arcs" 2400 \
  stream_planes_5m.txt python scripts/probe/stream_planes.py 5000000 both

step "4. plane-merge DMA probe, 500k arcs" 1800 \
  stream_planes_500k.txt python scripts/probe/stream_planes.py 500000 both

step "5. bench sanity (headline + df + streaming legs)" 2400 \
  bench.json python bench.py

if [ "$FAILED" -ne 0 ]; then
  echo "R5 ON-CHIP QUEUE: at least one step FAILED -> $OUT"; exit 1
fi
echo "ALL R5 ON-CHIP STEPS PASSED -> $OUT"
