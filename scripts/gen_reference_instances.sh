#!/usr/bin/env bash
# Generate KKT test instances with the REFERENCE'S OWN generator toolchain
# (netgen/pargen/qfcgen C sources compiled from the read-only mount), so the
# property harness can be validated on data the repo's own cpp/mcfgen never
# touched (closes the mcfgen-validates-mcfgen circularity; the behavior
# being matched is the reference's build.rs:16-41 property-test data flow).
#
# The C sources are compiled OUT OF TREE (in a temp dir) — nothing from the
# mount is copied into the repo; only the generated .dmx/.qfc DATA files are
# vendored, under data/refgen/.
#
# Note: pargen and qfcgen are time-seeded upstream (pargen.c:53,
# qfcgen.c:178), so re-runs produce different instances; the vendored files
# are a fixed snapshot, regeneration just refreshes them.
set -euo pipefail
REF=${REF:-/root/reference}
cd "$(dirname "$0")/.."
OUT=${1:-data/refgen}
mkdir -p "$OUT"

BUILD=$(mktemp -d)
trap 'rm -rf "$BUILD"' EXIT
cp "$REF"/data/netgen/src/{netgen.c,index.c,random.c,netgen.h} "$BUILD"/
cp "$REF"/data/qcnd/{pargen.c,qfcgen.c} "$BUILD"/
(
  cd "$BUILD"
  cc -O -DDIMACS -c netgen.c index.c random.c
  cc -o netgen netgen.o index.o random.o
  cc -O -o pargen pargen.c -lm
  # qfcgen.c is C++ in a .c file (bool, new[]/delete[]) — compile as C++
  g++ -O -x c++ -o qfcgen qfcgen.c -lm
)

# three combos spanning rho x cf x cq x scaling
gen() { # m rho k cf cq s
  local base="netgen-$1-$2-$3-$4-$5-$6"
  (
    cd "$OUT"
    "$BUILD/pargen" "$1" "$2" "$3" "$4" "$5" "$6"
    "$BUILD/netgen" < "$base.par" > "$base.dmx"
    "$BUILD/qfcgen" "$base.dmx"
    rm -f "$base.par"
  )
  echo "generated $OUT/$base.{dmx,qfc}"
}

gen 2000 1 1 a a ns
gen 2000 2 2 b a s
gen 2000 3 3 a b ns
echo "reference-toolchain instances written to $OUT/"
