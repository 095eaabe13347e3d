#!/bin/sh
# Execute BASELINE.md's measurement protocol on the actual C reference
# (serial 1-rank build, see README.md).  Writes logs + h5 outputs under
# cbaseline/results/ and a summary to results/c_baseline.json.
#
# Usage: ./run_baseline.sh [quick]   (quick = fewer steps, for smoke)
set -e

HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
RES=$HERE/results
mkdir -p "$RES"
cd "$RES"

QUICK=${1:-}
STEPS=200
DRIFT_STEPS=10000
if [ "$QUICK" = "quick" ]; then STEPS=20; DRIFT_STEPS=60; fi

[ -x "$HERE/pinc_ref" ] || "$HERE/build.sh"

run() {
    out=$1; shift
    rm -rf "$out"
    # PINC_SKIP_STEP_IO: skip the unconditional per-step grid/particle
    # dumps (see patch_sources.py) — the reference's internal Timer
    # brackets only the compute section, so "Time spent" is unaffected,
    # and history.xy.h5 (energies, the drift protocol's input) still
    # writes every step.
    PINC_SKIP_STEP_IO=1 "$HERE/pinc_ref" "$@" files:output="$out/" \
        msgfiles:parsedump="$out/parsedump.txt" > "$out.log" 2>&1 \
        || { tail -5 "$out.log"; exit 1; }
    grep "Time spent" "$out.log" || true
}

echo "== 1. langmuirCold throughput ($STEPS steps, 32^3, 2 x 64 ppc) =="
run lcold "$REF/langmuirCold.ini" grid:nSubdomains=1,1,1 \
    grid:trueSize=32,32,32 time:nTimeSteps=$STEPS

echo "== 2. mgMode solve timing, 64^3 =="
run mg64 "$REF/langmuirCold.ini" grid:nSubdomains=1,1,1 \
    grid:trueSize=64,64,64 methods:mode=mgMode multigrid:mgLevels=5

echo "== 3. mgMode solve timing, 128^3 =="
run mg128 "$REF/langmuirCold.ini" grid:nSubdomains=1,1,1 \
    grid:trueSize=128,128,128 methods:mode=mgMode multigrid:mgLevels=6

echo "== 4. energy drift, langmuirCold deck, $DRIFT_STEPS steps =="
# the SAME unmodified deck both codes accept — the drift curves overlay
# directly (BASELINE.md protocol step 4)
run drift "$REF/langmuirCold.ini" grid:nSubdomains=1,1,1 \
    grid:trueSize=32,32,32 time:nTimeSteps=$DRIFT_STEPS

python3 "$HERE/collect_results.py" "$RES" "$STEPS" "$DRIFT_STEPS"
