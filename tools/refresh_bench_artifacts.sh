#!/usr/bin/env bash
# Regenerates every BASELINE.json config's bench artifact in one command.
#
#   tools/refresh_bench_artifacts.sh [round-tag]     # default: r03
#
# Writes BENCH_<tag>_{detect,landmarks,enhance,parse,scale,serving}.json at
# the repo root, each a single JSON line from bench.py.  The *builder's*
# detect artifact is named `_detect` on purpose: the round driver writes its
# own `BENCH_<tag>.json` (detect mode) at end of round, and README numbers
# cite the driver's file — a builder run must never squat on that name.
set -u
cd "$(dirname "$0")/.."
TAG="${1:-r03}"

run() {
    local mode="$1" out="$2"
    echo "=== FCPT_BENCH_MODE=$mode -> $out" >&2
    if FCPT_BENCH_MODE="$mode" timeout 5400 python bench.py >"$out.tmp" 2>"$out.log"; then
        tail -n 1 "$out.tmp" > "$out" && rm -f "$out.tmp"
        echo "    $(cat "$out")" >&2
    else
        echo "    FAILED (see $out.log)" >&2
        rm -f "$out.tmp"
    fi
}

run detect    "BENCH_${TAG}_detect.json"
run landmarks "BENCH_${TAG}_landmarks.json"
run enhance   "BENCH_${TAG}_enhance.json"
run parse     "BENCH_${TAG}_parse.json"
run scale     "BENCH_${TAG}_scale.json"
run serving   "BENCH_${TAG}_serving.json"
