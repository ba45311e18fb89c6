#!/usr/bin/env bash
# One-command CI lane (r15 verdict item 6): everything the repo can
# gate on a machine that has python-duckdb — compile, the ScalaTest
# suites, the ScaleSmoke scale pins, and BOTH halves of the
# differential fuzz loop (single-batch + split-replay lanes) on seeds
# 0 and 1. FuzzSpec covers only the crash-freedom half in sbt-only CI
# (DuckDB is not on the sbt classpath); this script is the lane where
# cross-engine SEMANTIC regressions on fuzz domains fail a gate
# instead of waiting for someone to run tools/fuzz.sh by hand.
#
# Usage: tools/ci.sh [extra fuzz seeds ...]   (default seeds: 0 1)
set -euo pipefail
cd "$(dirname "$0")/.."

python3 - <<'PY' || { echo "[ci] python-duckdb missing - oracle gate cannot run"; exit 3; }
import duckdb
PY

echo "[ci] 1/4 compile + unit suites"
sbt -batch compile test

echo "[ci] 2/4 scale smoke (CC / anti-join / range-join / beam / c93+c60 / c48 pins)"
sbt -batch "runMain graft.ScaleSmoke"

echo "[ci] 3/4 differential fuzz, single-batch + split-width sweep"
# No-arg default is TWO seeds, not the single word "0 1" (the quoted
# ${@:-0 1} expansion collapses to one arg — r16 advice).
if [ $# -eq 0 ]; then set -- 0 1; fi
# First listed seed also runs the k∈{2,8} split widths (D block only);
# every seed runs the default k=4 lane inside this same invocation.
# FUZZ_SPLIT_ONLY reuses the corpus the full run just generated and
# skips the already-gated single-batch lane (r17 advice).
first="$1"
tools/fuzz.sh "$@"
FUZZ_SPLIT_ONLY=1 FUZZ_SPLIT=2,8 tools/fuzz.sh "$first"

echo "[ci] 4/4 done — all gates green"
