#!/usr/bin/env bash
# Differential fuzz loop (the harness graft.Fuzz's scaladoc promises).
#
# Per seed: generate the adversarial corpus (graft.Fuzz — NULL/empty/
# unicode texts, duplicate classes, tied sort keys, dangling FKs, zero
# vectors), run the FULL Verify surface on it, then oracle-compare every
# key with tools/check.py — the same rows/schema/hash gate the driver
# runs, on a corpus the queries were never tuned against. Round 14 ran
# this loop by hand and caught four real cross-engine bugs (zero-norm
# cosine, NULL-text pack fold, NULL band keys, empty-text segmenter
# descent); this script makes that run reproducible.
#
# Usage: tools/fuzz.sh [seed ...]        default seeds: 0 1 2 3 4
# Env:   FUZZ_DIR   scratch root        (default /tmp/graft_fuzz)
#        FUZZ_KEYS  comma-separated key subset forwarded to Verify
#
# Exit 0 iff every seed dumps every key AND every key hash-matches DuckDB.
set -uo pipefail
cd "$(dirname "$0")/.."

seeds=("$@")
if [ ${#seeds[@]} -eq 0 ]; then seeds=(0 1 2 3 4); fi
root="${FUZZ_DIR:-/tmp/graft_fuzz}"
mkdir -p "$root"

# One sbt invocation for ALL seeds (startup + compile amortized); each
# runMain forks its own JVM (run/fork := true in build.sbt).
cmds=()
for s in "${seeds[@]}"; do
  rm -rf "$root/corpus_s$s" "$root/out_s$s"
  cmds+=("runMain graft.Fuzz $root/corpus_s$s $s")
  if [ -n "${FUZZ_KEYS:-}" ]; then
    cmds+=("runMain graft.Verify $root/corpus_s$s $root/out_s$s $FUZZ_KEYS")
  else
    cmds+=("runMain graft.Verify $root/corpus_s$s $root/out_s$s")
  fi
done
sbt -batch "${cmds[@]}" || { echo "[fuzz] sbt run failed"; exit 2; }

fail=0
for s in "${seeds[@]}"; do
  out="$root/out_s$s"
  # Verify exits 0 even when a query dies (driver-budget semantics), so
  # gate on the dump count: every oracle'd key must have a parquet dir
  # (rows-only keys may add EXTRA dirs — only fewer-than-want means a
  # crash). A missing/unreadable oracle_sql.json is itself a failure.
  if ! want=$(python3 -c "import json; print(len(json.load(open('$out/oracle_sql.json'))))"); then
    echo "[fuzz] seed $s: oracle_sql.json missing/unreadable — Verify died at startup"
    fail=1
    continue
  fi
  have=$(find "$out" -mindepth 1 -maxdepth 1 -type d ! -name '.*' | wc -l)
  echo "=== seed $s: $have/$want keys dumped ==="
  if [ "$have" -lt "$want" ]; then
    echo "[fuzz] seed $s: MISSING DUMPS — a query crashed; see Verify stderr above"
    fail=1
  fi
  python3 tools/check.py "$out" "$root/corpus_s$s" || fail=1
done

if [ "$fail" -eq 0 ]; then
  echo "[fuzz] ALL SEEDS GREEN: ${seeds[*]}"
else
  echo "[fuzz] FAILURES — see per-seed output above"
fi
exit "$fail"
